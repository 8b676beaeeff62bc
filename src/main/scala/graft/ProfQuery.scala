package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Single-query profile with executor-task attribution:
  * `runMain graft.ProfQuery <sfDir> <query> [query...]` runs each named
  * query twice (cold = first-touch index/cache builds, warm = steady
  * state) and prints wall seconds, summed executor task seconds, and
  * shuffle MB per run — the same signals Bench records, without paying
  * for the other 150+ queries.
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfQuery <sfDir> <query> [query...]")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new AtomicLong
    val shB = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          shB.addAndGet(m.shuffleReadMetrics.totalBytesRead
            + m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      Seq("cold", "warm").foreach { label =>
        val (t0, s0) = (taskMs.get, shB.get)
        val w0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - w0) / 1e9
        println(f"PROFQ $name%-26s $label%-5s wall=$wall%7.3fs " +
          f"task=${(taskMs.get - t0) / 1e3}%8.3fs " +
          f"shuffle=${(shB.get - s0) / 1e6}%8.1fMB")
      }
    }
    spark.stop()
  }
}
