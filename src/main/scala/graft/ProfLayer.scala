package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Profiling main for the stage→DWH layer build (the bench's
  * `layer_build` critical path): times each phase of the chain —
  * stage plan construction, the stage boundary write, the DWH build,
  * its boundary write — with executor task-second attribution, so a
  * layer_build regression can be blamed on a phase instead of a lump.
  * `runMain graft.ProfLayer <sfDir>`.
  */
object ProfLayer {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskMs.addAndGet(m.executorRunTime)
      }
    })
    def timed[T](what: String)(body: => T): T = {
      val (t0, k0) = (System.nanoTime(), taskMs.get)
      val r = body
      println(f"[proflayer] $what%-28s wall=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
        f"task=${(taskMs.get - k0) / 1e3}%7.2fs")
      r
    }
    // Phase by phase, mirroring Dwh.materialized's dependency chain.
    val stage = timed("stage build+write")(
      graft.etl.Stage.materialized(spark, dir))
    timed("dwh fact (cached)")(graft.etl.Dwh.factDwh(stage).count())
    timed("dwh build+write")(graft.etl.Dwh.materialized(spark, dir))
    timed("qa report")(graft.etl.Qa.report(spark, dir))
    spark.stop()
  }
}
