package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Profiling main for the IVF cell-count lever (mirrors ProfDedup's
  * shape): builds the coarse quantizer + probe table and runs the
  * bucketed near-dup scan at an explicit seed-bit setting, printing
  * wall, summed executor task seconds, and candidate-pair volume.
  *
  * The scale question this answers (ARCHITECTURE "measured scale
  * exponents" table): the index BUILD is one broadcast-literal codegen
  * map per Lloyd round — task-sec ∝ N·k — while the near-dup SCAN is
  * bucketed all-pairs — task-sec ∝ N²/k — so a deployment that scales
  * the corpus 10× must move k with √N ([[graft.ops.SimilarityOps
  * .seedBitsFor]]) or the scan quadratic eats the win. Run with
  * `SPARK_GRAFT_IVF_BITS` pinned (the oracle default 3, or any dial
  * setting) or unset to take the √N heuristic's pick for the corpus.
  */
object ProfIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { taskMs.addAndGet(m.executorRunTime); () }
      }
    })
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val n = Tables.load(spark, sfDir, "embeddings").count()
    val bits = sys.env.get("SPARK_GRAFT_IVF_BITS").map(_.toInt)
      .getOrElse(graft.ops.SimilarityOps.seedBitsFor(n))
    println(s"IPROF corpus=$n bits=$bits cells=${1 << bits}")
    def t(name: String)(f: => Long): Unit = {
      Thread.sleep(300); taskMs.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"IPROF $name%-24s wall=$wall%7.2fs task=${taskMs.get / 1e3}%8.2fs rows=$rows")
    }
    t(s"build cells k=${1 << bits}")(
      graft.ops.SimilarityOps.ivfCells(spark, sfDir, bits).count())
    t(s"build cells warm")(
      graft.ops.SimilarityOps.ivfCells(spark, sfDir, bits).count())
    t(s"neardup scan k=${1 << bits}")(
      graft.ops.SimilarityOps.ivfNearDup(spark, sfDir, bits).count())
    spark.stop()
  }
}
