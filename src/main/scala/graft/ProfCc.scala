package graft

import org.apache.spark.sql.functions._

/** Micro-benchmark for the two connected-components paths (star
  * contraction vs min-label propagation) on a synthetic graph shaped
  * like the er_resolve pair graph: many tiny components plus one long
  * chain (the diameter stressor). `runMain graft.ProfCc [edges] [chain]`.
  */
object ProfCc {
  def main(args: Array[String]): Unit = {
    val nRandom = args.headOption.map(_.toLong).getOrElse(70000L)
    val chainLen = args.lift(1).map(_.toLong).getOrElse(10000L)
    // arg 3: star | prop | both — the 300M-edge fixpoint ladder only
    // needs the contraction path
    val mode = args.lift(2).getOrElse("both")
    // arg 4: rep count — the top ladder rung is ~90 min at the 8-thread
    // control, so a warm repeat would double a measurement whose cold
    // codegen share is already negligible at that scale
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partitions ∝ edges (same methodology as ProfQuery): per-task edge
    // volume held constant across the ladder
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    val nodeSpace = nRandom * 3
    // deterministic pseudo-random sparse graph: mostly tiny components
    val rand = spark.range(nRandom).select(
      pmod(xxhash64(col("id")), lit(nodeSpace)).as("doc_a"),
      pmod(xxhash64(col("id") + 987654321L), lit(nodeSpace)).as("doc_b"))
    // one long chain appended above the random id space: worst-case
    // diameter for propagation, worst-case phase count for contraction
    val chain = spark.range(chainLen)
      .select((col("id") + nodeSpace).as("doc_a"),
        (col("id") + nodeSpace + 1).as("doc_b"))
    val edges = rand.unionByName(chain).localCheckpoint()
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            taskMs.addAndGet(te.taskMetrics.executorRunTime)
      })
    def t(name: String)(f: => Long): Unit = {
      val (t0, m0) = (System.nanoTime(), taskMs.get)
      val n = f
      println(f"CCPROF $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs  " +
        f"task=${(taskMs.get - m0) / 1e3}%8.2fs  labels=$n")
    }
    // rep 1 = cold (first-touch builds), reps 2+ = warm; honor ANY count
    (1 to reps).map(i => if (i == 1) "cold" else s"warm$i").foreach { rep =>
      if (mode != "prop")
        t(s"star $rep")(graft.ops.DedupOps.connectedComponents(edges).count())
      if (mode != "star")
        t(s"propagate $rep")(
          graft.ops.DedupOps.connectedComponents(edges, useStar = false).count())
    }
    spark.stop()
  }
}
