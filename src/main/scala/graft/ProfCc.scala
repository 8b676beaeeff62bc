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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"CCPROF $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs  labels=$n")
    }
    Seq("cold", "warm").foreach { rep =>
      t(s"star $rep")(graft.ops.DedupOps.connectedComponents(edges).count())
      t(s"propagate $rep")(
        graft.ops.DedupOps.connectedComponents(edges, useStar = false).count())
    }
    spark.stop()
  }
}
