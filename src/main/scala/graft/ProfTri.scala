package graft

import org.apache.spark.sql.functions._

/** Profiling main for the triangle-orientation lever (mirrors ProfDedup's
  * session): builds a deterministic SKEW-degree graph — the regime the
  * kNN-capped corpus graph can't exhibit — and measures the path-wedge
  * join under id-order vs degree-order orientation at two sizes.
  *
  * Graph: ring i→i+1, chord i→i+2 (every node closes N triangles), plus
  * one mid-id hub adjacent to every 10th node — the id-order worst case
  * (≈half the hub's edges point in, half out, so (d/2)² wedges center on
  * it) that degree-ordering eliminates (hub ranks last → in-only).
  *
  * `runMain graft.ProfTri [n] [n2]` (default 100000 1000000).
  */
object ProfTri {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(100000L, 1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    sizes.foreach { n =>
      val hub = n / 2
      val ring = spark.range(n).select(col("id").as("u"),
        ((col("id") + 1) % n).as("v"))
      val chord = spark.range(n).select(col("id").as("u"),
        ((col("id") + 2) % n).as("v"))
      val spoke = spark.range(n).filter(col("id") % 10 === 0 &&
          col("id") =!= hub)
        .select(col("id").as("u"), lit(hub).as("v"))
      val canon = ring.unionByName(chord).unionByName(spoke)
        .select(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b"))
        .distinct().cache()
      canon.count()
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"TPROF n=$n%-8d $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$r")
      }
      val idOr = canon.select(col("a").as("src"), col("b").as("dst"))
      val degOr = graft.ops.SimilarityOps.degreeOriented(canon)
      t("id wedges")(graft.ops.SimilarityOps.pathWedges(idOr).count())
      t("deg wedges")(graft.ops.SimilarityOps.pathWedges(degOr).count())
      t("id triangles")(graft.ops.SimilarityOps.trianglesOriented(idOr)
        .collect().head.getLong(0))
      t("deg triangles")(graft.ops.SimilarityOps.trianglesOriented(degOr)
        .collect().head.getLong(0))
      canon.unpersist()
      ()
    }
    spark.stop()
  }
}
