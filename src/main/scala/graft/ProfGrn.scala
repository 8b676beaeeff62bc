package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Profiling main for the global-numbering lever (mirrors ProfTri's
  * session): builds a provider-shaped stream — unique key in scrambled
  * order plus payload columns — and measures `ROW_NUMBER() OVER
  * (ORDER BY key)` as a bare unpartitioned window (every row through ONE
  * task's sort, the pre-r13 `Stage.dimProvider` shape) against
  * [[graft.ops.SurrogateKeys.withGlobalRowNumber]] (range-repartitioned
  * sort + zipWithIndex offsets). A checksum over key·number pins that
  * both paths assign the identical numbering.
  *
  * Sizes are powers of two so the Knuth multiplicative scramble
  * (odd multiplier mod 2^k) stays bijective — the key is unique by
  * construction, the precondition for numbering equivalence.
  *
  * `runMain graft.ProfGrn [log2n] [log2n...]` (default 20 23 — 1M / 8M).
  */
object ProfGrn {
  def main(args: Array[String]): Unit = {
    val log2s = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(20, 23)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    log2s.foreach { k =>
      val n = 1L << k
      val src = spark.range(n).select(
        ((col("id") * 2654435761L) % n + n) % n as "provider_id",
        col("id") % 100000L as "patient_id",
        (col("id") * 7L) % 86400L as "intime_s",
        (col("id") * 7L) % 86400L + 172800L as "outtime_s")
      // the thunk CONSTRUCTS the numbered frame inside the timed region:
      // withGlobalRowNumber materializes its localCheckpoint eagerly at
      // construction, so timing only the downstream agg would exclude
      // the sort+checkpoint — the very cost being compared
      def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Long = {
        val t0 = System.nanoTime()
        // per-row product ≤ n² (fits long); mod before summing keeps the
        // SUM inside long under ANSI overflow checking
        val chk = mk.agg(sum((col("provider_key") * col("provider_id"))
          % 1000000007L).cast("long")).collect().head.getLong(0)
        println(f"GPROF n=$n%-9d $name%-12s " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2fs  checksum=$chk")
        chk
      }
      val c1 = t("window")(src.withColumn("provider_key",
        row_number().over(Window.orderBy(col("provider_id").asc))))
      val c2 = t("grn")(graft.ops.SurrogateKeys.withGlobalRowNumber(
        src, "provider_key", Seq(col("provider_id").asc)))
      require(c1 == c2, s"numbering diverged at n=$n: $c1 vs $c2")
    }
    spark.stop()
  }
}
