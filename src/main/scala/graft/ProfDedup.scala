package graft

import graft.functions.TextFns._
import org.apache.spark.sql.functions._

/** Profiling main for the dedup stages (mirrors Bench's local[4]
  * session; see Profile for the ETL pipeline equivalent).
  */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"DPROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    t("docs scan")(docs.count())
    t("tokens explode")(docs.select(explode(tokens(col("text")))).count())
    t("minhash lsh")(graft.ops.DedupOps.minhashLsh(spark, sfDir).count())
    t("minhash lsh(2)")(graft.ops.DedupOps.minhashLsh(spark, sfDir).count())
    t("ngram jaccard")(graft.ops.DedupOps.ngramJaccard(spark, sfDir).count())
    t("survivors")(graft.ops.DedupOps.nearDupSurvivors(spark, sfDir).count())
    // fixed-batch incremental-dedup stress (ARCHITECTURE scale table):
    // cap the simulated arrival to the base-corpus slice while the
    // probed index scales — set SPARK_GRAFT_INCR_MAX_SRC to the base
    // doc count when profiling a gen_scale corpus. Profiling-main only:
    // the registered query never reads this, so correctness runs can't
    // be skewed by leftover shell state.
    sys.env.get("SPARK_GRAFT_INCR_MAX_SRC").foreach { b =>
      t("incremental fixed-batch")(
        graft.ops.DedupOps.incrementalDedupAt(spark, sfDir, b.toLong)
          .count())
      t("incremental fixed-batch(2)")(
        graft.ops.DedupOps.incrementalDedupAt(spark, sfDir, b.toLong)
          .count())
    }
    spark.stop()
  }
}
