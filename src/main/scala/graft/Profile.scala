package graft

import graft.etl.{Dwh, Stage}
import org.apache.spark.sql.SparkSession

/** Stage-by-stage wall-clock profile of the ETL pipeline —
  * `runMain graft.Profile [sfDir]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    if (sys.env.contains("GRAFT_WARM"))
      try etl.Qa.report(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    t("factLab")(Stage.factLab(spark, sfDir).count())
    t("factLab(2nd)")(Stage.factLab(spark, sfDir).count())
    t("factDx")(Stage.factDx(spark, sfDir).count())
    t("factOmr")(Stage.factOmr(spark, sfDir).count())
    t("factRaw+key")(Stage.factRaw(spark, sfDir).count())
    t("factEnriched(cold)")(Stage.factEnriched(spark, sfDir).count())
    t("factEnriched(cached)")(Stage.factEnriched(spark, sfDir).count())
    t("materialize+read")(Stage.materialized(spark, sfDir)("fact").count())
    t("dwh fact")(Dwh.materialized(spark, sfDir)("fact").count())
    t("dwh fact(2nd)")(Dwh.materialized(spark, sfDir)("fact").count())
    t("dwh agg")(
      Dwh.materialized(spark, sfDir)("agg_disorders_per_admission").count())
    t("qa report")(etl.Qa.report(spark, sfDir).count())
    t("qa report(2nd)")(etl.Qa.report(spark, sfDir).count())
    spark.stop()
  }
}
