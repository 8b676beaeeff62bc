package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QA phase — QA.sql's four reconciliation families (SURVEY.md §5) as one
  * report DataFrame with schema (check_name, lhs, rhs, diff):
  *  1. row-count parity stage vs DWH ×7 (QA.sql:13-59)
  *  2. fact COUNT(*) vs SUM(agg.total_events) (QA.sql:67-71)
  *  3. orphan counts ×5 on the DWH fact (QA.sql:79-116), expected 0
  *  4. duplicate-PK counts ×5 on DWH dims (QA.sql:124-176), expected 0
  *
  * Every check is a 1-row aggregate; the report is their UNION ALL (U1,
  * J11 scalar-subquery shape). Shared layers are cached so the ~20 scalar
  * branches don't recompute the pipeline.
  */
object Qa {

  private def check(name: String, lhs: DataFrame, rhs: DataFrame): DataFrame =
    lhs.crossJoin(rhs).select(
      lit(name).as("check_name"), col("lhs"), col("rhs"),
      (col("lhs") - col("rhs")).as("diff"))

  private def cnt(df: DataFrame, as: String): DataFrame =
    df.agg(count(lit(1)).as(as))

  private def zero(as: String, s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(0L).toDF(as)
  }

  def report(s: SparkSession, dir: String): DataFrame = {
    val stage = Stage.build(s, dir)
      .map { case (k, v) => k -> v.cache() }
    val fact = Dwh.factDwh(stage).cache()
    val dwh: Map[String, DataFrame] =
      Map("fact" -> fact,
        "agg_disorders_per_admission" -> Dwh.aggPerAdmission(fact)) ++
        (stage - "fact").map { case (k, v) => k -> v.distinct() }

    // family 1: row-count parity
    val parityTables = Seq("dim_patients", "dim_admissions", "dim_provider",
      "dim_concepts", "dim_junk", "dim_date", "fact")
    val parity = parityTables.map { t =>
      check(s"parity_$t", cnt(stage(t), "lhs"), cnt(dwh(t), "rhs"))
    }

    // family 2: fact vs aggregate consistency
    val factVsAgg = check("fact_vs_agg",
      cnt(fact, "lhs"),
      dwh("agg_disorders_per_admission")
        .agg(sum(col("total_events")).as("rhs")))

    // family 3: orphan counts (anti-join J7/J9 shape), expected 0
    val orphanChecks = Seq(
      ("orphans_patients", "patient_id", "dim_patients", "patient_id"),
      ("orphans_admissions", "admission_id", "dim_admissions", "admission_id"),
      ("orphans_concepts", "concept_code", "dim_concepts", "code"),
      ("orphans_dates", "event_datetime", "dim_date", "date_id"),
      ("orphans_junk", "junk_id", "dim_junk", "junk_id"))
    val orphans = orphanChecks.map { case (name, key, dim, dimKey) =>
      val lhs = cnt(fact.filter(col(key).isNotNull)
        .join(dwh(dim).select(col(dimKey).as(key)), Seq(key), "left_anti"),
        "lhs")
      check(name, lhs, zero("rhs", s))
    }

    // family 4: duplicate-PK counts (A5 shape), expected 0
    val dupChecks = Seq(
      ("dups_patients", "dim_patients", "patient_id"),
      ("dups_admissions", "dim_admissions", "admission_id"),
      ("dups_provider", "dim_provider", "provider_id"),
      ("dups_concepts", "dim_concepts", "code"),
      ("dups_date", "dim_date", "date_id"))
    val dups = dupChecks.map { case (name, dim, key) =>
      val lhs = dwh(dim).groupBy(col(key)).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).agg(count(lit(1)).as("lhs"))
      check(name, lhs, zero("rhs", s))
    }

    (parity ++ Seq(factVsAgg) ++ orphans ++ dups).reduce(_ unionByName _)
  }
}
