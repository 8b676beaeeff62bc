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
  * Scale design: the naive shape — 18 scalar-subquery branches crossed
  * and unioned into one plan (QA.sql's literal structure) — optimizes
  * and schedules ~40 tiny stages per run (measured ~10 s at sf0.1 even
  * with hot caches). Instead each table is scanned ONCE:
  *  - per dim, a single two-level aggregation yields (stage rows,
  *    distinct rows, duplicate keys) — families 1 and 4 in one job;
  *  - the fact gets one pass with 5 broadcast flag-joins (dim keys are
  *    deduped, so no row multiplication) yielding its count and all 5
  *    orphan counts — families 1 and 3 in one job, no fact shuffle;
  *  - family 2 reuses the cached fact for one hash-agg job.
  * The 18 scalars then form a local 18-row DataFrame. At 100 TB the
  * cost is 8 passes over cached/columnar data instead of ~20.
  */
object Qa {

  private val prof = sys.env.contains("GRAFT_QA_PROF")
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    if (prof) println(f"QAPROF $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    r
  }

  /** The report is EAGER (fused scalars collected and assembled locally),
    * so memoize per (session, dir): a caller that merely registers the
    * qa_report view must not re-run the 18 reconciliation jobs.
    */
  def report(s: SparkSession, dir: String): DataFrame =
    graft.ops.Memo.of(s, dir, "qaReport")(buildReport(s, dir))

  private def buildReport(s: SparkSession, dir: String): DataFrame = {
    // File-backed stage layer: every QA family reads the materialized
    // parquet (the reference's QA.sql reads the MariaDB tables), so this
    // also end-to-end-verifies the write→read roundtrip.
    val stage = Stage.materialized(s, dir)
    // DWH fact from the materialized DWH layer: file scans, shared with
    // every other DWH consumer instead of a per-report dedup+guard run.
    val fact = Dwh.materialized(s, dir)("fact")

    // Per-dim fused scalars: stage row count (family 1 lhs), distinct row
    // count (family 1 rhs — DWH dims are dedup copies), duplicate-PK-key
    // count over the deduped dim (family 4).
    def dimStats(dim: DataFrame, key: String): (Long, Long, Long) = {
      val byRow = dim.groupBy(dim.columns.map(col): _*)
        .agg(count(lit(1)).as("_rows"))
      val byKey = byRow.groupBy(col(key))
        .agg(sum("_rows").as("_rows"), count(lit(1)).as("_distinct"))
      val r = byKey.agg(
        sum("_rows"), sum("_distinct"),
        sum(when(col("_distinct") > 1, 1L).otherwise(0L))).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    val dimSpecs = Seq(
      ("dim_patients", "patient_id"),
      ("dim_admissions", "admission_id"),
      ("dim_provider", "provider_id"),
      ("dim_concepts", "code"),
      ("dim_junk", "junk_id"),
      ("dim_date", "date_id"))
    // Warm the two shared caches sequentially (every scalar below reads
    // them; concurrent first-materialization would duplicate the work),
    // then run the per-table scalar jobs concurrently — Spark's scheduler
    // interleaves small jobs, so wall time ≈ the slowest scalar, not the sum.
    val factStageCnt = timed("stageFactCount")(stage("fact").count())
    val factDwhCnt = timed("dwhFactCount")(fact.count())

    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration

    val statsF = dimSpecs.map { case (t, key) =>
      Future(t -> timed(s"dimStats($t)")(dimStats(stage(t), key)))
    }

    // Fact fused pass: COUNT(*) + the 5 orphan counts (J7 anti-join
    // semantics: FK not null and no dim match) via broadcast flag-joins.
    val orphanSpecs = Seq(
      ("orphans_patients", "patient_id", "dim_patients", "patient_id"),
      ("orphans_admissions", "admission_id", "dim_admissions", "admission_id"),
      ("orphans_concepts", "concept_code", "dim_concepts", "code"),
      ("orphans_dates", "event_datetime", "dim_date", "date_id"),
      ("orphans_junk", "junk_id", "dim_junk", "junk_id"))
    // dim_date/dim_junk are distinct-built (and QA's own dup checks assert
    // key uniqueness), so their key sides skip the extra dedup shuffle.
    val preDeduped = Set("dim_date", "dim_junk")
    val flagged = orphanSpecs.zipWithIndex.foldLeft(fact) {
      case (f, ((_, key, dim, dimKey), i)) =>
        // No broadcast hint — AQE decides (see Dwh.factDwh's guard note).
        val keys = stage(dim).select(col(dimKey).as(key))
        f.join(
          (if (preDeduped(dim)) keys else keys.distinct())
            .withColumn(s"_f$i", lit(true)),
          Seq(key), "left")
    }
    val factRow = flagged.agg(
      count(lit(1)),
      orphanSpecs.zipWithIndex.map { case ((_, key, _, _), i) =>
        sum(when(col(key).isNotNull && col(s"_f$i").isNull, 1L).otherwise(0L))
      }: _*)
    val factRowF = Future(timed("factFused")(factRow.head))
    val aggSumF = Future(timed("aggSum")(Dwh.aggPerAdmission(fact)
      .agg(sum(col("total_events"))).head.getLong(0)))

    val (stats, factRow2, aggSum) =
      try {
        (Await.result(Future.sequence(statsF), Duration.Inf).toMap,
          Await.result(factRowF, Duration.Inf),
          Await.result(aggSumF, Duration.Inf))
      } finally pool.shutdown()
    require(factRow2.getLong(0) == factDwhCnt,
      s"fused fact count ${factRow2.getLong(0)} != cached count $factDwhCnt")
    val orphanCnts = orphanSpecs.indices.map(i => factRow2.getLong(i + 1))

    // Assemble the 18-row report (U1 union order preserved from QA.sql).
    val rows =
      dimSpecs.map { case (t, _) =>
        (s"parity_$t", stats(t)._1, stats(t)._2)
      } ++
      Seq(("parity_fact", factStageCnt, factDwhCnt),
          ("fact_vs_agg", factDwhCnt, aggSum)) ++
      orphanSpecs.zipWithIndex.map { case ((name, _, _, _), i) =>
        (name, orphanCnts(i), 0L)
      } ++
      Seq("dups_patients" -> "dim_patients", "dups_admissions" -> "dim_admissions",
          "dups_provider" -> "dim_provider", "dups_concepts" -> "dim_concepts",
          "dups_date" -> "dim_date").map { case (name, t) =>
        (name, stats(t)._3, 0L)
      }

    import s.implicits._
    rows.toDF("check_name", "lhs", "rhs")
      .withColumn("diff", col("lhs") - col("rhs"))
  }
}
