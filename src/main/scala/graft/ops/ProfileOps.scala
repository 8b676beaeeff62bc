package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling operators — the `ANALYZE`-shaped pass a warehouse runs
  * at ingest to drive everything downstream (join-strategy choice, filter
  * cut points, partition sizing, dirty-data triage). The reference's QA
  * script approximates this with hand-written per-table checks
  * (QA.sql:13-176); these two ops generalize it.
  *
  * Scale shape: `s_profile_columns` is ONE aggregation pass over the
  * table — every per-column statistic (null count, distinct count,
  * min/max) rides the same scan, map-side-combined before the single
  * shuffle (the multiple COUNT(DISTINCT)s plan as one Expand, the
  * standard Spark shape — the expand factor is per-ROW cost, never a
  * second scan of the source). `s_histogram` is a two-column scan +
  * one hash-agg on a derived bucket key. Neither sorts anything.
  */
object ProfileOps extends OpGroup {

  // ---------------------------------------------------------------------
  // Column profile of `orders`: per column — null count, exact distinct
  // count, numeric min/max (as DOUBLE) and lexicographic min/max for
  // strings/timestamps (as VARCHAR; ISO timestamp order == time order).
  // Numeric and string ranges live in separate typed columns:
  // cross-engine numeric→string FORMATTING (Java "1.0E7" vs DuckDB
  // "10000000.0") never enters the comparison, only values in each
  // engine's native type do.
  //
  // Shape: LONG FORM, not the textbook "6 aggregates over one row". The
  // obvious `agg(countDistinct(a), min(a), …, countDistinct(f))` plans
  // as a 7-way Expand whose distinct stage keys on EVERY profiled column
  // at once, and the string-typed min/max buffers disqualify
  // HashAggregate — measured 7.3 s of SortAggregate over the expanded
  // million wide rows at sf0.1. Exploding to (column, value) pairs first
  // keeps every stage a narrow HASH aggregate: level 1 groups by
  // distinct value (map-side combined, distributed over values — no
  // hot key at any scale), and null/distinct/min/max all fall out of a
  // 6-group rollup over those distinct values. Measured 0.6 s — and at
  // 100 TB the level-1 combine means the shuffle carries distinct
  // values per mapper, never raw rows.
  // ---------------------------------------------------------------------
  private val profiled: Seq[(String, Boolean)] = Seq( // (column, isNumeric)
    ("o_orderkey", true), ("o_custkey", true), ("o_orderstatus", false),
    ("o_totalprice", true), ("o_orderdate", false),
    ("o_orderpriority", false))

  def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val entries: Seq[Column] = profiled.map { case (c, isNum) =>
      struct(lit(c).as("cname"),
        (if (isNum) col(c).cast("double") else lit(null).cast("double"))
          .as("num"),
        (if (isNum) lit(null).cast("string") else col(c).cast("string"))
          .as("str"))
    }
    val long = Tables.load(s, dir, "orders")
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.*"))
    val perValue = long.groupBy(col("cname"), col("num"), col("str"))
      .agg(count(lit(1)).as("cnt"))
    val nullVal = col("num").isNull && col("str").isNull
    perValue.groupBy(col("cname"))
      .agg(sum(when(nullVal, col("cnt")).otherwise(0L)).as("null_count"),
        count(when(!nullVal, lit(1))).as("distinct_count"),
        min(col("num")).as("min_num"), max(col("num")).as("max_num"),
        min(col("str")).as("min_str"), max(col("str")).as("max_str"))
      .withColumnRenamed("cname", "column_name")
  }

  private val profileColumnsSql = profiled.map { case (c, isNum) =>
    val (minNum, maxNum) =
      if (isNum) (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)")
      else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
    val (minStr, maxStr) =
      if (isNum) ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      else (s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
    s"""SELECT '$c' AS column_name,
       |  COUNT(*) - COUNT($c) AS null_count,
       |  COUNT(DISTINCT $c) AS distinct_count,
       |  $minNum AS min_num, $maxNum AS max_num,
       |  $minStr AS min_str, $maxStr AS max_str
       |FROM orders""".stripMargin
  }.mkString("\nUNION ALL\n")

  // ---------------------------------------------------------------------
  // Equi-width histogram of o_totalprice: fixed [0, 600k) domain in 20
  // buckets of 30k. The bounds are LITERALS (fed from the profile pass
  // above in a real deployment) so the histogram stays a single pass —
  // a data-dependent min/max would force a second scan. Same floor
  // arithmetic on both engines; empty buckets are absent (sparse form).
  // ---------------------------------------------------------------------
  private val bucketWidth = 30000

  def histogram(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select((floor(col("o_totalprice") / bucketWidth)).cast("int")
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        (col("bucket") * bucketWidth).cast("double").as("lo"),
        ((col("bucket") + 1) * bucketWidth).cast("double").as("hi"),
        col("cnt"))

  private val histogramSql =
    s"""SELECT bucket,
       |  CAST(bucket * $bucketWidth AS DOUBLE) AS lo,
       |  CAST((bucket + 1) * $bucketWidth AS DOUBLE) AS hi,
       |  COUNT(*) AS cnt
       |FROM (SELECT CAST(floor(o_totalprice / $bucketWidth) AS INT) AS bucket
       |      FROM orders) t
       |GROUP BY bucket""".stripMargin

  // ---------------------------------------------------------------------
  // Count-min frequency estimation: build Spark's own `count_min_sketch`
  // aggregate over user_id (mergeable, map-side combined — the streaming
  // heavy-hitter sketch at 100 TB), then probe it with the custom
  // [[graft.expressions.CountMinEstimate]] expression (Spark ships the
  // build side but no probe). Verified like the HLL twin: exact counts
  // ride along and every estimate must satisfy the CMS guarantee
  // exact ≤ est ≤ exact + eps·N; the oracle pins keys + exact counts
  // and asserts TRUE. Deterministic for a fixed seed.
  // ---------------------------------------------------------------------
  private val cmsEps = 0.001
  private val cmsConfidence = 0.99
  private val cmsSeed = 42
  private val heavyK = 10

  def freqSketch(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val sk = ev.agg(
      count_min_sketch(col("user_id"), lit(cmsEps), lit(cmsConfidence),
        lit(cmsSeed)).as("sk"),
      count(lit(1)).as("n_total"))
    val heavy = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id").asc)
      .limit(heavyK)
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    val est = column(graft.expressions.CountMinEstimate(
      expression(col("sk")), expression(col("user_id"))))
    heavy.crossJoin(broadcast(sk))
      .select(col("user_id"), col("exact_cnt"),
        (est >= col("exact_cnt") &&
          est <= col("exact_cnt") +
            ceil(col("n_total") * cmsEps).cast("long"))
          .as("within_bounds"))
  }

  private val freqSketchSql =
    s"""SELECT user_id, exact_cnt, TRUE AS within_bounds FROM (
       |  SELECT user_id, COUNT(*) AS exact_cnt FROM events
       |  GROUP BY user_id
       |  ORDER BY exact_cnt DESC, user_id ASC LIMIT $heavyK) t""".stripMargin

  // ---------------------------------------------------------------------
  // Dataset card: the corpus-level report every published dataset ships —
  // size, token inventory, language/source diversity, exact-dup rate,
  // near-dup candidate volume — as one (metric, value) table. All scalar
  // aggregates fold in ONE corpus pass (a single agg row unpivoted by
  // stack — the same fused-scalar trick Qa.dimStats uses); the near-dup
  // pair count reads the memoized capped band table, so the card reuses
  // the dedup index instead of re-deriving it. All-integer values: the
  // card is hash-comparable with no float anywhere.
  // ---------------------------------------------------------------------
  def datasetCard(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns.tokens
    val d = Tables.load(s, dir, "documents")
    val scalars = d.agg(
      count(lit(1)).as("docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(size(tokens(col("text"))).cast("long")).as("tokens"),
      countDistinct(col("lang")).as("langs"),
      countDistinct(col("source")).as("sources"),
      countDistinct(md5(col("text"))).as("distinct_texts"))
    val card = scalars.select(expr(
      """stack(6,
        |  'docs', docs,
        |  'total_chars', total_chars,
        |  'tokens', tokens,
        |  'langs', langs,
        |  'sources', sources,
        |  'distinct_texts', distinct_texts) AS (metric, value)""".stripMargin))
    val nearPairs = DedupOps.minhashLsh(s, dir)
      .agg(count(lit(1)).as("value"))
      .select(lit("near_dup_candidate_pairs").as("metric"), col("value"))
    card.unionByName(nearPairs)
  }

  private val datasetCardSql =
    s"""SELECT 'docs' AS metric, COUNT(*) AS value FROM documents
       |UNION ALL SELECT 'total_chars', CAST(SUM(n_chars) AS BIGINT) FROM documents
       |UNION ALL SELECT 'tokens',
       |  CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) FROM documents
       |UNION ALL SELECT 'langs', COUNT(DISTINCT lang) FROM documents
       |UNION ALL SELECT 'sources', COUNT(DISTINCT source) FROM documents
       |UNION ALL SELECT 'distinct_texts', COUNT(DISTINCT md5(text)) FROM documents
       |UNION ALL SELECT 'near_dup_candidate_pairs', COUNT(*) FROM (
       |  ${DedupOps.minhashLshSqlForCompose.replace("\n", "\n  ")}) nd""".stripMargin

  // ---------------------------------------------------------------------
  // Join-key skew report: the diagnostic that decides WHEN a key needs
  // the j12 salting treatment or AQE skew handling — per-key exact row
  // counts over the events join key, reduced to the top heavy hitters
  // plus each hitter's share and imbalance factor (n / mean). The rule
  // of thumb it feeds: a key whose imbalance exceeds the AQE skew
  // threshold ratio will straggle any shuffle join it anchors; run this
  // BEFORE committing a partition strategy, not after the straggler.
  //
  // Scale shape: one map-side-combinable hash-agg to the key's distinct
  // cardinality, a single-row total broadcast cross (the whitelisted
  // scalar shape), and a TakeOrdered top-N cut — no window, corpus never
  // re-shuffled. Shares in integer ppm; imbalance cross-multiplied to
  // micro-units via integer DIV, so there are no float thresholds.
  // ---------------------------------------------------------------------
  val skewTopN = 10

  def skewReport(s: SparkSession, dir: String): DataFrame = {
    val per = graft.Tables.load(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val tot = per.agg(sum(col("n")).as("t"), count(lit(1)).as("k"))
    per.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n"),
        expr("(n * 1000000) DIV t").as("share_ppm"),
        // n·k·10⁶ overflows a BIGINT intermediate once hitter-count ×
        // distinct-key-count exceeds ~9.2e12 — split the constant across
        // two DECIMAL(19,0) factors (the a22_srm_check discipline) so
        // the product is DECIMAL(38) in both engines at any corpus size
        expr("CAST((CAST(n * 1000 AS DECIMAL(19,0))" +
          " * CAST(k * 1000 AS DECIMAL(19,0))) DIV t AS BIGINT)")
          .as("imbalance_micro"))
      .orderBy(col("n").desc, col("user_id").asc)
      .limit(skewTopN)
  }

  private val skewReportSql =
    s"""WITH per AS (
       |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
       |tot AS (
       |  SELECT CAST(SUM(n) AS BIGINT) AS t, COUNT(*) AS k FROM per)
       |SELECT user_id, n,
       |  (n * 1000000) // t AS share_ppm,
       |  CAST((CAST(n * 1000 AS DECIMAL(19,0))
       |        * CAST(k * 1000 AS DECIMAL(19,0))) // t AS BIGINT)
       |    AS imbalance_micro
       |FROM per, tot
       |ORDER BY n DESC, user_id ASC LIMIT $skewTopN""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("s_skew_report", skewReport, Some(skewReportSql),
      "join-key heavy-hitter report: exact per-key counts, integer-ppm share and imbalance factor — the pre-join salting/AQE-skew decision input"),
    Op("s_dataset_card", datasetCard, Some(datasetCardSql),
      "dataset card: corpus size/diversity/dup metrics in one pass + the dedup index"),
    Op("s_profile_columns", profileColumns, Some(profileColumnsSql),
      "one-pass per-column profile: nulls, exact distinct, typed min/max"),
    Op("s_histogram", histogram, Some(histogramSql),
      "equi-width histogram with literal bounds (single pass, sparse buckets)"),
    Op("s_freq_sketch", freqSketch, Some(freqSketchSql),
      "count-min sketch build + custom probe expression, CMS error bound enforced in-op"))
}
