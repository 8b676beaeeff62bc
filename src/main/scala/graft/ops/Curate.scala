package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline: the end-to-end query a
  * training-data run actually executes, stitched from the individually
  * oracle-verified operators. A document survives into the training
  * corpus iff it passes EVERY gate:
  *
  *  1. language gate — the stopword language-ID says "en" ([[TextOps.langId]])
  *  2. quality gate — stopword/length heuristics say "good" ([[TextOps.qualityScore]])
  *  3. exact dedup — it is its content-hash group's keeper ([[DedupOps.exactDedup]])
  *  4. near dedup — it is its transitive near-dup cluster's survivor
  *     ([[DedupOps.nearDupSurvivors]])
  *  5. decontamination — it shares no 3-gram shingle with the held-out
  *     benchmark set, and is not itself a benchmark doc
  *     ([[DedupOps.contamination]])
  *
  * Scale shape: gates 1-2 are narrow codegen'd maps over the scan; gates
  * 3-5 reuse the memoized hash-agg / cluster / shingle tables, so the
  * composition adds only the semi-join reductions — each gate's key set
  * is a doc_id projection that AQE joins at whatever strategy its
  * runtime size warrants. Nothing here re-derives an upstream stage: at
  * 100 TB this is one declarative plan over shared, already-built
  * intermediates.
  */
object Curate extends OpGroup {

  // Memoized + persisted: SIX registered queries consume this chain
  // (curate_corpus, both training-set settings, both manifests, the
  // release diff) — without sharing, each re-executes the lang/quality/
  // dedup/contamination gates. The persisted frame is doc-level METADATA
  // (doc_id, lang, n_chars — ~20 B/row), not the corpus: at 10^10 docs
  // that is ~200 GB cluster-wide, a routine storage footprint for the
  // artifact every downstream layout job shares; Memo's bounded
  // retention releases it when the session moves on.
  def curatedCorpus(s: SparkSession, dir: String): DataFrame =
    Memo.of(s, dir, "curatedCorpus") {
      val d = Tables.load(s, dir, "documents")
      val en = TextOps.langId(s, dir)
        .filter(col("predicted_lang") === "en").select(col("doc_id"))
      val good = TextOps.qualityScore(s, dir)
        .filter(col("quality") === "good").select(col("doc_id"))
      val exactKeep = DedupOps.exactDedup(s, dir)
        .select(col("keep_doc_id").as("doc_id"))
      val nearKeep = DedupOps.nearDupSurvivors(s, dir)
      val clean = DedupOps.contamination(s, dir)
        .filter(!col("contaminated")).select(col("doc_id"))
      d.select(col("doc_id"), col("lang"), col("n_chars"))
        .join(en, Seq("doc_id"))
        .join(good, Seq("doc_id"))
        .join(exactKeep, Seq("doc_id"))
        .join(nearKeep, Seq("doc_id"))
        .join(clean, Seq("doc_id"))
        .persist()
    }

  private val curatedCorpusSql =
    s"""WITH RECURSIVE ${DedupOps.clusterCtes},
       |${DedupOps.contaminationCtes},
       |ql AS (${TextOps.qualityScoreSql}),
       |li AS (${TextOps.langIdSql}),
       |ek AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
       |SELECT d.doc_id, d.lang, d.n_chars
       |FROM documents d
       |JOIN li ON li.doc_id = d.doc_id AND li.predicted_lang = 'en'
       |JOIN ql ON ql.doc_id = d.doc_id AND ql.quality = 'good'
       |JOIN ek ON ek.doc_id = d.doc_id
       |JOIN clusters c ON c.doc_id = d.doc_id AND c.cluster_id = d.doc_id
       |LEFT JOIN chits h ON h.doc_id = d.doc_id
       |WHERE d.source <> '${DedupOps.benchmarkSource}'
       |  AND COALESCE(h.n_shared, 0) = 0""".stripMargin

  // ---------------------------------------------------------------------
  // Curation funnel report: per-gate survival counts and char volume for
  // the exact gate chain curate_corpus applies — the dataset-card table
  // every corpus release publishes ("X docs crawled, Y after language
  // ID, Z after dedup…"). Gates are CUMULATIVE in pipeline order, so the
  // final row equals the curated corpus by construction (pinned in the
  // suite).
  //
  // Scale shape: NOT six successive filtered counts (that re-executes
  // the gate chain per stage) — each gate's doc_id set left-joins onto
  // the corpus once as a 0/1 flag, and ONE map-side-combinable aggregate
  // computes every cumulative conjunction as integer sums; the six
  // output rows unfold from the singleton agg row. The corpus is read
  // once; all sums are integers, so the result is order-independent.
  // ---------------------------------------------------------------------
  def funnelReport(s: SparkSession, dir: String): DataFrame = {
    def gate(df: DataFrame, flag: String) =
      df.select(col("doc_id"), lit(1L).as(flag))
    val en = gate(TextOps.langId(s, dir)
      .filter(col("predicted_lang") === "en").select("doc_id"), "f1")
    val good = gate(TextOps.qualityScore(s, dir)
      .filter(col("quality") === "good").select("doc_id"), "f2")
    val ek = gate(DedupOps.exactDedup(s, dir)
      .select(col("keep_doc_id").as("doc_id")), "f3")
    val nk = gate(DedupOps.nearDupSurvivors(s, dir), "f4")
    val clean = gate(DedupOps.contamination(s, dir)
      .filter(!col("contaminated")).select("doc_id"), "f5")
    val flags = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .join(en, Seq("doc_id"), "left")
      .join(good, Seq("doc_id"), "left")
      .join(ek, Seq("doc_id"), "left")
      .join(nk, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .na.fill(0L, Seq("f1", "f2", "f3", "f4", "f5"))
    // cumulative conjunctions as 0/1 products
    val g = Seq(
      lit(1L),
      col("f1"),
      col("f1") * col("f2"),
      col("f1") * col("f2") * col("f3"),
      col("f1") * col("f2") * col("f3") * col("f4"),
      col("f1") * col("f2") * col("f3") * col("f4") * col("f5"))
    val aggCols = g.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(c).cast("long").as(s"n$i"),
        sum(c * col("n_chars")).cast("long").as(s"c$i"))
    }
    val one = flags.agg(aggCols.head, aggCols.tail: _*)
    val labels = Seq("0_total", "1_lang_en", "2_quality_good",
      "3_exact_keeper", "4_near_survivor", "5_decontaminated")
    one.select(explode(array(labels.zipWithIndex.map { case (l, i) =>
      struct(lit(l).as("gate"), col(s"n$i").as("n_docs"),
        col(s"c$i").as("n_chars"))
    }: _*)).as("r")).select(col("r.gate").as("gate"),
      col("r.n_docs").as("n_docs"), col("r.n_chars").as("n_chars"))
  }

  private val funnelReportSql =
    s"""WITH RECURSIVE ${DedupOps.clusterCtes},
       |${DedupOps.contaminationCtes},
       |ql AS (${TextOps.qualityScoreSql}),
       |li AS (${TextOps.langIdSql}),
       |ekf AS (SELECT md5(text) AS fp, MIN(doc_id) AS keep_id
       |        FROM documents GROUP BY md5(text)),
       |gflags AS (
       |  SELECT d.doc_id, d.n_chars,
       |    CASE WHEN li.predicted_lang = 'en' THEN 1 ELSE 0 END AS f1,
       |    CASE WHEN ql.quality = 'good' THEN 1 ELSE 0 END AS f2,
       |    CASE WHEN k.keep_id = d.doc_id THEN 1 ELSE 0 END AS f3,
       |    CASE WHEN c.cluster_id = d.doc_id THEN 1 ELSE 0 END AS f4,
       |    CASE WHEN d.source <> '${DedupOps.benchmarkSource}'
       |          AND COALESCE(h.n_shared, 0) = 0 THEN 1 ELSE 0 END AS f5
       |  FROM documents d
       |  LEFT JOIN li ON li.doc_id = d.doc_id
       |  LEFT JOIN ql ON ql.doc_id = d.doc_id
       |  LEFT JOIN ekf k ON k.fp = md5(d.text)
       |  LEFT JOIN clusters c ON c.doc_id = d.doc_id
       |  LEFT JOIN chits h ON h.doc_id = d.doc_id)
       |SELECT '0_total' AS gate, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars FROM gflags
       |UNION ALL SELECT '1_lang_en', CAST(SUM(f1) AS BIGINT),
       |  CAST(SUM(f1 * n_chars) AS BIGINT) FROM gflags
       |UNION ALL SELECT '2_quality_good', CAST(SUM(f1 * f2) AS BIGINT),
       |  CAST(SUM(f1 * f2 * n_chars) AS BIGINT) FROM gflags
       |UNION ALL SELECT '3_exact_keeper', CAST(SUM(f1 * f2 * f3) AS BIGINT),
       |  CAST(SUM(f1 * f2 * f3 * n_chars) AS BIGINT) FROM gflags
       |UNION ALL SELECT '4_near_survivor',
       |  CAST(SUM(f1 * f2 * f3 * f4) AS BIGINT),
       |  CAST(SUM(f1 * f2 * f3 * f4 * n_chars) AS BIGINT) FROM gflags
       |UNION ALL SELECT '5_decontaminated',
       |  CAST(SUM(f1 * f2 * f3 * f4 * f5) AS BIGINT),
       |  CAST(SUM(f1 * f2 * f3 * f4 * f5 * n_chars) AS BIGINT) FROM gflags""".stripMargin

  // ---------------------------------------------------------------------
  // Per-domain quota cap (the C4/RefinedWeb "no domain dominates" rule):
  // keep at most `domainCap` documents per source, preferring longer
  // documents (length as the quality proxy; swap in any score), with a
  // doc_id tie-break so the cut is a total order.
  //
  // Scale shape: two-phase top-K as ONE bounded AGGREGATE
  // ([[graft.expressions.BoundedTopK]]), not a rank window. `source` is
  // enum-bounded — which bounds window-partition COUNT, not SIZE: a
  // `row_number() OVER (PARTITION BY source …)` puts corpus/|sources|
  // rows into each window partition, a multi-TB single-task sort at
  // 100 TB with no AQE escape. The aggregate's map-side partial keeps a
  // K-element heap per source per mapper, so the exchange carries at
  // most K·mappers rows per source and the merge folds heaps — the cap
  // stage's shuffled volume is bounded by the CAP, never the corpus.
  // posexplode of the best-first array reproduces the rank.
  // ---------------------------------------------------------------------
  val domainCap = 15 // < the 25 docs/source of the smallest SF, so the cap BITES

  def domainCapped(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .groupBy(col("source"))
      .agg(graft.expressions.BoundedTopK
        .topK(col("n_chars"), col("doc_id"), domainCap).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("t.id").as("doc_id"), col("source"),
        col("t.key").as("n_chars"),
        (col("p") + 1).cast("int").as("rank_in_source"))

  private val domainCappedSql =
    s"""SELECT doc_id, source, n_chars, rank_in_source FROM (
       |  SELECT doc_id, source, n_chars,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY n_chars DESC, doc_id ASC) AS INT) AS rank_in_source
       |  FROM documents) r
       |WHERE rank_in_source <= $domainCap""".stripMargin

  // ---------------------------------------------------------------------
  // Curriculum staging: assign each document a difficulty stage (1..4 by
  // length quartile — swap in any difficulty signal) WITHOUT a global
  // sort. The naive form is ntile(4) over a corpus-wide ORDER BY — one
  // window partition holding every row, the single worst plan shape at
  // 100 TB. Instead: one exact-percentile aggregation computes the three
  // cut points (a sketch at deployment scale, like text_quantiles_approx),
  // they re-enter the plan as a broadcast, and stage assignment is a
  // stateless codegen'd CASE — the same two-phase discipline as
  // text_outlier_docs. Within-stage ordering at training time composes
  // with text_global_shuffle. Boundary docs (n_chars == a cut) land in
  // the lower stage in both engines: the cuts are identical doubles and
  // the comparison is <=.
  // ---------------------------------------------------------------------
  def curriculumStages(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val cuts = d.agg(
      expr("percentile(n_chars, 0.25)").as("q1"),
      expr("percentile(n_chars, 0.5)").as("q2"),
      expr("percentile(n_chars, 0.75)").as("q3"))
    d.select(col("doc_id"), col("n_chars"))
      .crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_chars"),
        when(col("n_chars") <= col("q1"), 1)
          .when(col("n_chars") <= col("q2"), 2)
          .when(col("n_chars") <= col("q3"), 3)
          .otherwise(4).as("stage"))
  }

  private val curriculumStagesSql =
    """WITH cuts AS (
      |  SELECT quantile_cont(n_chars, 0.25) AS q1,
      |         quantile_cont(n_chars, 0.5) AS q2,
      |         quantile_cont(n_chars, 0.75) AS q3
      |  FROM documents)
      |SELECT doc_id, n_chars,
      |  CASE WHEN n_chars <= q1 THEN 1
      |       WHEN n_chars <= q2 THEN 2
      |       WHEN n_chars <= q3 THEN 3
      |       ELSE 4 END AS stage
      |FROM documents, cuts""".stripMargin

  // ---------------------------------------------------------------------
  // Diversity-aware selection under a budget: cluster-round-robin — the
  // deterministic stand-in for greedy MMR (maximal marginal relevance),
  // which is inherently sequential and therefore the wrong shape for a
  // cluster. Every document's embedding already has a home IVF cell (the
  // shared k-means index; MIN over the top-2 probe cells is the
  // deterministic choice); within each cell documents rank by quality
  // (length proxy, doc_id tie-break), and the budget is spent in
  // (cell_rank, cell) order — each cell's best first, then each cell's
  // second best, and so on. No cell can dominate the selection, which is
  // exactly the failure mode of pure top-N-by-quality on a corpus with a
  // dense mode (SemDeDup's cluster-balance argument).
  //
  // Scale shape: one keyed join against the memoized cell index, one
  // rank window per cell, then a global rank over the PRE-FILTERED
  // boundary stratum only (cell_rank <= budget) — at most budget · k
  // rows regardless of corpus size, so the single-partition gather is
  // budget-bounded, never corpus-bounded.
  // ---------------------------------------------------------------------
  final val diverseBudget = 100

  def diverseSample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val home = SimilarityOps.ivfCells(s, dir)
      .groupBy(col("vec_id"))
      .agg(min(col("cell")).cast("int").as("cell"))
    val d = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .join(home, col("doc_id") === col("vec_id")).drop("vec_id")
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val wPick = Window.orderBy(col("cell_rank").asc, col("cell").asc,
      col("doc_id").asc)
    d.withColumn("cell_rank", row_number().over(wCell).cast("int"))
      .filter(col("cell_rank") <= diverseBudget)
      .withColumn("pick_rank", row_number().over(wPick).cast("int"))
      .filter(col("pick_rank") <= diverseBudget)
      .select(col("doc_id"), col("cell"), col("n_chars"),
        col("cell_rank"), col("pick_rank"))
  }

  private lazy val diverseSampleSql =
    s"""WITH ${SimilarityOps.ivfCellsCtesForCompose},
       |home AS (
       |  SELECT vec_id, CAST(MIN(cell) AS INT) AS cell
       |  FROM assign2 GROUP BY vec_id),
       |ranked_div AS (
       |  SELECT d.doc_id, h.cell, d.n_chars,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY h.cell
       |      ORDER BY d.n_chars DESC, d.doc_id ASC) AS INT) AS cell_rank
       |  FROM documents d JOIN home h ON h.vec_id = d.doc_id)
       |SELECT doc_id, cell, n_chars, cell_rank, pick_rank FROM (
       |  SELECT doc_id, cell, n_chars, cell_rank,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cell_rank ASC, cell ASC,
       |      doc_id ASC) AS INT) AS pick_rank
       |  FROM ranked_div WHERE cell_rank <= $diverseBudget) t
       |WHERE pick_rank <= $diverseBudget""".stripMargin

  // ---------------------------------------------------------------------
  // Sequence packing (concat-then-chunk): lay the corpus out as the
  // fixed-length training sequences the trainer actually consumes —
  // every doc gets a global token offset in deterministic doc_id order,
  // the token stream is cut every packLen tokens, and each (doc,
  // sequence) overlap becomes one assignment row. This is the GPT-style
  // packing rule (concatenate, then chunk; docs may span sequences) —
  // no padding waste, bit-identical on any engine.
  //
  // The global running offset LOOKS like a corpus-wide ordered scan —
  // the forbidden global window — but decomposes into a two-level
  // distributed prefix sum: within-shard cumsum (window keyed on a
  // 4096-doc shard), per-shard totals cumsum'd within a 4096-shard
  // super-shard, and ONE global window over super-shard totals —
  // corpus/4096² rows (a 10¹⁰-doc corpus yields ~600). Same escape
  // discipline as the census' per-year offsets, one level deeper.
  // Complements text_pack_sequences (the per-(lang,shard)-stratum
  // boundary report): THIS op emits the token-exact global layout — the
  // (seq_id, doc slice) assignment table a data loader reads.
  // ---------------------------------------------------------------------
  val packLen = 512L
  private val packShard = 4096L

  def packSequences(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text")))
          .cast("long").as("tok_cnt"))
    // level 1: within-shard running offset (shard fanout = 4096 docs BY
    // CONSTRUCTION — doc_id ranges, not hash buckets)
    val d1 = t.withColumn("shard", expr(s"doc_id DIV $packShard"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = d1.withColumn("local_off",
      coalesce(sum(col("tok_cnt")).over(wIn), lit(0L)))
    // level 2: shard totals, cumsum'd within 4096-shard super-shards
    val shardTot = d1.groupBy(col("shard"))
      .agg(sum(col("tok_cnt")).as("stot"))
      .withColumn("sup", expr(s"shard DIV $packShard"))
    val wSup = Window.partitionBy(col("sup")).orderBy(col("shard").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withinSup = shardTot.withColumn("sup_local",
      coalesce(sum(col("stot")).over(wSup), lit(0L)))
    // level 3: ONE global window over super-shard totals — corpus/4096²
    // rows, the genuinely bounded frame
    val supTot = shardTot.groupBy(col("sup")).agg(sum(col("stot")).as("suptot"))
    val wG = Window.orderBy(col("sup").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val supOff = supTot
      .withColumn("sup_off", coalesce(sum(col("suptot")).over(wG), lit(0L)))
      .select(col("sup"), col("sup_off"))
    val shardOff = withinSup.join(supOff, Seq("sup"))
      .select(col("shard"), (col("sup_off") + col("sup_local")).as("shard_off"))
    val placed = local.join(shardOff, Seq("shard"))
      .filter(col("tok_cnt") > 0)
      .select(col("doc_id"), col("tok_cnt"),
        (col("shard_off") + col("local_off")).as("s"))
      .withColumn("e", col("s") + col("tok_cnt"))
    // each doc spans sequences floor(s/L)..floor((e-1)/L): explode is
    // bounded by ceil(doc tokens / packLen) + 1 — document length, never
    // the corpus
    placed
      .withColumn("seq_id", explode(sequence(
        expr(s"s DIV $packLen"), expr(s"(e - 1) DIV $packLen"))))
      .select(col("seq_id"), col("doc_id"),
        (greatest(col("s"), col("seq_id") * packLen) - col("s")).as("doc_from"),
        (least(col("e"), (col("seq_id") + lit(1L)) * packLen) - col("s")).as("doc_to"))
      .withColumn("n_tokens", col("doc_to") - col("doc_from"))
  }

  private val packSequencesSql =
    s"""WITH tl AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok_cnt
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, tok_cnt,
       |    COALESCE(SUM(tok_cnt) OVER (ORDER BY doc_id ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      CAST(0 AS BIGINT)) AS s
       |  FROM tl),
       |a AS (SELECT doc_id, s, s + tok_cnt AS e FROM o WHERE tok_cnt > 0),
       |x AS (
       |  SELECT doc_id, s, e,
       |    unnest(range(CAST(s // $packLen AS BIGINT),
       |      CAST((e - 1) // $packLen + 1 AS BIGINT))) AS sq
       |  FROM a)
       |SELECT CAST(sq AS BIGINT) AS seq_id, doc_id,
       |  CAST(greatest(s, sq * $packLen) - s AS BIGINT) AS doc_from,
       |  CAST(least(e, (sq + 1) * $packLen) - s AS BIGINT) AS doc_to,
       |  CAST(least(e, (sq + 1) * $packLen)
       |    - greatest(s, sq * $packLen) AS BIGINT) AS n_tokens
       |FROM x""".stripMargin

  // ---------------------------------------------------------------------
  // LEAKAGE-FREE train/eval split: assign the split by a hash of the
  // near-dup CLUSTER id, not the doc id. [[TextOps.splitAssign]]'s
  // doc-id hash is the standard recipe and it silently leaks: two
  // near-duplicate documents hash independently, so ~16% of every dup
  // cluster's copies land in eval while their twins train — the eval
  // set then contains paraphrases of training data and overstates the
  // model (split leakage through near-dups, the evaluation bug
  // decontamination alone does not fix because it only screens against
  // the BENCHMARK set, not the corpus's own eval slice). Hashing the
  // cluster id makes the split constant per cluster by construction.
  //
  // Scale shape: one narrow hash-map over the memoized cluster table
  // (the same shared artifact dedup_survivors and the curation pipeline
  // consume — no new clustering pass); deterministic md5, stable under
  // repartitioning, appends, and engine swaps like every split/sample
  // hash in this repo.
  // ---------------------------------------------------------------------
  def leakageFreeSplit(s: SparkSession, dir: String): DataFrame =
    DedupOps.dedupClusters(s, dir).select(
      col("doc_id"), col("cluster_id"),
      when(substring(graft.functions.TextFns.fastMd5(
        concat(lit("lsplit|"), col("cluster_id").cast("string"))), 1, 2)
        < TextOps.evalHexCeiling, lit("eval"))
        .otherwise(lit("train")).as("split"))

  private val leakageFreeSplitSql =
    s"""WITH RECURSIVE ${DedupOps.clusterCtes}
       |SELECT doc_id, cluster_id,
       |  CASE WHEN substring(md5('lsplit|' || CAST(cluster_id AS VARCHAR)), 1, 2)
       |         < '${TextOps.evalHexCeiling}'
       |       THEN 'eval' ELSE 'train' END AS split
       |FROM clusters""".stripMargin

  // ---------------------------------------------------------------------
  // Multi-epoch sampling plan: temperature-scaled source weights
  // (Conneau & Lample 2019's p_s ∝ n_s^τ — the recipe behind every
  // published "dataset / sampling prop / epochs" table): τ < 1 upsamples
  // small sources relative to their share, and the per-source epoch
  // count (target/n_s > 1 means the source repeats) is the artifact the
  // trainer consumes. Complements text_mixture_weights, which caps each
  // source at an absolute token budget; this allocates a GLOBAL budget
  // across sources by relative size.
  //
  // Scale shape: one map-side-combinable agg to |sources| rows, then
  // pure arithmetic on that broadcast-sized frame — the corpus is read
  // once and never shuffled. Determinism: pow/sum run over ≤ |sources|
  // doubles; p_sample is rounded to 1e-6 BEFORE the budget multiply so
  // both engines derive target/epochs from the identical double (the
  // mixtureWeights discipline).
  // ---------------------------------------------------------------------
  final val epochTau = 0.3
  final val epochTokenBudget = 20000

  def epochPlan(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.load(s, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(graft.functions.TextFns.tokens(col("text"))))
        .cast("long").as("n_tokens"))
    val w = n.select(col("source"), col("n_tokens"),
      pow(col("n_tokens").cast("double"), lit(epochTau)).as("wt"))
    val z = w.agg(sum("wt").as("z"))
    w.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"),
        round(col("wt") / col("z"), 6).as("p_sample"))
      .withColumn("target_tokens",
        floor(col("p_sample") * lit(epochTokenBudget)).cast("long"))
      .withColumn("epochs",
        round(col("target_tokens").cast("double") / col("n_tokens"), 4))
  }

  private val epochPlanSql =
    s"""WITH n AS (
       |  SELECT source,
       |    CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
       |      AS n_tokens
       |  FROM documents GROUP BY source),
       |w AS (SELECT source, n_tokens,
       |        pow(CAST(n_tokens AS DOUBLE), $epochTau) AS wt FROM n),
       |z AS (SELECT SUM(wt) AS z FROM w)
       |SELECT source, n_tokens,
       |  round(wt / z, 6) AS p_sample,
       |  CAST(FLOOR(round(wt / z, 6) * $epochTokenBudget) AS BIGINT)
       |    AS target_tokens,
       |  round(CAST(FLOOR(round(wt / z, 6) * $epochTokenBudget) AS BIGINT)
       |    / CAST(n_tokens AS DOUBLE), 4) AS epochs
       |FROM w, z""".stripMargin

  // ---------------------------------------------------------------------
  // Model-based quality filter inference (the FineWeb-Edu / DCLM recipe:
  // a trained classifier scores every document, the corpus keeps the
  // high scorers). The model here is a linear bag-of-words classifier
  // over HASHED token features (Weinberger's hashing trick: token →
  // md5 → one of 65,536 buckets), scored as mean bucket weight; the
  // weights are derived deterministically from a second hash slice so
  // BOTH engines hold the identical "model" without shipping a weights
  // file — in deployment the trained weight vector (a few hundred KB)
  // broadcasts to executors and the plan is unchanged.
  //
  // Scale shape: inference is embarrassingly parallel — explode keeps a
  // doc's tokens in its scan partition, the per-doc sum collapses in the
  // map-side partial, so the exchange carries ~one row per document,
  // never per token, and the md5/weight path is codegen'd end to end
  // (an all-HOF per-row variant would avoid even that exchange but runs
  // interpreted — the repo's codegen rule prefers this shape).
  // Determinism: every weight is an exact multiple of 2^-16 and per-doc
  // magnitudes fit the double mantissa, so the sum is order-independent
  // and the 1e-6-quantized score is engine-identical.
  // ---------------------------------------------------------------------
  // Memoized: THREE registered queries consume the scored frame (the
  // filter itself, the calibration table, the threshold sweep) — without
  // sharing, each re-runs the corpus token explode + hashing. The
  // persisted frame is one row per document (id, count, score, keep).
  def classifierFilter(s: SparkSession, dir: String): DataFrame =
    Memo.of(s, dir, "classifierFilter")(
      classifierFilterBuild(s, dir).persist())

  private def classifierFilterBuild(s: SparkSession, dir: String): DataFrame = {
    val fns = graft.functions.TextFns
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(fns.tokens(col("text"))).as("t"))
    val bucket =
      conv(substring(fns.fastMd5(col("t")), 1, 4), 16, 10).cast("int")
    val w = (conv(substring(fns.fastMd5(
      concat(lit("qw|"), bucket.cast("string"))), 1, 4), 16, 10)
      .cast("double") - lit(32768.0d)) / lit(65536.0d)
    tok.select(col("doc_id"), w.as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("w")).as("sw"))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("sw") / col("n_tokens") * 1e6 + 0.5).cast("long")
          .as("score_q"))
      .withColumn("keep", col("score_q") >= 0)
  }

  private val classifierFilterSql =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
      |  FROM documents),
      |wt AS (
      |  SELECT doc_id,
      |    (CAST(CAST('0x' || substring(md5('qw|' ||
      |        CAST(CAST('0x' || substring(md5(t), 1, 4) AS INTEGER)
      |          AS VARCHAR)), 1, 4) AS INTEGER) AS DOUBLE) - 32768)
      |      / 65536 AS w
      |  FROM tk)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(FLOOR(SUM(w) / COUNT(*) * 1000000 + 0.5) AS BIGINT) AS score_q,
      |  CAST(FLOOR(SUM(w) / COUNT(*) * 1000000 + 0.5) AS BIGINT) >= 0 AS keep
      |FROM wt GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Release drift report: Population Stability Index between the RAW
  // crawl and the CURATED release over three bounded stratifications —
  // source share, language share, and log2 length-bucket share. The
  // dataset-card question it answers: "what did the gates do to the
  // corpus mix?" (a curation chain that silently halves a language's
  // share is a training-distribution change the funnel's scalar counts
  // don't show). PSI = Σ_b (p_cur − p_raw)·ln(p_cur/p_raw); the standard
  // monitoring convention reads <0.1 stable, >0.25 shifted.
  //
  // Scale shape: the curated side reuses the memoized corpus (a doc_id
  // semi-join, no gate re-runs); the stack of three features is an
  // explode of a 3-element literal array (rows ×3, collapsed by the
  // map-side partial before any exchange), and every key space is
  // bounded — sources × langs × log2 buckets — so the agg output is
  // tens of rows at any corpus size. Laplace +1 smoothing over the raw
  // bucket set keeps empty curated buckets finite (curated ⊆ raw, so
  // raw's bucket set IS the union). Determinism: shares are exact
  // integer ratios, each PSI term is floored to nano-units before the
  // per-feature sum (the klMixture discipline), so partition order
  // cannot move the reported value.
  // ---------------------------------------------------------------------
  def driftReport(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val kept = curatedCorpus(s, dir).select(col("doc_id"), lit(1L).as("kept"))
    val feats = d.select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"))
      .join(kept, Seq("doc_id"), "left")
      .na.fill(0L, Seq("kept"))
      .select(col("kept"), explode(array(
        struct(lit("source").as("feature"), col("source").as("bucket")),
        struct(lit("lang").as("feature"), col("lang").as("bucket")),
        struct(lit("len_log2").as("feature"),
          floor(log2(col("n_chars") + 1)).cast("long").cast("string")
            .as("bucket")))).as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bucket").as("bucket"),
        col("kept"))
    val counts = feats.groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as("c_raw"), sum(col("kept")).as("c_cur"))
    val tot = counts.groupBy(col("feature"))
      .agg(sum("c_raw").as("n_raw"), sum("c_cur").as("n_cur"),
        count(lit(1)).as("n_buckets"))
    val pRaw = (col("c_raw") + 1).cast("double") /
      (col("n_raw") + col("n_buckets")).cast("double")
    val pCur = (col("c_cur") + 1).cast("double") /
      (col("n_cur") + col("n_buckets")).cast("double")
    counts.join(broadcast(tot), "feature")
      .select(col("feature"), col("n_buckets"),
        floor((pCur - pRaw) * log(pCur / pRaw) * lit(1e9)).cast("long")
          .as("term_nano"))
      .groupBy(col("feature"))
      .agg(max(col("n_buckets")).as("n_buckets"),
        sum(col("term_nano")).as("psi_nano"))
      .select(col("feature"), col("n_buckets"),
        round(col("psi_nano").cast("double") / 1e9, 6).as("psi"))
  }

  private def driftReportSql: String =
    s"""$curatedAsCte,
       |feats AS (
       |  SELECT 'source' AS feature, d.source AS bucket,
       |    CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END AS kept
       |  FROM documents d LEFT JOIN cur c USING (doc_id)
       |  UNION ALL
       |  SELECT 'lang', d.lang,
       |    CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END
       |  FROM documents d LEFT JOIN cur c USING (doc_id)
       |  UNION ALL
       |  SELECT 'len_log2',
       |    CAST(CAST(FLOOR(log2(d.n_chars + 1)) AS BIGINT) AS VARCHAR),
       |    CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END
       |  FROM documents d LEFT JOIN cur c USING (doc_id)),
       |cnts AS (
       |  SELECT feature, bucket, COUNT(*) AS c_raw, SUM(kept) AS c_cur
       |  FROM feats GROUP BY 1, 2),
       |tots AS (
       |  SELECT feature, SUM(c_raw) AS n_raw, SUM(c_cur) AS n_cur,
       |    COUNT(*) AS n_buckets
       |  FROM cnts GROUP BY 1),
       |terms AS (
       |  SELECT c.feature, t.n_buckets,
       |    CAST(FLOOR(
       |      (CAST(c.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + t.n_buckets AS DOUBLE)
       |       - CAST(c.c_raw + 1 AS DOUBLE) / CAST(t.n_raw + t.n_buckets AS DOUBLE))
       |      * ln((CAST(c.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + t.n_buckets AS DOUBLE))
       |          / (CAST(c.c_raw + 1 AS DOUBLE) / CAST(t.n_raw + t.n_buckets AS DOUBLE)))
       |      * 1000000000) AS BIGINT) AS term_nano
       |  FROM cnts c JOIN tots t USING (feature))
       |SELECT feature, MAX(n_buckets) AS n_buckets,
       |  round(CAST(SUM(term_nano) AS DOUBLE) / 1000000000, 6) AS psi
       |FROM terms GROUP BY feature""".stripMargin

  // ---------------------------------------------------------------------
  // Filter calibration: the 2×2 agreement table between the model-based
  // quality filter (curate_classifier_filter's keep) and the heuristic
  // quality gate (text_quality_score's good/bad) — the ablation every
  // filter swap runs BEFORE rebuilding a corpus (the FineWeb-Edu
  // discipline: a trained classifier that disagrees with the heuristics
  // on half the corpus is either a big win or a big bug, and this table
  // is how you find out which). Each cell carries its doc count, exact
  // summed classifier score (the cell's score mass — low |mean| in
  // disagreement cells means the classifier is UNSURE there, high means
  // a genuine verdict flip), and corpus share in integer ppm.
  //
  // Scale shape: one doc_id join of two per-doc frames (both one
  // map-side-combinable pass over the corpus), then a hash-agg to ≤4
  // rows; the share's denominator is a single-row broadcast cross
  // (whitelisted, the sim_ivf_balance shape). All cells integer: counts,
  // summed micro-scores, ppm floor-divisions.
  // ---------------------------------------------------------------------
  def filterCalibration(s: SparkSession, dir: String): DataFrame = {
    val cf = classifierFilter(s, dir)
      .select(col("doc_id"), col("keep"), col("score_q"))
    val q = TextOps.qualityScore(s, dir).select(col("doc_id"), col("quality"))
    val cells = cf.join(q, Seq("doc_id"))
      .groupBy(col("keep"), col("quality"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("score_q")).cast("long").as("sum_score_q"))
    val tot = cells.agg(sum(col("n_docs")).as("n_total"))
    cells.crossJoin(broadcast(tot))
      .select(col("keep"), col("quality"), col("n_docs"), col("sum_score_q"),
        expr("(n_docs * 1000000) DIV n_total").as("share_ppm"),
        (col("keep") === (col("quality") === "good")).as("agree"))
  }

  private lazy val filterCalibrationSql =
    s"""WITH cf AS ($classifierFilterSql),
       |qg AS (${TextOps.qualityScoreSql}),
       |cells AS (
       |  SELECT cf.keep, qg.quality,
       |    COUNT(*) AS n_docs,
       |    CAST(SUM(cf.score_q) AS BIGINT) AS sum_score_q
       |  FROM cf JOIN qg ON qg.doc_id = cf.doc_id
       |  GROUP BY cf.keep, qg.quality),
       |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM cells)
       |SELECT keep, quality, n_docs, sum_score_q,
       |  (n_docs * 1000000) // n_total AS share_ppm,
       |  (keep = (quality = 'good')) AS agree
       |FROM cells, tot""".stripMargin

  // ---------------------------------------------------------------------
  // Classifier threshold sweep: the operating curve for choosing the
  // quality-filter cut — at each candidate threshold, how many documents
  // survive, what corpus share that is, and how much score mass the kept
  // set carries (the FineWeb-Edu ablation table: "keep score ≥ X" is a
  // data-volume-vs-quality trade someone must pick with numbers). The
  // shipped curate_classifier_filter pins threshold 0; this is the sweep
  // that justifies (or moves) that pin.
  //
  // Scale shape: the per-doc score frame is computed once (one explode +
  // per-doc partial agg, the classifier's own plan), each doc row fans
  // out ×|thresholds| via a literal-array explode and collapses in the
  // map-side partial — the exchange carries |thresholds| rows total. No
  // window, no second corpus pass. All integers.
  // ---------------------------------------------------------------------
  final val sweepThresholds = Seq(-50000L, -20000L, 0L, 20000L, 50000L)

  def thresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val scored = classifierFilter(s, dir).select(col("doc_id"), col("score_q"))
    val th = array(sweepThresholds.map(lit): _*)
    val tot = scored.agg(count(lit(1)).as("n_total"))
    scored.select(col("score_q"), explode(th).as("threshold"))
      .groupBy(col("threshold"))
      .agg(sum(when(col("score_q") >= col("threshold"), 1L).otherwise(0L))
        .as("n_keep"),
        sum(when(col("score_q") >= col("threshold"), col("score_q"))
          .otherwise(0L)).as("kept_score_q"))
      .crossJoin(broadcast(tot))
      .select(col("threshold"), col("n_keep"), col("kept_score_q"),
        expr("(n_keep * 1000000) DIV n_total").as("keep_ppm"))
  }

  private lazy val thresholdSweepSql =
    s"""WITH cfs AS ($classifierFilterSql),
       |th(threshold) AS (VALUES ${sweepThresholds.map(t => s"($t)").mkString(", ")}),
       |tot AS (SELECT COUNT(*) AS n_total FROM cfs),
       |sw AS (
       |  SELECT th.threshold,
       |    CAST(SUM(CASE WHEN c.score_q >= th.threshold THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_keep,
       |    CAST(SUM(CASE WHEN c.score_q >= th.threshold THEN c.score_q
       |      ELSE 0 END) AS BIGINT) AS kept_score_q
       |  FROM cfs c, th GROUP BY th.threshold)
       |SELECT CAST(threshold AS BIGINT) AS threshold, n_keep, kept_score_q,
       |  (n_keep * 1000000) // n_total AS keep_ppm
       |FROM sw, tot""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("curate_threshold_sweep", thresholdSweep, Some(thresholdSweepSql),
      "classifier-threshold operating curve: survivors, corpus share, kept score mass per candidate cut — the number the filter pin is chosen by"),
    Op("curate_filter_calibration", filterCalibration,
      Some(filterCalibrationSql),
      "model-vs-heuristic filter agreement: 2x2 confusion cells with exact score mass and integer-ppm corpus share"),
    Op("curate_classifier_filter", classifierFilter,
      Some(classifierFilterSql),
      "model-based quality filter: hashed bag-of-words linear classifier scored as one codegen map + per-doc partial agg (FineWeb-Edu/DCLM recipe)"),
    Op("curate_epoch_plan", epochPlan, Some(epochPlanSql),
      "temperature-scaled multi-epoch sampling plan: p_s ~ n_s^tau, per-source target tokens and epoch counts"),
    Op("curate_leakage_free_split", leakageFreeSplit,
      Some(leakageFreeSplitSql),
      "train/eval split hashed on the near-dup CLUSTER id: no cluster straddles the split, eval can't hold near-copies of train docs"),
    Op("curate_pack_sequences", packSequences, Some(packSequencesSql),
      "sequence packing: concat-then-chunk doc->training-sequence layout via two-level distributed prefix sum"),
    Op("curate_diverse_sample", diverseSample, Some(diverseSampleSql),
      "diversity-aware budget selection: cluster-round-robin over IVF cells (MMR stand-in)"),
    Op("curate_corpus", curatedCorpus, Some(curatedCorpusSql),
      "composed curation: lang + quality + exact/near dedup + decontamination"),
    Op("curate_funnel_report", funnelReport, Some(funnelReportSql),
      "dataset-card funnel: per-gate cumulative survival counts and char volume in one aggregate pass"),
    Op("curate_domain_cap", domainCapped, Some(domainCappedSql),
      "per-domain quota cap: top-K docs per source by length (C4/RefinedWeb rule)"),
    Op("curate_curriculum", curriculumStages, Some(curriculumStagesSql),
      "curriculum staging: quartile difficulty bins via broadcast cut points, no global sort"),
    Op("curate_training_set", trainingSet, Some(trainingSetSql),
      "end-to-end training-set layout: curated corpus -> domain cap -> split -> shuffle coordinates"),
    Op("curate_training_set_s16",
      (s, d) => trainingSetAt(s, d, trainingShardsAlt),
      Some(trainingSetSqlAt(trainingShardsAlt)),
      "the training-set layout at a second shard setting: shards are a deployment parameter, not a constant"),
    Op("curate_shard_manifest", shardManifest, Some(shardManifestSql),
      "release manifest: per-(split,shard) counts, char volume, id range, order-independent content digest"),
    Op("curate_shard_manifest_s16",
      (s, d) => shardManifestAt(s, d, trainingShardsAlt),
      Some(shardManifestSqlAt(trainingShardsAlt)),
      "the release manifest at the second shard setting: digest stays order-independent across settings"),
    Op("curate_release_diff", releaseDiff, Some(releaseDiffSql),
      "release diff: 8-shard vs 16-shard layouts rolled to split grain must carry identical counts/volume/digest — re-sharding cannot change a commutative digest"),
    Op("curate_drift_report", driftReport, Some(driftReportSql),
      "raw-vs-curated PSI drift over source/lang/length strata: what the gate chain did to the corpus mix, in bounded aggregate space"))

  // ---------------------------------------------------------------------
  // The full training-set materialization in ONE declarative plan — what
  // actually ships to the trainer: the curated corpus (lang + quality +
  // exact/near dedup + decontamination, from curate_corpus), re-capped
  // per domain AMONG the survivors (the cap must apply after cleaning,
  // or junk holds quota; two-phase BoundedTopK aggregate — same de-skew
  // argument as curate_domain_cap above), then every surviving doc gets
  // its final layout coordinates: train/eval split (content-hash,
  // append-stable), pseudorandom shard within its split, and
  // within-shard position — text_global_shuffle's coordinates
  // partitioned by (split, shard). Each stage is a semi-join or narrow
  // map over the previous one; nothing re-derives an upstream gate. At
  // 100 TB this is the one job whose output IS the dataset.
  //
  // The shard count is a PARAMETER, not a constant: the pos window is
  // keyed on (split, shard), so rows-per-window-partition is
  // corpus/(2·shards) — bounded only if shards scales with the corpus.
  // [[shardsFor]] states that deployment rule as code (shards from a
  // target rows-per-shard); the registered queries pin two settings (8
  // and 16) so the oracle verifies the layout is correct at ANY setting,
  // and the manifest digest is order-independent across settings.
  // ---------------------------------------------------------------------
  // final val of a literal = compile-time constant: the `ops` list above
  // forces trainingSetSql during object init, BEFORE later plain vals
  // would initialize (a plain val here interpolated as 0)
  final val trainingDomainCap = 10
  final val trainingShards = 8
  final val trainingShardsAlt = 16

  /** The deployment rule for the shard count: enough shards that no
    * (split, shard) window partition outgrows one task. 4 hex digits of
    * the routing hash give 65,536 distinct shard keys — raise the digit
    * count alongside corpus growth past ~10¹¹ docs.
    */
  def shardsFor(nDocs: Long, targetDocsPerShard: Long = 4L << 20): Int =
    math.max(1L, (nDocs + targetDocsPerShard - 1) / targetDocsPerShard)
      .min(1 << 16).toInt

  def trainingSet(s: SparkSession, dir: String): DataFrame =
    trainingSetAt(s, dir, trainingShards)

  def trainingSetAt(s: SparkSession, dir: String, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val posW = Window.partitionBy(col("split"), col("shard"))
      .orderBy(col("h").asc, col("doc_id").asc)
    shardedTrainingSet(s, dir, shards)
      .withColumn("pos", row_number().over(posW))
      .select(col("doc_id"), col("source"), col("split"), col("shard"),
        col("pos"))
  }

  /** The training set up to its (split, shard) routing — shared by the
    * coordinates query and the release manifest. Shard routing is 4 hex
    * digits of the shuffle hash mod `shards`: deterministic, uniform,
    * and defined for any shard count ≤ 2¹⁶.
    */
  private def shardedTrainingSet(s: SparkSession, dir: String,
      shards: Int): DataFrame = Memo.of(s, dir, s"shardedTrainingSet$shards") {
    // memoized per shard setting: the coordinates query, the manifest,
    // and the release diff each consume it; output is cap-bounded
    // (≤ |sources| × trainingDomainCap rows), so the persist is a
    // broadcast-sized artifact, never the corpus
    val curated = curatedCorpus(s, dir)
      .join(Tables.load(s, dir, "documents").select("doc_id", "source"),
        "doc_id")
    val capped = curated
      .groupBy(col("source"))
      .agg(graft.expressions.BoundedTopK
        .topK(col("n_chars"), col("doc_id"), trainingDomainCap).as("top"))
      .select(col("source"), explode(col("top.id")).as("doc_id"))
    val split = when(
      substring(graft.functions.TextFns.fastMd5(col("doc_id").cast("string")),
        1, 2) < TextOps.evalHexCeiling, lit("eval")).otherwise(lit("train"))
    val h = graft.functions.TextFns.fastMd5(
      concat(lit("shuf|"), col("doc_id").cast("string")))
    capped.select(col("doc_id"), col("source"), split.as("split"), h.as("h"))
      .withColumn("shard",
        (conv(substring(col("h"), 1, 4), 16, 10).cast("long") % shards)
          .cast("int"))
      .persist()
  }

  /** The training-set CTE chain up to `sharded_ts`, shared by the
    * coordinates query and the release manifest.
    */
  /** curatedCorpusSql with its final SELECT wrapped into a `cur` CTE, for
    * oracles that extend the curated corpus (training set, drift report).
    * Guard the surgery: if the final SELECT's spelling drifts, fail at
    * first use with a named error instead of emitting broken SQL the
    * oracle run would report as a DuckDB parse failure far from here.
    */
  private def curatedAsCte: String = {
    require(curatedCorpusSql.contains("\nSELECT d.doc_id"),
      "curatedAsCte: curatedCorpusSql's final SELECT no longer matches " +
        "the CTE-wrapping pattern — update both together")
    curatedCorpusSql
      .replaceFirst("\\nSELECT d\\.doc_id", ",\ncur AS (SELECT d.doc_id") + ")"
  }

  private def trainingCtes(shards: Int): String = {
    s"""$curatedAsCte,
       |cap_ts AS (
       |  SELECT doc_id, source FROM (
       |    SELECT cur.doc_id, d2.source,
       |      ROW_NUMBER() OVER (PARTITION BY d2.source
       |        ORDER BY cur.n_chars DESC, cur.doc_id ASC) AS rk
       |    FROM cur JOIN documents d2 ON d2.doc_id = cur.doc_id) c
       |  WHERE rk <= $trainingDomainCap),
       |coords_ts AS (
       |  SELECT doc_id, source,
       |    ${splitSqlFor("doc_id")} AS split,
       |    md5('shuf|' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM cap_ts),
       |sharded_ts AS (
       |  SELECT doc_id, source, split, h,
       |    CAST(CAST('0x' || substring(h, 1, 4) AS BIGINT) % $shards AS INT)
       |      AS shard
       |  FROM coords_ts)""".stripMargin
  }

  private def trainingSetSqlAt(shards: Int): String =
    s"""${trainingCtes(shards)}
       |SELECT doc_id, source, split, shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY split, shard
       |    ORDER BY h ASC, doc_id ASC) AS INT) AS pos
       |FROM sharded_ts""".stripMargin

  private lazy val trainingSetSql = trainingSetSqlAt(trainingShards)

  // ---------------------------------------------------------------------
  // Release manifest: the per-(split, shard) summary a dataset RELEASE
  // ships so any copy of the 100 TB training set can be verified without
  // re-reading it in any particular order — doc count, character volume,
  // id range, and an ORDER-INDEPENDENT content digest (the sum of a
  // 32-bit hash of each row's (doc_id, content-fingerprint) pair:
  // addition commutes, so any engine, partitioning, or read order
  // reproduces it — the property a distributed verification needs; a
  // hash-of-sorted-concat would demand a global sort per shard). The
  // digest covers CONTENT, not just membership: a flipped byte changes
  // the normalized fingerprint and therefore the shard digest.
  //
  // Scale shape: one doc_id join (training set ⋈ documents) + one
  // map-side-combinable hash-agg to splits × shards rows.
  // ---------------------------------------------------------------------
  def shardManifest(s: SparkSession, dir: String): DataFrame =
    shardManifestAt(s, dir, trainingShards)

  /** Per-doc manifest digest term `(doc_id, n_chars, rh)` — the
    * md5-over-normalized-text pass, which is the expensive part of every
    * manifest and is LAYOUT-INDEPENDENT: the 8-shard manifest, the
    * 16-shard manifest, and the release diff (which consumes both) all
    * reuse this one frame instead of re-reading and re-hashing the
    * corpus once per shard layout. Persisted via Memo: three narrow
    * columns (two longs + a long hash), a per-release build artifact at
    * 100 TB — the same class of scheduled job as the dedup cluster
    * table, with none of the text retained.
    */
  private def manifestDocDigest(s: SparkSession, dir: String): DataFrame =
    Memo.of(s, dir, "manifestDocDigest") {
      val fns = graft.functions.TextFns
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          conv(substring(fns.fastMd5(concat(lit("man|"),
            col("doc_id").cast("string"), lit(":"),
            fns.fingerprint(col("text")))), 1, 8), 16, 10)
            .cast("long").as("rh"))
        .persist()
    }

  def shardManifestAt(s: SparkSession, dir: String, shards: Int): DataFrame = {
    val d = manifestDocDigest(s, dir)
    shardedTrainingSet(s, dir, shards).join(d, Seq("doc_id"))
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        sum(col("rh")).cast("long").as("digest"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  /** Per-row manifest hash term (DuckDB side), shared by the manifest
    * and the release diff so both digests are definitionally identical.
    */
  // lazy: referenced from SQL builders that `val ops` (earlier in the
  // object body) forces at init — a plain val here interpolates as null.
  // Single concatenated line: a stripMargin'd block interpolated into a
  // stripMargin'd outer template loses the first `|` of line-leading `||`.
  // The *For variants are shared with the STREAMING manifest oracle
  // (streamingManifestMaintainSql) so the digest, split, and shard
  // routing stay definitionally identical across the batch and
  // maintained manifests — a change here updates both or neither.
  private[graft] def manifestRowHashSqlFor(id: String, text: String): String =
    s"CAST('0x' || substring(md5('man|' || CAST($id AS VARCHAR) " +
      s"|| ':' || md5(regexp_replace(regexp_replace(lower(trim($text)), " +
      "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))), 1, 8) AS BIGINT)"

  private[graft] def splitSqlFor(id: String): String =
    s"CASE WHEN substring(md5(CAST($id AS VARCHAR)), 1, 2) " +
      s"< '${TextOps.evalHexCeiling}' THEN 'eval' ELSE 'train' END"

  private[graft] def shardSqlFor(id: String, shards: Int): String =
    s"CAST(CAST('0x' || substring(md5('shuf|' || CAST($id AS VARCHAR)), " +
      s"1, 4) AS BIGINT) % $shards AS INT)"

  private lazy val manifestRowHashSql =
    manifestRowHashSqlFor("d.doc_id", "d.text")

  private def shardManifestSqlAt(shards: Int): String =
    s"""${trainingCtes(shards)}
       |SELECT t.split, t.shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM($manifestRowHashSql) AS BIGINT) AS digest,
       |  MIN(d.doc_id) AS min_doc, MAX(d.doc_id) AS max_doc
       |FROM sharded_ts t JOIN documents d ON d.doc_id = t.doc_id
       |GROUP BY t.split, t.shard""".stripMargin

  private lazy val shardManifestSql = shardManifestSqlAt(trainingShards)

  // ---------------------------------------------------------------------
  // Release diff: prove two physical layouts of the SAME release carry
  // the same content — here the 8-shard and 16-shard materializations,
  // rolled to split grain. Because the manifest digest is a commutative
  // SUM of per-row hashes, re-sharding cannot change it: any layout of a
  // 100 TB release — different shard counts, partitionings, read orders
  // — rolls up to the same (n_docs, n_chars, digest) per split, and the
  // check costs two manifest reads (splits × shards rows), never a
  // corpus re-read. The oracle derives the expected rollup ONCE from the
  // sharded chain — if either Spark-side layout deviated in membership
  // or content, its digest would miss the oracle's and the hash gate
  // fails; `consistent` falsifies non-vacuously in the suite.
  // ---------------------------------------------------------------------
  def releaseDiff(s: SparkSession, dir: String): DataFrame = {
    def roll(shards: Int, sfx: String) =
      shardManifestAt(s, dir, shards)
        .groupBy(col("split"))
        .agg(sum(col("n_docs")).cast("long").as(s"n_docs_$sfx"),
          sum(col("n_chars")).cast("long").as(s"n_chars_$sfx"),
          sum(col("digest")).cast("long").as(s"digest_$sfx"))
    roll(trainingShards, "a").join(roll(trainingShardsAlt, "b"), Seq("split"))
      .withColumn("consistent",
        col("n_docs_a") === col("n_docs_b") &&
          col("n_chars_a") === col("n_chars_b") &&
          col("digest_a") === col("digest_b"))
  }

  private lazy val releaseDiffSql =
    s"""${trainingCtes(trainingShards)},
       |roll AS (
       |  SELECT t.split, COUNT(*) AS n_docs,
       |    CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       |    CAST(SUM($manifestRowHashSql) AS BIGINT) AS digest
       |  FROM sharded_ts t JOIN documents d ON d.doc_id = t.doc_id
       |  GROUP BY t.split)
       |SELECT split,
       |  n_docs AS n_docs_a, n_chars AS n_chars_a, digest AS digest_a,
       |  n_docs AS n_docs_b, n_chars AS n_chars_b, digest AS digest_b,
       |  TRUE AS consistent
       |FROM roll""".stripMargin
}
