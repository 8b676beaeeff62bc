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

  def curatedCorpus(s: SparkSession, dir: String): DataFrame = {
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
  // Per-domain quota cap (the C4/RefinedWeb "no domain dominates" rule):
  // keep at most `domainCap` documents per source, preferring longer
  // documents (length as the quality proxy; swap in any score), with a
  // doc_id tie-break so the cut is a total order.
  //
  // Scale shape: ONE shuffle on source + a rank window per source. The
  // number of sources is bounded (domains, not documents), but a single
  // hot domain at 100 TB can outgrow one window partition — the scale
  // escape is two-phase: per-source count + quantile pass first (the
  // text_length_quantiles shape) to find each source's length cut point,
  // then a stateless filter, with the window reserved for the boundary
  // stratum only. The windowed form here is the oracle-pinned semantics.
  // ---------------------------------------------------------------------
  val domainCap = 15 // < the 25 docs/source of the smallest SF, so the cap BITES

  def domainCapped(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rank_in_source", row_number().over(w))
      .filter(col("rank_in_source") <= domainCap)
  }

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

  override val ops: Seq[Op] = Seq(
    Op("curate_corpus", curatedCorpus, Some(curatedCorpusSql),
      "composed curation: lang + quality + exact/near dedup + decontamination"),
    Op("curate_domain_cap", domainCapped, Some(domainCappedSql),
      "per-domain quota cap: top-K docs per source by length (C4/RefinedWeb rule)"),
    Op("curate_curriculum", curriculumStages, Some(curriculumStagesSql),
      "curriculum staging: quartile difficulty bins via broadcast cut points, no global sort"))
}
