package graft

import org.apache.spark.sql.DataFrame

/** The keyed-window scale auditor (shared by GraftSpec's repo-wide sweep
  * and its own negative control).
  *
  * Audits the PHYSICAL plan through [[Explain.planNodes]], which descends
  * into each cached relation's original plan — the r12 review found the
  * `dimProvider` global window invisible to the previous logical-plan
  * walk because `optimizedPlan` collapses a Memo-cached builder to an
  * `InMemoryRelation` leaf (the same cache-boundary blind spot the r9
  * loop-join audit fix closed for `Explain.counters`). Physical
  * `WindowExec` nodes are 1:1 with post-ExtractWindowExpressions logical
  * Window nodes, so the per-query whitelist counts carry over;
  * `WindowGroupLimitExec` is deliberately NOT counted — it is the
  * rank-limit PRE-filter (bounded output per partition), not a
  * corpus-sized single-task sort.
  *
  * Criterion — partition SIZE, not key cardinality: a window serializes
  * each partition through ONE task's sort, and unlike a skewed shuffle
  * join (AQE splits those) a skewed or oversized window partition has no
  * runtime escape. "Enum-bounded" keys (source, lang, split, event_type,
  * a status column, calendar keys) bound partition COUNT — precisely the
  * wrong direction: each partition then holds corpus/|values| rows. The
  * r8 curate_domain_cap finding slipped through the old name-whitelist on
  * exactly that conflation. So: every window must have AT LEAST ONE
  * partition key with a bounded-SIZE argument, recorded below; strata
  * keys pass only composited with such a key. A window that can't
  * satisfy this must be re-expressed — a bounded top-K aggregate
  * (BoundedTopK), a broadcast-threshold filter, a distributive min-agg,
  * or the range-repartitioned global-row-number decomposition
  * (SurrogateKeys) — all in-repo templates.
  */
object WindowAudit {

  /** Keys that alone bound window-partition SIZE, each with the bound's
    * argument. The bound must hold at 100 TB, not at the test SF.
    */
  val sizeBoundedKeys: Map[String, String] = Map(
    "doc_id" -> "rows per document: bounded by document length",
    "media_id" -> "rows per media item: bounded by per-item artifacts",
    "q_id" -> "per-query candidate list: probe/rerank sets are k-/cap-bounded",
    "user_id" -> "per-user history: human-scale fanout",
    "patient_id" -> "per-patient admissions: human-scale fanout",
    "event_id" -> "interval-dedup key: match multiplicity ~= 1",
    "event_key" -> "interval-dedup key: match multiplicity ~= 1",
    "vec_a" -> "per-vector neighbor list: k-bounded by the index",
    "src" -> "per-vector neighbor list: k-bounded by the index",
    "cell" -> "IVF cell: ~N/k rows, k ~ sqrt(N) re-tuned with the corpus",
    "shard" -> ("hash shard: N/shards with the shard COUNT a deployment " +
      "parameter scaling with N (Curate.shardsFor); the packing prefix " +
      "sum's shard is a 4096-doc range by construction"),
    "sup" -> "packing prefix-sum level 2: exactly 4096 shards per super-shard",
    "band" -> "LSH bucket behind hotBucketCap (capped explode, own spec)",
    "sig" -> "LSH bucket behind hotBucketCap (capped explode, own spec)")

  /** All window nodes in the executed plan, cached builders included. */
  private def windowNodes(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] =
    Explain.planNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }

  /** Keyed windows whose partition-key set carries NO size-bounded key. */
  def violations(df: DataFrame): Seq[String] =
    windowNodes(df).filter(_.partitionSpec.nonEmpty).flatMap { w =>
      val names = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
      if (names.exists(sizeBoundedKeys.contains)) Nil
      else Seq(s"window keyed on [${names.mkString(", ")}] has no " +
        "size-bounded partition key (strata keys bound partition COUNT, " +
        "not SIZE)")
    }

  /** Unpartitioned (global) windows — all rows through one task; allowed
    * only with a per-query bounded-frame justification in GraftSpec.
    */
  def globalWindowCount(df: DataFrame): Int =
    windowNodes(df).count(_.partitionSpec.isEmpty)
}
