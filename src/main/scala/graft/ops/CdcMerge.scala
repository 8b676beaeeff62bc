package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO / CDC upsert — the mutation family (SURVEY.md §2.9 M1–M6)
  * generalized to a change-feed apply, which is how a warehouse ingests
  * updates at scale instead of row-at-a-time UPDATE/DELETE: compact the
  * feed to the LATEST change per key, then one full-outer join against
  * the snapshot decides insert / update / delete / carry-over per row.
  *
  * Scale shape: compaction is one window pass partitioned by the merge
  * key (at 100 TB the feed shuffles once; per-key groups are bounded by
  * feed depth, not corpus size), the join shuffles both sides on the same
  * key — two exchanges total, and the snapshot side's is reusable if the
  * snapshot is bucketed on the key ([[graft.sources.Warehouse.bucketedJoin]]
  * shows that layout deleting this exchange too). Last-wins ordering is
  * total — (ts, event_id) DESC — so recomputation is deterministic,
  * mirroring how the reference re-runs its UPDATE scripts idempotently.
  */
object CdcMerge extends OpGroup {

  /** Apply a compacted change feed to a snapshot.
    *
    * @param snapshot current table state
    * @param changes  raw feed rows
    * @param snapKey / feedKey  merge key column on each side
    * @param ordering feed columns, later-wins LAST (total order required)
    * @param isDelete row predicate on the feed marking a delete change
    * @param setCols  (output column → feed value expr) applied on
    *                 insert/update; unset output columns carry the
    *                 snapshot value through (NULL on insert)
    */
  def merge(snapshot: DataFrame, changes: DataFrame, snapKey: String,
      feedKey: String, ordering: Seq[Column], isDelete: Column,
      setCols: Map[String, Column]): DataFrame = {
    val w = Window.partitionBy(col(feedKey)).orderBy(ordering.map(_.desc): _*)
    val latest = changes
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .withColumn("_del", isDelete)
    val joined = snapshot.join(latest,
      snapshot(snapKey) === latest(feedKey), "full_outer")
    // a delete drops its matched row; an unmatched delete is a no-op
    // (its full-outer row carries no snapshot and is dropped too)
    val kept = joined.filter(latest(feedKey).isNull || !col("_del"))
    val changed = latest(feedKey).isNotNull
    kept.select(
      coalesce(latest(feedKey), snapshot(snapKey)).as(snapKey) +:
        snapshot.columns.filterNot(_ == snapKey).map { c =>
          setCols.get(c)
            .map(v => when(changed, v).otherwise(snapshot(c)).as(c))
            .getOrElse(snapshot(c))
        }: _*)
  }

  /** Snapshot: the first 75 customer keys — at sf0.01 the event feed's
    * user_id range (0–149) then exercises every branch: updates/deletes
    * inside the snapshot, inserts beyond it.
    */
  private val snapshotMaxKey = 75

  def cdcUpsert(s: SparkSession, dir: String): DataFrame = {
    val snapshot = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") < snapshotMaxKey)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val feed = Tables.load(s, dir, "events")
      .filter(col("event_type").isin("signup", "purchase", "error"))
    merge(snapshot, feed, "c_custkey", "user_id",
      Seq(col("ts"), col("event_id")),
      col("event_type") === "error",
      Map(
        "c_name" -> coalesce(col("c_name"), lit("(new)")),
        "c_acctbal" -> col("value")))
  }

  private[graft] val cdcUpsertSql =
    s"""WITH latest AS (
       |  SELECT user_id, event_type, value FROM (
       |    SELECT user_id, event_type, value,
       |      ROW_NUMBER() OVER (PARTITION BY user_id
       |                         ORDER BY ts DESC, event_id DESC) AS rn
       |    FROM events
       |    WHERE event_type IN ('signup', 'purchase', 'error')) t
       |  WHERE rn = 1),
       |snap AS (SELECT c_custkey, c_name, c_acctbal FROM customer
       |         WHERE c_custkey < $snapshotMaxKey)
       |SELECT coalesce(l.user_id, s.c_custkey) AS c_custkey,
       |  CASE WHEN l.user_id IS NOT NULL
       |       THEN coalesce(s.c_name, '(new)') ELSE s.c_name END AS c_name,
       |  CASE WHEN l.user_id IS NOT NULL
       |       THEN l.value ELSE s.c_acctbal END AS c_acctbal
       |FROM snap s FULL OUTER JOIN latest l ON s.c_custkey = l.user_id
       |WHERE l.user_id IS NULL OR l.event_type <> 'error'""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("m7_cdc_upsert", cdcUpsert, Some(cdcUpsertSql),
      "MERGE INTO: latest-wins change-feed compaction + full-outer apply (insert/update/delete)"))
}
