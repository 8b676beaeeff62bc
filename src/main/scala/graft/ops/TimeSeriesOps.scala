package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the `events` stream: resample an
  * irregular event feed onto a daily calendar and forward-fill gaps — the
  * feature-engineering step every longitudinal model (patient vitals in the
  * reference's world, user activity here) needs before windowed training.
  *
  * Scale shape: the daily close is one (user, day) hash-agg-equivalent
  * window; the calendar explode multiplies each USER by their span in days
  * (bounded by the feed's horizon, independent of event volume); the
  * forward fill is one running `last(ignoreNulls)` window per user. Two
  * shuffles total, both on `user_id` — AQE coalesces the tiny calendar
  * side. Nothing is ever globally sorted and no state outlives its user
  * partition, so the plan survives a 1000-executor scale-up; a heavily
  * skewed user (bot feed) is handled by the same salting pattern as
  * `j12_salted_skew_join` if it ever dominates a partition.
  */
object TimeSeriesOps extends OpGroup {

  /** Daily forward-fill: last observed `value` per (user, day), resampled
    * onto each user's min..max day span, gaps carrying the prior close.
    */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"), col("ts"),
        col("event_id"), col("value"))
    // Deterministic daily close: latest ts wins, event_id breaks exact-ts
    // ties (ids are unique, so the order is total).
    val byDay = Window.partitionBy(col("user_id"), col("d"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val daily = ev.withColumn("rn", row_number().over(byDay))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("d"), col("value").as("day_close"))
    // Per-user calendar: explode is narrow on the (already tiny) span agg.
    val cal = daily.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("d"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        last(col("day_close"), ignoreNulls = true).over(fill)
          .as("filled_value"),
        col("day_close").isNotNull.as("observed"))
  }

  private val gapFillSql =
    """WITH daily AS (
      |  SELECT user_id, d, value AS day_close FROM (
      |    SELECT user_id, CAST(ts AS DATE) AS d, value,
      |           ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |             ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events) t WHERE rn = 1),
      |span AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
      |cal AS (SELECT user_id,
      |          CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      |        FROM span)
      |SELECT c.user_id, c.d,
      |  LAST_VALUE(day_close IGNORE NULLS) OVER (PARTITION BY c.user_id ORDER BY c.d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
      |  day_close IS NOT NULL AS observed
      |FROM cal c LEFT JOIN daily dl ON c.user_id = dl.user_id AND c.d = dl.d""".stripMargin

  /** Rolling event-time features: per event, the count/sum/avg of the
    * user's events in the trailing 7 days (closed interval, event-time
    * RANGE frame — not a row count, so irregular feeds weight correctly).
    * The feature-engineering staple for per-entity activity signals.
    *
    * Scale shape: ONE shuffle on `user_id`, then a per-partition sort and
    * a sliding frame evaluated incrementally by WindowExec (add/remove at
    * the frame edges — never a rescan of the frame per row). The frame is
    * bounded by wall-clock span, so a bursty user costs O(events in 7
    * days) memory, not O(history). Both engines see the identical integer
    * microsecond ORDER key — interval arithmetic at timestamp precision
    * never crosses an engine boundary.
    *
    * The windowed sums accumulate in an exact DECIMAL (the feed's values
    * carry 2 decimals): a double accumulator sums in frame order on
    * Spark but segment-tree order in DuckDB, and at sf0.1 frame sizes
    * that 1-ulp drift crossed a round(…, 6) boundary on 2 of 100k rows
    * — caught only by the per-round sf0.1 probe. The average is the
    * exact sum over the count in ONE deterministic divide; never
    * `avg()`, whose internal accumulation re-opens the same hole.
    */
  def rollingFeatures(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-7L * 86400L * 1000000L, 0L)
    val cnt = count(lit(1)).over(w)
    val dsum = sum(col("value")
      .cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(w)
    ev.select(col("event_id"), col("user_id"), col("ts"),
      cnt.as("cnt_7d"),
      dsum.cast("double").as("sum_7d"),
      round(dsum.cast("double") / cnt, 6).as("avg_7d"))
  }

  private val rollingFeaturesSql =
    """SELECT event_id, user_id, ts,
      |  COUNT(*) OVER w AS cnt_7d,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d,
      |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |        / (COUNT(*) OVER w), 6) AS avg_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("ts_gap_fill", gapFill, Some(gapFillSql),
      "daily resample + forward-fill per user: calendar explode, running last(ignoreNulls)"),
    Op("ts_rolling_features", rollingFeatures, Some(rollingFeaturesSql),
      "trailing-7-day event-time RANGE frame per user: incremental sliding count/sum/avg"))
}
