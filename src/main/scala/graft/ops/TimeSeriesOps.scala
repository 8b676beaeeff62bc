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

  // ---------------------------------------------------------------------
  // Time-series anomaly flags: per (user, day) event counts scored
  // against the user's own trailing-28-day baseline — the volume-spike
  // detector every ingestion pipeline runs. The 3σ rule is evaluated in
  // EXACT INTEGER arithmetic via cross-multiplication:
  //   (x − μ)² > 9σ²  with μ = Σx/n, σ² = (n·Σx² − (Σx)²)/n²
  //   ⟺  (x·n − Σx)² > 9·(n·Σx² − (Σx)²)
  // — trailing n, Σx, Σx² are BIGINT window sums (day counts are small,
  // no overflow reachable), so the flag is engine- and order-exact with
  // zero float thresholds (the a15_corr_stats moment discipline applied
  // to a sliding frame). The baseline EXCLUDES the current day (frame
  // ends at 1 PRECEDING): a spike must not mask itself by inflating its
  // own baseline; days with fewer than minBaselineDays of history stay
  // unflagged. One user_id shuffle; the daily pre-aggregation collapses
  // the event feed before any window work.
  // ---------------------------------------------------------------------
  val anomalyBaselineDays = 28L
  val minBaselineDays = 7L

  def anomalyDays(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-anomalyBaselineDays, -1L)
    val n = count(lit(1)).over(w)
    val sx = sum(col("x")).over(w)
    val sxx = sum(col("x") * col("x")).over(w)
    daily.select(col("user_id"), col("day"), col("x").as("n_events"),
      n.as("base_days"), sx.as("base_sum"),
      (coalesce(n, lit(0L)) >= minBaselineDays &&
        (col("n_events") * n - sx) > 0 &&
        (col("n_events") * n - sx) * (col("n_events") * n - sx) >
          lit(9L) * (n * sxx - sx * sx)).as("anomaly"))
  }

  private val anomalyDaysSql =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS x
       |  FROM events GROUP BY 1, 2),
       |scored AS (
       |  SELECT user_id, day, x,
       |    COUNT(*) OVER w AS n, SUM(x) OVER w AS sx, SUM(x * x) OVER w AS sxx
       |  FROM daily
       |  WINDOW w AS (PARTITION BY user_id
       |    ORDER BY datediff('day', DATE '1970-01-01', day)
       |    RANGE BETWEEN $anomalyBaselineDays PRECEDING AND 1 PRECEDING))
       |SELECT user_id, day, CAST(x AS BIGINT) AS n_events,
       |  n AS base_days, CAST(sx AS BIGINT) AS base_sum,
       |  (COALESCE(n, 0) >= $minBaselineDays
       |   AND (x * n - sx) > 0
       |   AND (x * n - sx) * (x * n - sx) > 9 * (n * sxx - sx * sx)) AS anomaly
       |FROM scored""".stripMargin

  // ---------------------------------------------------------------------
  // MAD anomaly flags — the ROBUST twin of ts_anomaly_days: that query's
  // rolling mean/σ is corrupted by the very outliers it hunts (one huge
  // day inflates σ and masks the next three anomalies — the classic
  // masking failure), while median/MAD have a 50% breakdown point, so
  // this is the monitor a platform actually alerts on. Day-grain global
  // series; med and MAD via EXACT interpolated percentiles — Spark
  // `percentile` and DuckDB `quantile_cont` share the p·(n−1)
  // interpolation rule, and at p = 0.5 over integers the result is k or
  // k.5, exactly representable — scaled ×2 (med2, halves) and ×2 again
  // (mad4, quarters) into BIGINTs so every downstream compare is pure
  // integer. Flag: dev > 3·1.4826·MAD cross-multiplied to
  // 20000·dev2 > 44478·mad4 (1.4826 = the Gaussian consistency
  // constant as the rational 14826/10⁴); MAD = 0 (a majority-constant
  // series) degrades to flagging any deviation, documented convention.
  //
  // Scale shape: one day hash-agg over the corpus, then two scalar
  // percentile folds over CALENDAR-bounded rows (thousands of days for
  // decades — constant-sized at any corpus scale) broadcast back as
  // single-row crosses. No corpus-sized window anywhere.
  // ---------------------------------------------------------------------
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val s1 = daily.agg(
      expr("CAST(percentile(x, 0.5) * 2 AS BIGINT)").as("med2"))
    val scored = daily.crossJoin(broadcast(s1))
      .withColumn("dev2", abs(col("x") * 2 - col("med2")))
    val s2 = scored.agg(
      expr("CAST(percentile(dev2, 0.5) * 2 AS BIGINT)").as("mad4"))
    scored.crossJoin(broadcast(s2))
      .select(col("day"), col("x").as("n_events"), col("med2"),
        col("dev2"), col("mad4"),
        when(col("mad4") > 0,
          col("dev2") * 20000L > col("mad4") * 44478L)
          .otherwise(col("dev2") > 0).as("anomaly"))
  }

  private val anomalyMadSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x
      |  FROM events GROUP BY 1),
      |s1 AS (SELECT CAST(quantile_cont(x, 0.5) * 2 AS BIGINT) AS med2
      |       FROM daily),
      |scored AS (
      |  SELECT day, x, med2, abs(x * 2 - med2) AS dev2
      |  FROM daily, s1),
      |s2 AS (SELECT CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
      |       FROM scored)
      |SELECT day, CAST(x AS BIGINT) AS n_events, med2, dev2, mad4,
      |  CASE WHEN mad4 > 0 THEN dev2 * 20000 > mad4 * 44478
      |       ELSE dev2 > 0 END AS anomaly
      |FROM scored, s2""".stripMargin

  // ---------------------------------------------------------------------
  // Daily census (concurrent-interval count) by SWEEP LINE: how many
  // stays are open on each calendar day. The naive form explodes every
  // interval into its days (rows × stay length — unbounded when a stay
  // spans years). The sweep form emits exactly TWO deltas per interval
  // (+1 at admit day, -1 at discharge day), aggregates per day, and
  // prefix-sums the deltas over the date order: census(D) =
  // #{admit ≤ D} − #{disch ≤ D}, i.e. the discharge day itself is
  // vacated — matching the strict-< convention of a18_interval_overlap.
  // Sentinel-dated stays are excluded as there.
  //
  // Scale shape: 2 rows per interval, one day hash-agg, then a running
  // sum over a window whose partition is the DATE DOMAIN (thousands of
  // days for decades of data) — bounded by the calendar, not the corpus,
  // so the single-partition prefix sum is constant-sized at any scale;
  // at extreme horizons, the two-phase escape is per-year partial sums
  // broadcast as offsets (the curate_curriculum discipline).
  // ---------------------------------------------------------------------
  /** The sweep core over any (admit_d, disch_d) interval table —
    * exposed for the ScalaCheck equivalence proof against per-day
    * brute-force occupancy.
    */
  private[graft] def censusOver(adm: DataFrame): DataFrame = {
    val deltas = adm.select(col("admit_d").as("day"), lit(1L).as("delta"),
        lit(1L).as("a"), lit(0L).as("d"))
      .union(adm.select(col("disch_d"), lit(-1L), lit(0L), lit(1L)))
    val w = Window.orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.groupBy(col("day"))
      .agg(sum(col("delta")).as("_delta"), sum(col("a")).as("n_admits"),
        sum(col("d")).as("n_discharges"))
      .withColumn("census", sum(col("_delta")).over(w))
      .select(col("day"), col("n_admits"), col("n_discharges"), col("census"))
  }

  def censusSweep(s: SparkSession, dir: String): DataFrame =
    censusOver(Relational.sentinelConform(s, dir)
      .filter(col("admittime") =!= to_timestamp(lit("1900-01-01 00:00:00")))
      .select(to_date(col("admittime")).as("admit_d"),
        to_date(col("dischtime")).as("disch_d")))

  private lazy val censusSweepSql =
    s"""WITH adm_cs AS (
       |  SELECT CAST(admittime AS DATE) AS admit_d,
       |         CAST(dischtime AS DATE) AS disch_d
       |  FROM (${Relational.sentinelConformSql}) t
       |  WHERE admittime <> TIMESTAMP '1900-01-01 00:00:00'),
       |deltas_cs AS (
       |  SELECT admit_d AS day, 1 AS delta, 1 AS a, 0 AS d FROM adm_cs
       |  UNION ALL
       |  SELECT disch_d, -1, 0, 1 FROM adm_cs),
       |daily_cs AS (
       |  SELECT day, CAST(SUM(delta) AS BIGINT) AS delta,
       |         CAST(SUM(a) AS BIGINT) AS n_admits,
       |         CAST(SUM(d) AS BIGINT) AS n_discharges
       |  FROM deltas_cs GROUP BY day)
       |SELECT day, n_admits, n_discharges,
       |  CAST(SUM(delta) OVER (ORDER BY day ASC
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS census
       |FROM daily_cs""".stripMargin

  // ---------------------------------------------------------------------
  // OHLC downsample: the irregular event stream resampled to one
  // (event_type, hour) bar — open/high/low/close plus count and
  // quantized volume, the standard lossy compaction a dashboard or
  // long-horizon model reads instead of raw events. Open/close are
  // deterministic under the (ts, event_id) total order.
  //
  // Scale shape: ONE map-side-combinable hash aggregate — open/close
  // ride min/max over a (ts, event_id, value) struct (lexicographic
  // struct comparison = the tie rule, combinable like any min/max), so
  // there is no per-bucket sort or window anywhere; volume sums 1e-6-
  // quantized integers, order-independent by construction. Output is
  // |types| × hours — calendar-bounded, never event-bounded.
  // ---------------------------------------------------------------------
  def ohlcDownsample(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        col("ts"), col("event_id"), col("value"))
    e.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        min(struct(col("ts"), col("event_id"), col("value"))).as("_o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("_c"),
        max(col("value")).as("high_v"),
        min(col("value")).as("low_v"),
        sum(floor(col("value") * 1000000 + 0.5).cast("long")).cast("long")
          .as("vol_q"))
      .select(col("event_type"), col("h"), col("n_events"),
        col("_o.value").as("open_v"), col("high_v"), col("low_v"),
        col("_c.value").as("close_v"), col("vol_q"))
  }

  private val ohlcDownsampleSql =
    """SELECT event_type, date_trunc('hour', ts) AS h,
      |  COUNT(*) AS n_events,
      |  FIRST(value ORDER BY ts ASC, event_id ASC) AS open_v,
      |  MAX(value) AS high_v, MIN(value) AS low_v,
      |  LAST(value ORDER BY ts ASC, event_id ASC) AS close_v,
      |  CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS vol_q
      |FROM events GROUP BY event_type, date_trunc('hour', ts)""".stripMargin

  // ---------------------------------------------------------------------
  // CUSUM changepoint detection over per-type daily volumes — the
  // level-shift monitor that catches what ts_anomaly_days' single-day
  // 3σ flag cannot: a sustained small shift (a feed silently dropping
  // 20%) that never spikes any one day. Textbook CUSUM is a sequential
  // recursion S_t = max(0, S_{t-1} + (x_t − μ)) — driver-shaped, useless
  // on a cluster — but it has a closed form over prefix sums:
  //     S⁺_t = P_t − min_{0≤j≤t} P_j,   S⁻_t = max_{0≤j≤t} P_j − P_t,
  // with P_t = Σ_{i≤t}(x_i − μ) and P_0 = 0 (the recursion's S_0 = 0,
  // hence the least/greatest-with-zero clamps): a running sum/min/max and a
  // subtraction — all window primitives. μ = Sx/n is rational, so
  // everything rides EXACT INTEGERS via cross-multiplication (the
  // ts_anomaly_days discipline): P'_t = n·cum_t − t·Sx = n·P_t, and the
  // 5σ alarm S > 5σ ⟺ S'² > 25·(n·Sxx − Sx²) compares DECIMAL(38,0)
  // products — zero float accumulation or thresholds anywhere.
  //
  // Scale shape: the daily hash-agg collapses the event feed first, so
  // the per-type windows run over DAY-GRAIN rows — partition size =
  // observed days per type, bounded by the CALENDAR at any corpus size
  // (the ts_census argument, keyed); per-type stats join back as a
  // broadcast (|types| rows).
  // ---------------------------------------------------------------------
  def changepoint(s: SparkSession, dir: String): DataFrame =
    cusumOver(Tables.load(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")))

  /** The CUSUM core over any (event_type, day, x) day-grain count table —
    * shared with the streaming maintenance twin, whose maintained support
    * table is exactly this input.
    */
  private[graft] def cusumOver(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wIdx = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    val pre = daily.join(broadcast(stats), "event_type")
      .withColumn("p",
        col("n") * sum(col("x")).over(wRun) -
          row_number().over(wIdx).cast("long") * col("sx"))
    // the prefix extrema must include the EMPTY prefix P'_0 = 0 (the
    // recursion starts at S_0 = 0), hence the least/greatest clamps
    val scored = pre
      .withColumn("s_up",
        col("p") - least(lit(0L), min(col("p")).over(wRun)))
      .withColumn("s_dn",
        greatest(lit(0L), max(col("p")).over(wRun)) - col("p"))
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(19, 0))
    // 25·(n·Sxx − Sx²) spelled (25n)·Sxx − (5Sx)² so every product is
    // DECIMAL(19)×DECIMAL(19) → DECIMAL(38,0), in range in both engines
    val thresh = dec(col("n") * 25) * dec(col("sxx")) -
      dec(col("sx") * 5) * dec(col("sx") * 5)
    scored.select(col("event_type"), col("day"),
      col("x").cast("long").as("n_events"),
      col("s_up").cast("long").as("s_up_n"),
      col("s_dn").cast("long").as("s_dn_n"),
      (col("s_up") > 0 && dec(col("s_up")) * dec(col("s_up")) > thresh)
        .as("shift_up"),
      (col("s_dn") > 0 && dec(col("s_dn")) * dec(col("s_dn")) > thresh)
        .as("shift_dn"))
  }

  // private[graft]: the streaming maintenance twin shares this oracle
  // (its fixpoint IS the batch changepoint)
  private[graft] lazy val changepointSql =
    """WITH dly AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
      |  FROM dly GROUP BY 1),
      |pre AS (
      |  SELECT d.event_type, d.day, d.x, s.n, s.sx, s.sxx,
      |    s.n * SUM(d.x) OVER w - ROW_NUMBER() OVER wo * s.sx AS p
      |  FROM dly d JOIN st s USING (event_type)
      |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day ASC
      |    ROWS UNBOUNDED PRECEDING),
      |  wo AS (PARTITION BY d.event_type ORDER BY d.day ASC)),
      |cs AS (
      |  SELECT event_type, day, x, n, sx, sxx, p,
      |    p - LEAST(0, MIN(p) OVER w) AS s_up,
      |    GREATEST(0, MAX(p) OVER w) - p AS s_dn
      |  FROM pre
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
      |    ROWS UNBOUNDED PRECEDING))
      |SELECT event_type, day, CAST(x AS BIGINT) AS n_events,
      |  CAST(s_up AS BIGINT) AS s_up_n, CAST(s_dn AS BIGINT) AS s_dn_n,
      |  (s_up > 0 AND CAST(s_up AS DECIMAL(19,0)) * CAST(s_up AS DECIMAL(19,0))
      |    > CAST(n * 25 AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
      |      - CAST(sx * 5 AS DECIMAL(19,0)) * CAST(sx * 5 AS DECIMAL(19,0)))
      |    AS shift_up,
      |  (s_dn > 0 AND CAST(s_dn AS DECIMAL(19,0)) * CAST(s_dn AS DECIMAL(19,0))
      |    > CAST(n * 25 AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
      |      - CAST(sx * 5 AS DECIMAL(19,0)) * CAST(sx * 5 AS DECIMAL(19,0)))
      |    AS shift_dn
      |FROM cs""".stripMargin

  // ---------------------------------------------------------------------
  // Forecast-baseline backtest: the MAE of the two baselines every
  // forecasting effort must beat before it earns compute — naive-1
  // (tomorrow = today) and seasonal-naive (tomorrow = same weekday last
  // week) — scored per event type over the feed's own history. The
  // published-forecasting discipline (M-competitions): a model that
  // can't beat seasonal-naive on MAE is worse than free.
  //
  // Scale shape: forecasts are CALENDAR-ALIGNED self-joins of the
  // day-grain table (day = day−1 / day−7 as equi keys — no window, no
  // lag over observed rows, which would silently skip gap days); the
  // day-grain frames are calendar-bounded, so both joins are
  // broadcast-sized at any corpus volume. MAE in exact integer
  // milli-units (DIV), scored only where the lagged day exists.
  // ---------------------------------------------------------------------
  def forecastBaseline(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    def scored(lagDays: Int, n: String, mae: String) =
      daily.join(
        daily.select(col("event_type"),
          date_add(col("day"), lagDays).as("day"), col("x").as("f")),
        Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as(n),
          expr("(SUM(ABS(x - f)) * 1000) DIV COUNT(*)").as(mae))
    scored(1, "n_scored_1", "mae1_milli")
      .join(scored(7, "n_scored_7", "mae7_milli"), Seq("event_type"))
      .withColumn("seasonal_wins", col("mae7_milli") < col("mae1_milli"))
  }

  private lazy val forecastBaselineSql =
    """WITH dly AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
      |  FROM events GROUP BY 1, 2),
      |s1 AS (
      |  SELECT d.event_type, COUNT(*) AS n_scored_1,
      |    (SUM(ABS(d.x - f.x)) * 1000) // COUNT(*) AS mae1_milli
      |  FROM dly d JOIN dly f
      |    ON f.event_type = d.event_type AND d.day = f.day + INTERVAL 1 DAY
      |  GROUP BY d.event_type),
      |s7 AS (
      |  SELECT d.event_type, COUNT(*) AS n_scored_7,
      |    (SUM(ABS(d.x - f.x)) * 1000) // COUNT(*) AS mae7_milli
      |  FROM dly d JOIN dly f
      |    ON f.event_type = d.event_type AND d.day = f.day + INTERVAL 7 DAY
      |  GROUP BY d.event_type)
      |SELECT event_type, n_scored_1, CAST(mae1_milli AS BIGINT) AS mae1_milli,
      |  n_scored_7, CAST(mae7_milli AS BIGINT) AS mae7_milli,
      |  CAST(mae7_milli AS BIGINT) < CAST(mae1_milli AS BIGINT)
      |    AS seasonal_wins
      |FROM s1 JOIN s7 USING (event_type)""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("ts_forecast_baseline", forecastBaseline, Some(forecastBaselineSql),
      "naive-1 vs seasonal-naive MAE backtest per event type: calendar-aligned day-grain self-joins, integer milli-MAE"),
    Op("ts_changepoint", changepoint, Some(changepointSql),
      "CUSUM level-shift detection per event type via the prefix-min closed form: exact-integer cross-multiplied 5-sigma alarms over day-grain windows"),
    Op("ts_downsample", ohlcDownsample, Some(ohlcDownsampleSql),
      "OHLC hour bars per event type: one combinable hash-agg, struct-ordered open/close, quantized volume"),
    Op("ts_census", censusSweep, Some(censusSweepSql),
      "daily concurrent-stay census via sweep-line deltas + date-domain prefix sum, no interval explode"),
    Op("ts_gap_fill", gapFill, Some(gapFillSql),
      "daily resample + forward-fill per user: calendar explode, running last(ignoreNulls)"),
    Op("ts_rolling_features", rollingFeatures, Some(rollingFeaturesSql),
      "trailing-7-day event-time RANGE frame per user: incremental sliding count/sum/avg"),
    Op("ts_anomaly_mad", anomalyMad, Some(anomalyMadSql),
      "robust anomaly flags: day-grain median/MAD (50% breakdown point) via exact interpolated percentiles scaled to integers - the monitor that survives the outliers it hunts"),
    Op("ts_anomaly_days", anomalyDays, Some(anomalyDaysSql),
      "volume-spike flags: 3-sigma vs trailing self-baseline in exact integer cross-multiplied form"),
    Op("ts_event_gaps", eventGaps, Some(eventGapsSql),
      "inter-event gap quantiles per event type (lag over a total order, exact percentiles)"),
    Op("ts_seasonal_index", seasonalIndex, Some(seasonalIndexSql),
      "day-of-week seasonal index per event type: dow mean over overall mean, exact decimal sums cross-multiplied"))

  // ---------------------------------------------------------------------
  // Day-of-week seasonality: per event type, each weekday's mean value
  // relative to the type's overall mean — the classical multiplicative
  // seasonal index (index > 1: that weekday runs hot), the profile that
  // seasonally adjusts anomaly baselines and capacity plans. Two
  // map-side-combinable aggs (types×7 and types rows) + one broadcast-
  // sized join; the event stream is scanned once and never shuffled at
  // row grain. Determinism: value sums accumulate in DECIMAL(18,2)
  // (exact, order-independent); the index is computed by ONE double
  // division of exactly-representable cross-products, then 1e-4
  // quantized — identical IEEE result in both engines.
  // ---------------------------------------------------------------------
  def seasonalIndex(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"), dayofweek(col("ts")).as("dow"),
        col("value").cast(DecimalType(18, 2)).as("v"))
    val byDow = ev.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_d"), sum(col("v")).as("s_d"))
    val overall = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_t"), sum(col("v")).as("s_t"))
    byDow.join(overall, Seq("event_type"))
      .select(col("event_type"), col("dow").cast("int").as("dow"),
        col("n_d").cast("long").as("n_events"),
        floor((col("s_d").cast("double") * col("n_t")) /
          (col("n_d") * col("s_t").cast("double")) * 1e4 + 0.5)
          .cast("long").as("index_q"))
  }

  // lazy: `val ops` above forces this during object init, before a plain
  // val declared here would have initialized (the Curate.scala trap)
  private lazy val seasonalIndexSql =
    """WITH e AS (
      |  SELECT event_type, dayofweek(ts) + 1 AS dow,
      |         CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events),
      |d AS (SELECT event_type, dow, COUNT(*) AS n_d, SUM(v) AS s_d
      |      FROM e GROUP BY 1, 2),
      |t AS (SELECT event_type, COUNT(*) AS n_t, SUM(v) AS s_t
      |      FROM e GROUP BY 1)
      |SELECT d.event_type, CAST(d.dow AS INT) AS dow,
      |  CAST(d.n_d AS BIGINT) AS n_events,
      |  CAST(FLOOR((CAST(d.s_d AS DOUBLE) * t.n_t) /
      |    (d.n_d * CAST(t.s_t AS DOUBLE)) * 10000 + 0.5) AS BIGINT)
      |    AS index_q
      |FROM d JOIN t ON t.event_type = d.event_type""".stripMargin

  // ---------------------------------------------------------------------
  // Inter-event gap distribution: per event type, the median and p95 of
  // the time between a user's consecutive events of that type — the
  // cadence profile behind session-gap and watermark-delay tuning (the
  // 30-minute sessionization gap and the streaming watermark should come
  // FROM this table, not from folklore). Gaps are integer microseconds
  // (unix_micros diff over a (user, type) window with an event_id
  // tie-break, so duplicate timestamps still order totally); quantiles
  // are Spark's EXACT sort-based percentile = DuckDB's quantile_cont,
  // rounded 4dp — the text_length_quantiles discipline. One
  // (user_id, event_type) shuffle, then an event_type hash-agg.
  // ---------------------------------------------------------------------
  def eventGaps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").asc, col("event_id").asc)
    val gap = col("us") - lag(col("us"), 1).over(w)
    ev.withColumn("gap", gap)
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap, 0.5)"), 4).as("p50_gap_us"),
        round(expr("percentile(gap, 0.95)"), 4).as("p95_gap_us"))
  }

  // lazy: declared after the ops list that references it
  private lazy val eventGapsSql =
    """SELECT event_type, COUNT(*) AS n_gaps,
      |  round(quantile_cont(gap, 0.5), 4) AS p50_gap_us,
      |  round(quantile_cont(gap, 0.95), 4) AS p95_gap_us
      |FROM (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS gap
      |  FROM events) g
      |WHERE gap IS NOT NULL
      |GROUP BY event_type""".stripMargin
}
