package graft.streaming

import graft.Tables
import graft.ops.{Op, OpGroup}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming operators (SURVEY.md §2.11 notes the reference has none —
  * streaming is the "real-time clinical decision support" future work,
  * README.md:151 — so this module IS that extension, built
  * Structured-Streaming-first).
  *
  * Two execution paths share one session-assignment semantic (30-minute
  * inactivity gap per user):
  *  - [[sessionizeBatch]]: typed Dataset groupByKey + sorted flatMapGroups;
  *    deterministic, oracle-checked against a DuckDB lag/cumsum window.
  *  - [[sessionizeStream]]: flatMapGroupsWithState with event-time state,
  *    exercised by the ScalaTest memory-sink harness.
  *  - [[sessionizeStreamTws]]: the same contract on Spark 4's
  *    `transformWithState` (typed state variables + timers + TTL),
  *    exercised as a real RocksDB-backed streaming query in the suite.
  * [[hourlyWindowed]] runs a watermark + tumbling-window aggregation as a
  * real streaming query over the parquet source (memory sink, complete
  * mode) — registered as a query so the driver verifies streaming output
  * against a batch SQL oracle.
  *
  * Scale notes: sessionization shuffles once on user_id; state size is
  * O(active users). The windowed agg is a streaming hash-agg with
  * watermark-bounded state.
  */
object Sessionize extends OpGroup {

  val gapMinutes = 30L
  private val gapMicros = gapMinutes * 60L * 1000000L

  case class Ev(user_id: Long, event_id: Long, tsMicros: Long)
  case class Session(user_id: Long, session_idx: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)

  private def toSessions(userId: Long, evs: Iterator[Ev],
      startIdx: Long): Seq[Session] = {
    val sorted = evs.toIndexedSeq.sortBy(e => (e.tsMicros, e.event_id))
    if (sorted.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var idx = startIdx
    var start = sorted.head.tsMicros
    var last = start
    var n = 0L
    def emit(): Unit = {
      out += Session(userId, idx, n, microsToTs(start), microsToTs(last))
      idx += 1
    }
    sorted.foreach { e =>
      if (e.tsMicros - last > gapMicros) { emit(); start = e.tsMicros; n = 0 }
      n += 1
      last = e.tsMicros
    }
    emit()
    out.toSeq
  }

  /** Microsecond-precision Timestamp (a bare `new Timestamp(ms)` would
    * truncate to millis and drift from the oracle's MIN/MAX(ts)).
    */
  private def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def eventsTyped(s: SparkSession, dir: String): Dataset[Ev] = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[Ev]
  }

  /** Batch sessionization — deterministic (events sorted by ts, event_id
    * within each user group before the gap scan).
    */
  def sessionizeBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    eventsTyped(s, dir)
      .groupByKey(_.user_id)
      .flatMapGroups((uid, evs) => toSessions(uid, evs, 0L).iterator)
      .toDF()
  }

  private val sessionizeBatchSql =
    s"""WITH x AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
       |           ORDER BY ts ASC, event_id ASC) > INTERVAL $gapMinutes MINUTE
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events),
       |y AS (
       |  SELECT user_id, ts,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                   ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM x)
       |SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
       |       COUNT(*) AS n_events,
       |       MIN(ts) AS session_start, MAX(ts) AS session_end
       |FROM y GROUP BY user_id, sess""".stripMargin

  /** Streaming sessionization: event-time state per user, sessions emitted
    * on timeout/ batch close. Used by the streaming test harness.
    */
  def sessionizeStream(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, List[Ev]), Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, batch: Iterator[Ev], state: GroupState[(Long, List[Ev])]) =>
          val (doneSessions, pending) =
            state.getOption.getOrElse((0L, Nil))
          val all = pending ++ batch.toList
          // emit all closed sessions, keep the open tail as state
          val sessions = toSessions(uid, all.iterator, doneSessions)
          if (sessions.isEmpty) Iterator.empty
          else {
            val closed = sessions.init
            val open = sessions.last
            val keep = all.sortBy(e => (e.tsMicros, e.event_id))
              .takeRight(open.n_events.toInt)
            state.update((doneSessions + closed.size, keep))
            closed.iterator
          }
      }
  }

  /** Sessionization via Spark 4's `transformWithState` — the third
    * generation of the arbitrary-state API (typed state VARIABLES +
    * event-time timers + per-state TTL), as the modern twin of
    * [[sessionizeStream]]'s flatMapGroupsWithState. Same emit contract:
    * closed sessions emit as recognized, the open tail stays in state —
    * here as a typed ListState (buffered open-tail events) plus a
    * ValueState counter (sessions already emitted, so session_idx keeps
    * numbering across batches). What the new API buys at 100 TB: state
    * variables are independent store columns (no monolithic case-class
    * blob deserialized+rewritten per update — the counter updates
    * without touching the event buffer), each with its own TTL, and
    * event-time TIMERS close and emit a key's final session without
    * more of its input — inexpressible under GroupStateTimeout's single
    * timeout, and implemented in [[SessionProcessorWithTimers]].
    * Exercised by the same streaming-vs-batch equality harness as its
    * flatMapGroupsWithState sibling.
    */
  class SessionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Ev, Session] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var open: ListState[Ev] = _
    @transient private var done: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getListState[Ev]("open",
        Encoders.product[Ev], TTLConfig.NONE)
      done = getHandle.getValueState[Long]("done",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(uid: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Session] = {
      val doneN = if (done.exists()) done.get() else 0L
      val all = open.get().toList ++ rows.toList
      val sessions = toSessions(uid, all.iterator, doneN)
      if (sessions.isEmpty) Iterator.empty
      else {
        val closed = sessions.init
        val tail = sessions.last
        val keep = all.sortBy(e => (e.tsMicros, e.event_id))
          .takeRight(tail.n_events.toInt)
        open.put(keep.toArray)
        done.update(doneN + closed.size)
        closed.iterator
      }
    }
  }

  def sessionizeStreamTws(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** [[Ev]] plus the typed event-time column the watermark rides on. */
  case class EvT(user_id: Long, event_id: Long, tsMicros: Long,
      ts: java.sql.Timestamp)

  /** The timer-closing variant: EVENT-TIME TIMERS emit a key's final
    * session once the watermark passes last-event + gap — no further
    * input from that key needed. This is the capability the older state
    * APIs could only approximate (GroupStateTimeout gives one timeout,
    * already spent here on nothing): without it, the LAST session of
    * every idle user stays in state forever and never reaches the sink.
    * One outstanding timer per key (re-registered per batch at the
    * open-tail close time); expiry emits the buffered tail and clears
    * it — state is O(active sessions), eviction driven by event time.
    */
  class SessionProcessorWithTimers
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EvT, Session] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TTLConfig, TimeMode, TimerValues, ValueState}
    @transient private var open: ListState[Ev] = _
    @transient private var done: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getListState[Ev]("open",
        Encoders.product[Ev], TTLConfig.NONE)
      done = getHandle.getValueState[Long]("done",
        Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(uid: Long, rows: Iterator[EvT],
        timers: TimerValues): Iterator[Session] = {
      val doneN = if (done.exists()) done.get() else 0L
      val all = open.get().toList ++
        rows.map(e => Ev(e.user_id, e.event_id, e.tsMicros)).toList
      val sessions = toSessions(uid, all.iterator, doneN)
      if (sessions.isEmpty) Iterator.empty
      else {
        val closed = sessions.init
        val tail = sessions.last
        val keep = all.sortBy(e => (e.tsMicros, e.event_id))
          .takeRight(tail.n_events.toInt)
        open.put(keep.toArray)
        done.update(doneN + closed.size)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        // ceiling ms division: truncating micros would land the timer up
        // to ~1 ms BEFORE last+gap, eating the +1 safety margin
        getHandle.registerTimer(
          (keep.map(_.tsMicros).max + 999L) / 1000L +
            gapMinutes * 60L * 1000L + 1L)
        closed.iterator
      }
    }
    override def handleExpiredTimer(uid: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      val doneN = if (done.exists()) done.get() else 0L
      val out = toSessions(uid, open.get(), doneN)
      open.clear()
      done.update(doneN + out.size)
      out.iterator
    }
  }

  def sessionizeStreamTwsTimers(events: Dataset[EvT]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", "0 seconds").as[EvT]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorWithTimers,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Watermarked tumbling 1-hour window aggregation over the streaming
    * parquet source. Decimal-cast sum keeps the value order-independent
    * for the oracle. Shared by both sink variants below.
    */
  /** The windowed aggregation over ANY events frame (streaming or batch)
    * carrying a typed `ts`, `event_type`, `value`.
    */
  private[graft] def hourlyAggOver(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value").cast("double").as("sum_value"))

  /** The events table as a streaming source with a typed `ts`. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    // RAW file schema (ts may be the nanos long) — Tables.load's converted
    // schema would mis-declare the column to the file source.
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // The file source wants a directory (or glob) — an exact file path is
    // rejected; a wildcard makes it resolve as a glob over the SF dir.
    val raw = s.readStream.schema(schema).format("parquet")
      .option("basePath", dir).load(s"$dir/events.parque*")
    schema("ts").dataType match {
      // legacy TIMESTAMP(NANOS)-as-long generation of the testdata
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // timestamp[us] NTZ generation: cast to session-zoned TIMESTAMP
      // (session zone pinned UTC ⇒ same instant) so withWatermark accepts it
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  private def hourlyAgg(s: SparkSession, dir: String): DataFrame =
    hourlyAggOver(eventsStream(s, dir))

  /** Streaming deduplication with WATERMARK-BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps a key's state only until the
    * watermark passes its event time + the delay, so state is O(keys in
    * the horizon), not O(all keys ever) — the difference between a
    * streaming dedup that survives 100 TB/day and one whose state grows
    * forever (plain `dropDuplicates` on a stream is the latter). A key
    * recurring AFTER its state was evicted re-emits — that is the
    * documented trade of the bounded variant, so the verification run
    * pins the delay beyond the corpus' time span, making the output
    * exactly DISTINCT(user_id, event_type); a deployment sets the real
    * dedup horizon. Output = the key columns only, so first-arrival
    * nondeterminism cannot leak into the result.
    */
  def streamingDedup(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noNoDataBatches) {
      val out = eventsStream(s, dir)
        .select(col("ts"), col("user_id"), col("event_type"))
        .withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      val name = s"memsink_dedup_${System.identityHashCode(out).toHexString}"
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
    }

  private val streamingDedupSql =
    "SELECT DISTINCT user_id, event_type FROM events"

  /** Stream-stream INTERVAL join: each purchase joins the same user's
    * signups within the preceding 7 days. Both sides carry watermarks and
    * the join condition carries the event-time range — that pair is what
    * lets Spark evict join state (a signup older than watermark − 7 days
    * can never match a future purchase, so its state row is dropped).
    * Without the time bound, stream-stream join state grows with every
    * row ever seen; with it, state is O(rows inside the horizon) — the
    * only shape that survives an unbounded stream. Inner join, so rows
    * emit as soon as both sides arrive (append mode, no watermark wait).
    */
  def streamingJoin(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noNoDataBatches) {
      // ONE source, self-joined: both sides share the micro-batch scan
      // (two readStream instances would list and read the files twice
      // per trigger)
      val ev = eventsStream(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val signups = ev
        .filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
          col("ts").as("s_ts"))
        .withWatermark("s_ts", "1 hour")
      val joined = purchases.join(signups,
        col("user_id") === col("s_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAY"))
        .select(col("p_id"), col("user_id"), col("p_ts"),
          col("s_id"), col("s_ts"))
      runToParquet(s, joined,
        graft.sources.Warehouse.layerPath(dir, "join_stream"))
    }

  private val streamingJoinSql =
    """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
      |       s.event_id AS s_id, s.ts AS s_ts
      |FROM events p JOIN events s
      |  ON p.user_id = s.user_id
      | AND p.event_type = 'purchase' AND s.event_type = 'signup'
      | AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY""".stripMargin

  /** Stream-STATIC enrichment join: the event stream decorated with a
    * batch dimension (customer attributes keyed by user_id) — the
    * streaming twin of J1's conformed-key dim join and the most common
    * streaming topology there is (enrich-then-route). Stateless: a
    * stream-static join keeps NO join state across triggers (the static
    * side is re-planned per micro-batch, so updates to the dim are picked
    * up on the next trigger), needs no watermark, and emits in append
    * mode as rows arrive. The dim side is broadcast — per-trigger cost is
    * one map stage over the batch, no shuffle of the stream; a dim too
    * big to broadcast flips to a shuffled join per micro-batch, which is
    * the cue to pre-key the stream's partitioning to the dim's bucketing
    * (the s_bucketed_join layout) instead. LEFT join so unmatched events
    * survive with NULL attributes (orphan events are QA's job, not the
    * enricher's).
    */
  def streamingEnrich(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s) {
      val dim = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_name"),
          col("c_mktsegment"))
      val out = eventsStream(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .join(broadcast(dim), Seq("user_id"), "left")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("c_name"), col("c_mktsegment"))
      runToParquet(s, out,
        graft.sources.Warehouse.layerPath(dir, "enrich_stream"))
    }

  private val streamingEnrichSql =
    """SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment
      |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id""".stripMargin

  /** Sessionization via Spark's NATIVE `session_window` aggregation — the
    * declarative twin of [[sessionizeStream]]'s hand-rolled
    * flatMapGroupsWithState. Catalyst plans session merging itself
    * (UpdatingSessionsExec + merging state store), so prefer this form
    * whenever the per-session result is an aggregation; the custom-state
    * path earns its keep only for non-aggregable session payloads (e.g.
    * the ordered event list). Same 30-minute gap; `window.end` is
    * last-event + gap by definition, mirrored in the oracle as
    * MAX(ts) + gap over the lag/cumsum session assignment. Complete mode
    * memory sink for the harness (the bounded-state deployment form is
    * append + watermark, exactly as hourlyWindowedAppend demonstrates for
    * tumbling windows).
    */
  def sessionWindowed(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noNoDataBatches) {
      val out = eventsStream(s, dir)
        .groupBy(session_window(col("ts"), s"$gapMinutes minutes"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
      val name = s"memsink_sw_${System.identityHashCode(out).toHexString}"
      val q = out.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
    }

  private val sessionWindowedSql =
    s"""WITH x AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
       |           ORDER BY ts ASC, event_id ASC) > INTERVAL $gapMinutes MINUTE
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events),
       |y AS (
       |  SELECT user_id, ts,
       |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                   ROWS UNBOUNDED PRECEDING) AS sess
       |  FROM x)
       |SELECT user_id, MIN(ts) AS session_start,
       |       MAX(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
       |       COUNT(*) AS n_events
       |FROM y GROUP BY user_id, sess""".stripMargin

  /** State-store partition count for the stateful streaming queries.
    *
    * A stateful operator pays a fixed per-partition-per-micro-batch cost
    * (store open, delta-file commit, snapshot maintenance — ×4 stores per
    * partition for a stream-stream join), so the partition count must track
    * STATE VOLUME, not core count: measured at sf0.1 on 32 cores, the
    * interval join runs 9.2 s of wall with 32 state partitions vs 2.9 s
    * with 8, identical output; re-measured r8, its warm TASK seconds are
    * 7.3 at 8 partitions, 3.5 at 4, 1.9 at 2 with wall flat (~2.2 s) —
    * per-partition store machinery, linear in the partition count, for
    * ~40k state rows. A deployment sizes this to its watermark-horizon
    * state (more partitions only once per-partition state outgrows
    * memory); 4 matches this corpus' small horizon without degenerating
    * to sequential state maintenance.
    */
  val statePartitions: Int =
    sys.env.getOrElse("SPARK_GRAFT_STATE_PARTITIONS", "4").toInt

  /** Fixed-location per-run state dir, wiped before use: the previous
    * `ckpt_${System.nanoTime()}` scheme leaked a new checkpoint directory
    * per invocation AND discarded the offset/commit logs that make a
    * replayed batch detectable. A fixed path keeps disk usage O(1) across
    * invocations; wiping it first means each invocation deliberately
    * reprocesses the whole feed (these are fixpoint-verification runs —
    * a deployment keeps the checkpoint and resumes instead).
    */
  /** Generation ledger for the merge-shaped IVM maintains (topk, cusum,
    * manifest): batch id → the support-table path that batch PRODUCED.
    * foreachBatch is at-least-once, so a replayed batch must merge
    * against its PREDECESSOR generation (largest id' < id), never
    * against its own previous output — deriving the merge input from
    * the ledger makes the overwrite of gen_$id idempotent and removes
    * the self-read-while-overwriting a replay would otherwise attempt
    * (the streamingIvfMaintain idempotency discipline applied to the
    * merge shape; a `var cur` pointer merges a replayed batch TWICE).
    */
  private[graft] final class GenLedger {
    private var gens = scala.collection.immutable.TreeMap.empty[Long, String]
    def predecessor(id: Long): Option[String] =
      gens.rangeUntil(id).lastOption.map(_._2)
    def record(id: Long, path: String): Unit = gens += id -> path
    def latest: String = gens.last._2
    def latestOption: Option[String] = gens.lastOption.map(_._2)
  }

  /** Feed-snapshot currency check for the `$root/feed` idiom: the feed
    * is a one-time snapshot of a source table, but the harness
    * REGENERATES the testdata tables between rounds while the feed
    * lives under the warehouse layer dir and survives — a write-once
    * guard would silently replay a stale feed forever after. Current =
    * a marker file inside the feed dir records the source parquet's
    * (mtime, length) AT snapshot time and still equals the live pair;
    * any inequality rebuilds. (The previous live-mtime '>' compare
    * passed a source regenerated within filesystem mtime granularity
    * of the feed write — the exact stale-replay class this guards.)
    */
  private def feedCurrent(dir: String, table: String,
      feedDir: String): Boolean = {
    val marker = new java.io.File(feedDir, feedMarkerName)
    if (!marker.exists()) return false
    val src = new java.io.File(s"$dir/$table.parquet")
    // Source gone: the stamped identity can no longer be validated, so
    // read as STALE — a rebuild fails loudly on the missing table,
    // rather than silently replaying the previous generation's feed
    // (e.g. a round starting mid-regeneration).
    if (!src.exists()) return false
    // An unreadable/corrupt marker (torn write, permission change) is
    // STALE — the guard's safe direction is rebuild, not a throw out of
    // the streaming op.
    try {
      val stamped = new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim
      stamped == feedStamp(src)
    } catch { case _: java.io.IOException => false }
  }

  private val feedMarkerName = "_graft_src_stamp"

  private def feedStamp(src: java.io.File): String =
    s"${src.lastModified()}:${src.length()}"

  /** Write-if-stale wrapper for the feed idiom: runs `write` (which
    * overwrites `feedDir`), then stamps the source's identity into the
    * marker — snapshot and stamp always travel together, so a feed dir
    * without a marker (crash between write and stamp, pre-marker
    * layout) reads as stale and rebuilds. The stamp is captured BEFORE
    * the write: if the source is regenerated mid-snapshot, the marker
    * records the pre-write identity, which no longer matches the live
    * source, so the next currency check rebuilds — stamping after the
    * write would brand a mixed-generation feed with the NEW identity
    * and read it as current forever.
    */
  private def ensureFeed(dir: String, table: String, feedDir: String)(
      write: => Unit): Unit =
    if (!feedCurrent(dir, table, feedDir)) {
      val src = new java.io.File(s"$dir/$table.parquet")
      val stampBefore = if (src.exists()) Some(feedStamp(src)) else None
      write
      stampBefore.foreach { st =>
        java.nio.file.Files.write(
          new java.io.File(feedDir, feedMarkerName).toPath,
          st.getBytes("UTF-8"))
        ()
      }
    }

  private def freshDir(path: String): String = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val f = new java.io.File(path)
    if (f.exists()) rm(f)
    path
  }

  /** Run `body` with the streaming-scoped session confs set — nanos-as-long
    * for the raw parquet source and the state-store partition count —
    * restoring previous values after; neither must leak into batch queries.
    */
  private def withNanosAsLong[T](s: SparkSession,
      extra: (String, String)*)(body: => T): T = {
    val keys = Seq("spark.sql.legacy.parquet.nanosAsLong" -> "true",
      "spark.sql.shuffle.partitions" -> statePartitions.toString) ++ extra
    val prev = keys.map { case (k, _) => k -> s.conf.getOption(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Distributed file sink for the append-mode harness queries with
    * non-trivial output volume: the memory sink collects every output row
    * to the driver (measured: streamingEnrich's addBatch was 0.7 s of its
    * 1.0 s wall — the sink collect, not the broadcast join), while the
    * parquet sink writes distributed with exactly-once commit — the shape
    * a deployment ships. Output is read back with the plan's own schema
    * (zero emitted rows ⇒ no files ⇒ inference would throw).
    */
  private def runToParquet(s: SparkSession, df: DataFrame,
      root: String): DataFrame = {
    val run = freshDir(root)
    val q = df.writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$run/data")
      .option("checkpointLocation", s"$run/ckpt")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.read.schema(df.schema).parquet(s"$run/data")
  }

  /** No-data micro-batches exist to advance the watermark with no new
    * input — they EMIT results for append-mode windowed aggs (a window
    * finalizes only when the watermark passes it) but are pure state-
    * eviction overhead for inner joins, within-watermark dedup, and
    * complete-mode aggs, whose OUTPUT is identical either way (measured:
    * the stream_join no-data batch was 0.86 s of its 2.9 s wall). So the
    * finite-run harness queries in those classes disable them; the
    * append-mode window path ([[hourlyWindowedAppend]]) MUST keep them —
    * that's what flushes its finalized windows. An always-on deployment
    * keeps them everywhere (eviction must happen even when a source goes
    * quiet; there they're rare, not once-per-run).
    */
  private val noNoDataBatches =
    "spark.sql.streaming.noDataMicroBatches.enabled" -> "false"

  /** AQE off for the foreachBatch IVM bodies: their joins carry explicit
    * delta-broadcast hints, so adaptive re-optimization only adds driver
    * planning rounds to each of the many tiny per-trigger jobs.
    */
  private val noAqe = "spark.sql.adaptive.enabled" -> "false"

  /** ORACLE-HARNESS variant: memory sink in complete mode, so the driver
    * can hash-compare the full window set against a batch SQL oracle.
    * Complete mode holds every window on the driver — fine for a
    * verification harness, NOT the shipped pattern; deployments use
    * [[hourlyWindowedAppend]].
    */
  def hourlyWindowed(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noNoDataBatches) {
      val agg = hourlyAgg(s, dir)
      // NB: prefix must not collide with Warehouse.catalogTables' graft_ views
      val name = s"memsink_hourly_${System.identityHashCode(agg).toHexString}"
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
    }

  /** SCALE variant: append mode + parquet file sink. A window row is
    * emitted exactly once, after the watermark passes its window end, and
    * its state is then evicted — state is watermark-bounded (O(open
    * windows), not O(all windows)) and nothing ever aggregates on the
    * driver; output lands distributed, exactly-once via the sink's commit
    * log. The trailing windows still inside the watermark horizon remain
    * unemitted by design (they'd emit on the next arriving batch).
    * Returns the emitted windows read back from the sink.
    */
  def hourlyWindowedAppend(s: SparkSession, dir: String,
      outDir: String): DataFrame = withNanosAsLong(s) {
    val agg = hourlyAgg(s, dir)
    val q = agg.writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // Explicit schema: with zero finalized windows (all data inside the
    // watermark horizon) the sink directory has no parquet files and
    // schema inference would throw instead of returning an empty frame.
    s.read.schema(agg.schema).parquet(s"$outDir/data")
  }

  /** Incremental form of [[hourlyWindowedAppend]]: start the append-mode
    * file-sink query over `srcDir` (parquet files with typed
    * ts/event_type/value columns) and return the RUNNING query. The
    * caller drops files into `srcDir` between `processAllAvailable()`
    * calls — this is how a deployment actually runs (micro-batches over
    * an arriving file feed) and how the multi-batch watermark test
    * observes per-batch emission.
    */
  def hourlyAppendQuery(s: SparkSession, srcDir: String, outDir: String,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.streaming.StreamingQuery =
    hourlyAggOver(s.readStream.schema(schema).format("parquet").load(srcDir))
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .start()

  private val hourlyWindowedSql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Incremental CDC apply: the change feed arrives as MICRO-BATCHES and
    * each one merges into a persisted snapshot via foreachBatch — the
    * streaming form of [[graft.ops.CdcMerge]]'s batch MERGE, and the way
    * a 100 TB warehouse actually ingests updates (re-running the batch
    * merge over the full feed every trigger would be quadratic).
    *
    * Two mechanisms make the incremental fixpoint equal the batch result
    * under ANY batch arrival order:
    *  - VERSION GUARD: the snapshot stores the applied (ts, event_id) per
    *    key; a change only wins if its version is strictly newer, so a
    *    stale change arriving in a later micro-batch is a no-op.
    *  - TOMBSTONES: a delete flags the row (retaining its columns)
    *    instead of dropping it; a physically-dropped row would make a
    *    late stale update look like an insert. Deleted rows filter out at
    *    read time; a deployment vacuums tombstones past the feed horizon.
    *
    * Each micro-batch costs one key-shuffled merge over snapshot+batch
    * (snapshot bucketed on the key at scale ⇒ one exchange); the batch
    * fan-in is bounded by maxFilesPerTrigger. The fixpoint is verified
    * against the SAME DuckDB oracle as the batch merge (m7_cdc_upsert).
    */
  def streamingCdcApply(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noAqe) {
      import graft.sources.Warehouse.layerPath
      val root = layerPath(dir, "cdc_stream")
      val feedDir = s"$root/feed"
      ensureFeed(dir, "events", feedDir) {
        // pre-split the feed into 4 ts-range files, consumed 2 per
        // trigger => 2 micro-batches: trigger 2 exercises the
        // merge-with-existing-state path, which is the incremental
        // property under test; more triggers only re-pay the ~0.45 s
        // per-trigger fixed cost (metadata logs + foreachBatch jobs)
        // without exercising anything new
        Tables.load(s, dir, "events")
          .filter(col("event_type").isin("signup", "purchase", "error"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .repartitionByRange(4, col("ts"))
          .write.mode("overwrite").parquet(feedDir)
      }
      // wipe snapshots of previous runs: batch ids restart at 0 per run,
      // so a prior run with more triggers would leave orphan snap_N dirs
      // (disk leak + a miscount in the per-batch snapshot audit)
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("snap_") && f.getName != "snap_seed")
        .foreach(f => freshDir(f.getPath))
      val snap0 = s"$root/snap_seed"
      Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < 75)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit(Long.MinValue).as("_vts"), lit(Long.MinValue).as("_vid"),
          lit(false).as("_del"))
        .write.mode("overwrite").parquet(snap0)
      // ledger, not a `var cur` pointer: a replayed batch must merge
      // against its PREDECESSOR snapshot, not read-while-overwriting its
      // own snap_$id (the GenLedger idempotency discipline)
      val gens = new GenLedger
      val schema = s.read.parquet(feedDir).schema
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(feedDir)
      val q = feed.writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!batch.isEmpty) {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id"))
              .orderBy(col("ts").desc, col("event_id").desc)
            val latest = batch
              .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
              .select(col("user_id"), unix_micros(col("ts")).as("_bts"),
                col("event_id").as("_bid"), col("event_type"), col("value"))
            val snap = s.read.parquet(gens.predecessor(id).getOrElse(snap0))
            val j = snap.join(latest, snap("c_custkey") === latest("user_id"),
              "full_outer")
            val newer = latest("user_id").isNotNull &&
              (snap("c_custkey").isNull ||
                col("_bts") > col("_vts") ||
                (col("_bts") === col("_vts") && col("_bid") > col("_vid")))
            val next = j.select(
              coalesce(latest("user_id"), snap("c_custkey")).as("c_custkey"),
              when(newer, coalesce(snap("c_name"), lit("(new)")))
                .otherwise(snap("c_name")).as("c_name"),
              when(newer, latest("value"))
                .otherwise(snap("c_acctbal")).as("c_acctbal"),
              when(newer, col("_bts")).otherwise(col("_vts")).as("_vts"),
              when(newer, col("_bid")).otherwise(col("_vid")).as("_vid"),
              when(newer, col("event_type") === "error")
                .otherwise(coalesce(col("_del"), lit(false))).as("_del"))
            val nextPath = s"$root/snap_$id"
            // coalesced: the snapshot is dimension-sized; per-trigger
            // multi-part writes are the small-files problem
            next.coalesce(1).write.mode("overwrite").parquet(nextPath)
            gens.record(id, nextPath)
          }
          ()
        }
        .option("checkpointLocation", freshDir(s"$root/ckpt"))
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.read.parquet(gens.latestOption.getOrElse(snap0))
        .filter(!col("_del"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    }

  /** Incremental JOIN-view maintenance: the materialized view
    * J = purchases ⋈ signups (same 7-day interval semantics as
    * [[streamingJoin]]) kept current by DELTA-JOIN ALGEBRA instead of
    * Spark's state-store join: for each micro-batch Δ against the
    * accumulated sides P and S,
    *
    *   ΔJ = Δp ⋈ S  ∪  P ⋈ Δs  ∪  Δp ⋈ Δs
    *
    * (P and S are the PRE-batch snapshots, so every pair lands in
    * exactly one term — no dedup pass needed), ΔJ appends to the view,
    * then the deltas append to their side tables. This completes the
    * IVM triptych: [[streamingAggMaintain]] (commutative merge),
    * [[streamingCdcApply]] (keyed upsert), and this (join views — the
    * warehouse pattern when the view is served from files and the
    * state must outlive any streaming query, unlike the state-store
    * join whose state dies with the checkpoint).
    *
    * Scale shape: each trigger costs two |Δ|-vs-horizon joins plus
    * |Δ|² — never a re-join of P ⋈ S. At 100 TB the side tables are
    * bucketed on user_id (delta joins then shuffle only the delta) and
    * pruned to the join horizon: a side row older than 7 days behind
    * the feed's watermark can never match a future delta, so it
    * retires from P/S — the same eviction the state-store join does,
    * expressed as time-partition pruning on files. Fixpoint verified
    * against the identical batch-join oracle as `stream_join`.
    */
  def streamingJoinMaintain(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noAqe) {
      import graft.sources.Warehouse.layerPath
      val root = layerPath(dir, "joinivm_stream")
      val feedDir = s"$root/feed"
      ensureFeed(dir, "events", feedDir) {
        Tables.load(s, dir, "events")
          .filter(col("event_type").isin("signup", "purchase"))
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"))
          .repartitionByRange(4, col("ts"))
          .write.mode("overwrite").parquet(feedDir)
      }
      // fresh (wiped) state root per invocation: the view dir is
      // append-mode, so a reused-but-unwiped dir would double every pair
      // on a second run
      val run = freshDir(s"$root/run")
      // P and S live in ONE accumulated side dir (both derive from the
      // same feed; projected apart at join time) — one append + one
      // listing per trigger instead of two of each, and the KB-sized
      // per-batch appends are coalesced to a single file: a trigger that
      // writes 8 two-KB part files per table is the small-files problem
      // in miniature (measured here as parquet job-commit overhead
      // dominating the trigger)
      val (sidesDir, jDir) = (s"$run/sides", s"$run/j")
      var accSeen = false
      val schema = s.read.parquet(feedDir).schema
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(feedDir)
      val cond = col("user_id") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAY")
      def pSide(df: DataFrame): DataFrame =
        df.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            col("ts").as("p_ts"))
      def sSide(df: DataFrame): DataFrame =
        df.filter(col("event_type") === "signup")
          .select(col("event_id").as("s_id"),
            col("user_id").as("s_user"), col("ts").as("s_ts"))
      def pairs(a: DataFrame, b: DataFrame): DataFrame =
        a.join(b, cond).select(col("p_id"), col("user_id"), col("p_ts"),
          col("s_id"), col("s_ts"))
      val q = feed.writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          val (dp, ds) = (pSide(batch.toDF()), sSide(batch.toDF()))
          // ΔJ against the PRE-batch side snapshot. The DELTA side of
          // each term is broadcast — it is trigger-bounded by
          // construction, so the accumulated side never moves (at 100 TB:
          // scan the horizon-pruned bucketed side table, ship only the
          // delta) — and the sides read carries the feed schema (same
          // rows), skipping a per-trigger footer fetch.
          val delta =
            if (accSeen) {
              val acc = s.read.schema(schema).parquet(sidesDir)
              pairs(broadcast(dp), sSide(acc))
                .unionByName(pairs(pSide(acc), broadcast(ds)))
                .unionByName(pairs(broadcast(dp), ds))
            } else pairs(broadcast(dp), ds)
          delta.coalesce(1).write.mode("append").parquet(jDir)
          // …then the whole delta appends to the accumulated sides
          batch.coalesce(1).write.mode("append").parquet(sidesDir)
          accSeen = true
          ()
        }
        .option("checkpointLocation", s"$run/ckpt")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.read.parquet(jDir)
    }

  /** Incremental AGGREGATE maintenance: a running per-user (count, sum)
    * table updated by merging each micro-batch's partial aggregate — the
    * materialized-view-maintenance pattern for totals too large/too hot
    * to recompute per trigger. Contrast with [[streamingCdcApply]]: sums
    * and counts are COMMUTATIVE, so no version guard or tombstone is
    * needed — any batch arrival order folds to the same fixpoint, which
    * is why additive metrics are the easiest thing to maintain
    * incrementally at 100 TB. Each trigger costs one partial agg over
    * the batch plus one key-shuffled outer merge with the running table;
    * the running table's sums use a DECIMAL accumulator so the fold
    * order cannot perturb a float result.
    */
  def streamingAggMaintain(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noAqe) {
      import graft.sources.Warehouse.layerPath
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val root = layerPath(dir, "agg_stream")
      val feedDir = s"$root/feed"
      ensureFeed(dir, "events", feedDir) {
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("ts"), col("user_id"), col("value"))
          .repartitionByRange(4, col("ts"))
          .write.mode("overwrite").parquet(feedDir)
      }
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("agg_"))
        .foreach(f => freshDir(f.getPath))
      val gens = new GenLedger
      val schema = s.read.parquet(feedDir).schema
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(feedDir)
      val q = feed.writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!batch.isEmpty) {
            val part = batch.groupBy(col("user_id"))
              .agg(count(lit(1)).as("b_n"),
                sum(col("value").cast(DecimalType(18, 2))).as("b_sum"))
            val next = gens.predecessor(id) match {
              case None => part.select(col("user_id"), col("b_n").as("n_events"),
                col("b_sum").as("sum_value"))
              case Some(p) =>
                val run = s.read.parquet(p)
                run.join(part, run("user_id") === part("user_id"), "full_outer")
                  .select(
                    coalesce(run("user_id"), part("user_id")).as("user_id"),
                    (coalesce(col("n_events"), lit(0L)) +
                      coalesce(col("b_n"), lit(0L))).as("n_events"),
                    (coalesce(col("sum_value"), lit(0).cast(DecimalType(18, 2))) +
                      coalesce(col("b_sum"), lit(0).cast(DecimalType(18, 2))))
                      .cast(DecimalType(18, 2)).as("sum_value"))
            }
            val nextPath = s"$root/agg_$id"
            next.coalesce(1).write.mode("overwrite").parquet(nextPath)
            gens.record(id, nextPath)
          }
          ()
        }
        .option("checkpointLocation", freshDir(s"$root/ckpt"))
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.read.parquet(gens.latest)
        .select(col("user_id"), col("n_events"),
          col("sum_value").cast(DoubleType).as("sum_value"))
    }

  private val streamingAggMaintainSql =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id""".stripMargin

  /** Incremental RELEASE-MANIFEST maintenance: the per-(split, shard)
    * verification artifact of `curate_shard_manifest` — doc count, char
    * volume, content digest, id range — kept current as documents ARRIVE,
    * never recomputed. This is the payoff of the manifest's commutative
    * design: the digest is a SUM of per-row hashes and the id range is a
    * MIN/MAX, so every column is an abelian-group (or semilattice) fold
    * and a micro-batch's partial merges into the running table by
    * element-wise +/min/max — any arrival order reaches the same
    * fixpoint. Per trigger: one codegen map (split/shard routing + row
    * hash) + one partial agg over the batch + one key-shuffled outer
    * merge with the splits×shards-row running table. At 100 TB a corpus
    * append updates the release manifest in O(delta); the batch job that
    * would re-scan the corpus never runs. Verified against the identical
    * batch GROUP BY oracle (the fixpoint discipline of the other
    * `*_maintain` ops). Covers the WHOLE corpus release (every document);
    * the curated-training-set manifest remains `curate_shard_manifest`.
    */
  def streamingManifestMaintain(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noAqe) {
      import graft.sources.Warehouse.layerPath
      val fns = graft.functions.TextFns
      val root = layerPath(dir, "manifest_stream")
      val feedDir = s"$root/feed"
      ensureFeed(dir, "documents", feedDir) {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("n_chars"))
          .repartitionByRange(4, col("doc_id"))
          .write.mode("overwrite").parquet(feedDir)
      }
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("man_"))
        .foreach(f => freshDir(f.getPath))
      val gens = new GenLedger
      val schema = s.read.parquet(feedDir).schema
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(feedDir)
      val q = feed.writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!batch.isEmpty) {
            val routed = batch.toDF().select(
              col("doc_id"), col("n_chars"),
              when(substring(fns.fastMd5(col("doc_id").cast("string")), 1, 2)
                < graft.ops.TextOps.evalHexCeiling, lit("eval"))
                .otherwise(lit("train")).as("split"),
              (conv(substring(fns.fastMd5(concat(lit("shuf|"),
                col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long")
                % graft.ops.Curate.trainingShards).cast("int").as("shard"),
              conv(substring(fns.fastMd5(concat(lit("man|"),
                col("doc_id").cast("string"), lit(":"),
                fns.fingerprint(col("text")))), 1, 8), 16, 10)
                .cast("long").as("rh"))
            val part = routed.groupBy(col("split"), col("shard"))
              .agg(count(lit(1)).cast("long").as("b_n"),
                sum(col("n_chars")).cast("long").as("b_chars"),
                sum(col("rh")).cast("long").as("b_digest"),
                min(col("doc_id")).as("b_min"),
                max(col("doc_id")).as("b_max"))
            val next = gens.predecessor(id) match {
              case None => part.select(col("split"), col("shard"),
                col("b_n").as("n_docs"), col("b_chars").as("n_chars"),
                col("b_digest").as("digest"), col("b_min").as("min_doc"),
                col("b_max").as("max_doc"))
              case Some(p) =>
                val run = s.read.parquet(p)
                run.join(part,
                  run("split") === part("split") &&
                    run("shard") === part("shard"), "full_outer")
                  .select(
                    coalesce(run("split"), part("split")).as("split"),
                    coalesce(run("shard"), part("shard")).as("shard"),
                    (coalesce(col("n_docs"), lit(0L)) +
                      coalesce(col("b_n"), lit(0L))).as("n_docs"),
                    (coalesce(run("n_chars"), lit(0L)) +
                      coalesce(col("b_chars"), lit(0L))).as("n_chars"),
                    (coalesce(col("digest"), lit(0L)) +
                      coalesce(col("b_digest"), lit(0L))).as("digest"),
                    least(coalesce(col("min_doc"), col("b_min")),
                      coalesce(col("b_min"), col("min_doc"))).as("min_doc"),
                    greatest(coalesce(col("max_doc"), col("b_max")),
                      coalesce(col("b_max"), col("max_doc"))).as("max_doc"))
            }
            val nextPath = s"$root/man_$id"
            next.coalesce(1).write.mode("overwrite").parquet(nextPath)
            gens.record(id, nextPath)
          }
          ()
        }
        .option("checkpointLocation", freshDir(s"$root/ckpt"))
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.read.parquet(gens.latest)
    }

  // the split / shard / row-hash fragments come from Curate so the
  // maintained manifest and the batch release manifest are
  // DEFINITIONALLY the same digest — drift in one place is impossible
  private val streamingManifestMaintainSql =
    s"""WITH r AS (
       |  SELECT doc_id, n_chars,
       |    ${graft.ops.Curate.splitSqlFor("doc_id")} AS split,
       |    ${graft.ops.Curate
            .shardSqlFor("doc_id", graft.ops.Curate.trainingShards)} AS shard,
       |    ${graft.ops.Curate.manifestRowHashSqlFor("doc_id", "text")} AS rh
       |  FROM documents)
       |SELECT split, shard, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(rh) AS BIGINT) AS digest,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM r GROUP BY split, shard""".stripMargin

  /** Incremental MODEL-STATISTIC maintenance: the PCA/covariance Gram
    * stats of [[graft.ops.SimilarityOps]]'s `sim_pca_project` kept
    * current as the embedding corpus arrives in micro-batches. Each
    * batch reduces to ONE ~17 KB [[graft.expressions.GramMatrix]]
    * partial (count, sums, Gram upper triangle) and merges into a
    * driver-held accumulator by element-wise addition — literally the
    * aggregate's `merge()` sequenced over time instead of over mappers,
    * so per-batch cost is O(batch) and state is O(d²) regardless of how
    * much corpus has flowed. A model refresh (the fixed-iteration power
    * method + projection) then runs off the maintained stats; here it
    * runs once at the end and must equal the batch recompute, verified
    * against the SAME DuckDB oracle as `sim_pca_project` — the fixpoint
    * discipline of the other `*_maintain` ops applied to a model
    * artifact rather than a view.
    *
    * At 100 TB this is the difference between re-scanning the corpus
    * per model refresh and paying one linear pass ONCE: arrivals keep
    * the 17 KB stats current; refreshes are pure driver work. (Updates/
    * deletes would subtract their partial the same way — Gram stats are
    * an abelian-group aggregate, the textbook IVM-friendly shape.)
    */
  def streamingGramMaintain(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Warehouse.layerPath
    val root = layerPath(dir, "gram_stream")
    val feedDir = s"$root/feed"
    ensureFeed(dir, "embeddings", feedDir) {
      // 4 vec_id-range files, 2 per trigger => 2 micro-batches
      Tables.load(s, dir, "embeddings")
        .repartitionByRange(4, col("vec_id"))
        .write.mode("overwrite").parquet(feedDir)
    }
    val d = 64
    val acc = new Array[Double](1 + d + d * (d + 1) / 2)
    // foreachBatch is at-least-once: a retried/replayed micro-batch would
    // double-merge its partial into `acc`. The merge is made idempotent
    // per batchId — ids are monotonically increasing, so tracking the
    // last-merged id and skipping any id already seen is exactly the
    // "store the applied version with the state" guard streamingCdcApply
    // uses, applied to a driver-held accumulator.
    var lastMerged = -1L
    val schema = s.read.parquet(feedDir).schema
    val feed = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(feedDir)
    val q = feed.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (id > lastMerged && !batch.isEmpty) {
          val part = batch
            .agg(graft.expressions.GramMatrix.gram(col("embedding"), d))
            .head.getSeq[Double](0)
          var i = 0
          while (i < acc.length) { acc(i) += part(i); i += 1 }
          lastMerged = id
        }
        ()
      }
      .option("checkpointLocation", freshDir(s"$root/ckpt"))
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ops.SimilarityOps.pcaProjectFromStats(s, dir, acc)
  }

  /** Incremental RANK-statistic maintenance: the exact top-K token
    * report ([[graft.ops.TextOps.topTokens]]) kept current as documents
    * arrive in micro-batches. The instructive part is what CANNOT be
    * maintained: the K result rows alone are not a self-maintainable
    * view — any batch can promote a token from just below the cut, so
    * the maintained STATE must be the full token-count SUPPORT table
    * (vocabulary-sized: bounded by the language, not the corpus) and
    * the top-K is a cheap rank extraction off it at read time. Each
    * trigger costs one map-side-combined partial count over the batch
    * plus one token-shuffled outer merge with the running table — the
    * [[streamingAggMaintain]] fold applied to a rank statistic. Counts
    * are commutative, so arrival order cannot perturb the fixpoint,
    * verified against the batch `text_top_tokens` oracle. At 100 TB/day
    * the support table is a bucketed side table and each merge shuffles
    * only the batch's distinct tokens (partial agg collapses the batch
    * before the exchange).
    */
  def streamingTopKMaintain(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noAqe) {
      import graft.sources.Warehouse.layerPath
      val root = layerPath(dir, "topk_stream")
      val feedDir = s"$root/feed"
      ensureFeed(dir, "documents", feedDir) {
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .repartitionByRange(4, col("doc_id"))
          .write.mode("overwrite").parquet(feedDir)
      }
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("counts_"))
        .foreach(f => freshDir(f.getPath))
      val gens = new GenLedger
      val schema = s.read.parquet(feedDir).schema
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(feedDir)
      val q = feed.writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!batch.isEmpty) {
            val part = batch
              .select(explode(graft.functions.TextFns.tokens(col("text")))
                .as("token"))
              .groupBy(col("token")).agg(count(lit(1)).as("b_n"))
            val next = gens.predecessor(id) match {
              case None => part.select(col("token"), col("b_n").as("n"))
              case Some(p) =>
                val run = s.read.parquet(p)
                run.join(part, run("token") === part("token"), "full_outer")
                  .select(
                    coalesce(run("token"), part("token")).as("token"),
                    (coalesce(col("n"), lit(0L)) +
                      coalesce(col("b_n"), lit(0L))).as("n"))
            }
            val nextPath = s"$root/counts_$id"
            next.coalesce(1).write.mode("overwrite").parquet(nextPath)
            gens.record(id, nextPath)
          }
          ()
        }
        .option("checkpointLocation", freshDir(s"$root/ckpt"))
        .start()
      try q.processAllAvailable()
      finally q.stop()
      s.read.parquet(gens.latest)
        .orderBy(col("n").desc, col("token").asc)
        .limit(graft.ops.TextOps.topTokenK)
    }

  /** Incremental EXPERIMENT-readout maintenance — the IVM family's
    * experimentation artifact: the a20 two-proportion readout kept
    * current as event batches arrive, the always-on A/B dashboard every
    * platform runs. The maintained state is the per-user (conv, cents)
    * support table — conv merges by MAX (greatest), cents by SUM, both
    * abelian, so any batch arrival order reaches the same support (the
    * z statistic itself is NOT self-maintainable: a new conversion moves
    * the pooled variance, so the one-row readout re-derives from the
    * user-grain support at read — one fold over |users| rows, the cheap
    * part by construction; arm assignment is a stateless user_id hash
    * and needs no state at all). Per-batch cost is one
    * map-side-combinable partial over the BATCH plus a support-sized
    * merge; the event feed is never rescanned. Fixpoint = the batch
    * [[graft.ops.AnalyticsOps.abTest]] oracle, via the SHARED
    * [[graft.ops.AnalyticsOps.abReadout]] final stage.
    *
    * foreachBatch is at-least-once: a replayed batch overwrites its own
    * `users_$id` generation (idempotent per batch id), the GenLedger
    * merge chain always extends the latest predecessor.
    */
  def streamingAbMaintain(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noAqe) {
      import graft.sources.Warehouse.layerPath
      val root = layerPath(dir, "ab_stream")
      val feedDir = s"$root/feed"
      ensureFeed(dir, "events", feedDir) {
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("value"))
          .repartitionByRange(4, col("user_id"))
          .write.mode("overwrite").parquet(feedDir)
      }
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("users_"))
        .foreach(f => freshDir(f.getPath))
      val gens = new GenLedger
      val schema = s.read.parquet(feedDir).schema
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(feedDir)
      val q = feed.writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!batch.isEmpty) {
            val part = graft.ops.AnalyticsOps.abUserPartial(batch.toDF())
              .select(col("user_id").as("b_user"), col("conv").as("b_conv"),
                col("cents").as("b_cents"))
            val next = gens.predecessor(id) match {
              case None => part.select(col("b_user").as("user_id"),
                col("b_conv").as("conv"), col("b_cents").as("cents"))
              case Some(p) =>
                val run = s.read.parquet(p)
                run.join(part, run("user_id") === part("b_user"),
                    "full_outer")
                  .select(
                    coalesce(run("user_id"), part("b_user")).as("user_id"),
                    greatest(coalesce(col("conv"), lit(0L)),
                      coalesce(col("b_conv"), lit(0L))).as("conv"),
                    (coalesce(col("cents"), lit(0L)) +
                      coalesce(col("b_cents"), lit(0L))).as("cents"))
            }
            val nextPath = s"$root/users_$id"
            next.coalesce(1).write.mode("overwrite").parquet(nextPath)
            gens.record(id, nextPath)
          }
          ()
        }
        .option("checkpointLocation", freshDir(s"$root/ckpt"))
        .start()
      try q.processAllAvailable()
      finally q.stop()
      // an all-empty feed leaves no generation: read out from an empty
      // support (NULL z, zero arms) instead of throwing on gens.latest —
      // the streamingCdcApply latestOption discipline
      graft.ops.AnalyticsOps.abReadout(gens.latestOption
        .map(s.read.parquet(_))
        .getOrElse(s.range(0).select(col("id").as("user_id"),
          col("id").as("conv"), col("id").as("cents"))))
    }

  /** Incremental ANN-INDEX maintenance — the missing member of the IVM
    * family (aggregate, join, rank statistic, model statistic, CDC; this
    * one maintains an INDEX artifact). Embedding arrivals are assigned
    * their top-2 probe cells under the FROZEN coarse quantizer of the
    * current index generation ([[graft.ops.SimilarityOps.ivfModel]] —
    * k×64 doubles entering the plan as broadcast literals, the way FAISS
    * and MLlib freeze a quantizer between offline re-trainings) and
    * appended to a file-backed postings index. Per-batch cost is ONE
    * codegen map over the batch plus an append — no shuffle, no corpus
    * rescan, state = the index itself (inherent: an index IS its
    * postings). At read time the standard query probe runs off the
    * maintained index and must hash-equal the batch index's answer —
    * verified against the SAME DuckDB oracle as `sim_ivf_topk`, the
    * fixpoint discipline of the other `*_maintain` ops.
    *
    * foreachBatch is at-least-once: a replayed batch overwrites its own
    * `postings_$id` dir (idempotent per batch id) and the path-set guard
    * keeps the read-side union duplicate-free. What this op does NOT
    * maintain is the quantizer itself — a re-cluster generation pays one
    * linear assignment pass by construction; the quantizer's TRAINING
    * stats (per-cell integer sums/counts) are abelian-group aggregates
    * maintainable exactly like [[streamingGramMaintain]]'s Gram buffer.
    */
  def streamingIvfMaintain(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Warehouse.layerPath
    val root = layerPath(dir, "ivf_stream")
    val feedDir = s"$root/feed"
    ensureFeed(dir, "embeddings", feedDir) {
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .repartitionByRange(4, col("vec_id"))
        .write.mode("overwrite").parquet(feedDir)
    }
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("postings_"))
      .foreach(f => freshDir(f.getPath))
    val model = graft.ops.SimilarityOps.ivfModel(s, dir)
    var postings = List.empty[String]
    val schema = s.read.parquet(feedDir).schema
    val feed = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(feedDir)
    val q = feed.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val path = s"$root/postings_$id"
          graft.ops.SimilarityOps.probeWithModel(batch.toDF(), model)
            .write.mode("overwrite").parquet(path)
          if (!postings.contains(path)) postings ::= path
        }
        ()
      }
      .option("checkpointLocation", freshDir(s"$root/ckpt"))
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ops.SimilarityOps.ivfTopkFromCells(
      s.read.parquet(postings.reverse: _*))
  }

  /** Incremental MONITORING-statistic maintenance — the IVM family's
    * operations artifact: the CUSUM changepoint monitor kept current as
    * event batches arrive. The maintained state is the (event_type, day)
    * count support table — day-grain, calendar-bounded, merged per batch
    * with a commutative full-outer add exactly like the rank statistic's
    * vocabulary table (CUSUM itself is NOT self-maintainable: every new
    * day moves μ and therefore every prefix deviation, so the alarm
    * sweep re-derives from the bounded support at read — tens of rows per
    * type at any corpus size, the cheap part by construction). Per-batch
    * cost is one map-side-combinable partial count of the BATCH plus a
    * support-sized merge; the raw feed is never rescanned. Fixpoint = the
    * batch [[graft.ops.TimeSeriesOps.changepoint]] oracle.
    */
  def streamingCusumMaintain(s: SparkSession, dir: String): DataFrame =
    withNanosAsLong(s, noAqe) {
      import graft.sources.Warehouse.layerPath
      val root = layerPath(dir, "cusum_stream")
      val feedDir = s"$root/feed"
      ensureFeed(dir, "events", feedDir) {
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("ts"), col("event_type"))
          .repartitionByRange(4, col("event_id"))
          .write.mode("overwrite").parquet(feedDir)
      }
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("counts_"))
        .foreach(f => freshDir(f.getPath))
      val gens = new GenLedger
      val schema = s.read.parquet(feedDir).schema
      val feed = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2).parquet(feedDir)
      val q = feed.writeStream.outputMode("append")
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          if (!batch.isEmpty) {
            val part = batch
              .groupBy(col("event_type").as("b_type"),
                to_date(col("ts")).as("b_day"))
              .agg(count(lit(1)).as("b_x"))
            val next = gens.predecessor(id) match {
              case None => part.select(col("b_type").as("event_type"),
                col("b_day").as("day"), col("b_x").as("x"))
              case Some(p) =>
                val run = s.read.parquet(p)
                run.join(part,
                  run("event_type") === part("b_type") &&
                    run("day") === part("b_day"), "full_outer")
                  .select(
                    coalesce(run("event_type"), part("b_type"))
                      .as("event_type"),
                    coalesce(run("day"), part("b_day")).as("day"),
                    (coalesce(col("x"), lit(0L)) +
                      coalesce(col("b_x"), lit(0L))).as("x"))
            }
            val nextPath = s"$root/counts_$id"
            next.coalesce(1).write.mode("overwrite").parquet(nextPath)
            gens.record(id, nextPath)
          }
          ()
        }
        .option("checkpointLocation", freshDir(s"$root/ckpt"))
        .start()
      try q.processAllAvailable()
      finally q.stop()
      graft.ops.TimeSeriesOps.cusumOver(s.read.parquet(gens.latest))
    }

  private val streamingTopKMaintainSql =
    s"""SELECT token, COUNT(*) AS n
       |FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
       |      FROM documents)
       |GROUP BY token
       |ORDER BY n DESC, token ASC
       |LIMIT ${graft.ops.TextOps.topTokenK}""".stripMargin

  override val ops: Seq[Op] = Seq(
    Op("stream_ivf_maintain", streamingIvfMaintain,
      Some(graft.ops.SimilarityOps.ivfTopkSql),
      "incremental ANN-index maintenance: arrivals probe-assigned under the frozen quantizer, appended postings; fixpoint = batch sim_ivf_topk"),
    Op("stream_topk_maintain", streamingTopKMaintain,
      Some(streamingTopKMaintainSql),
      "incremental RANK-statistic maintenance: vocabulary support table merged per batch, top-K extracted at read"),
    Op("stream_ab_maintain", streamingAbMaintain,
      Some(graft.ops.AnalyticsOps.abTestSql),
      "incremental EXPERIMENT-readout maintenance: per-user (conv, cents) support merged per batch (max/+, abelian), one-row z readout re-derived at read; fixpoint = batch a20_ab_test"),
    Op("stream_cusum_maintain", streamingCusumMaintain,
      Some(graft.ops.TimeSeriesOps.changepointSql),
      "incremental MONITORING-statistic maintenance: day-grain count support merged per batch, CUSUM alarms re-derived at read; fixpoint = batch ts_changepoint"),
    Op("stream_gram_maintain", streamingGramMaintain,
      Some(graft.ops.SimilarityOps.pcaProjectSql),
      "incremental PCA-model maintenance: per-batch Gram partials merged driver-side; fixpoint = batch sim_pca_project"),
    Op("stream_manifest_maintain", streamingManifestMaintain,
      Some(streamingManifestMaintainSql),
      "incremental release-manifest maintenance: commutative digest/count/range merged per micro-batch, O(delta) per corpus append"),
    Op("stream_agg_maintain", streamingAggMaintain,
      Some(streamingAggMaintainSql),
      "incremental aggregate maintenance: commutative per-batch merges, decimal accumulator"),
    Op("stream_join_maintain", streamingJoinMaintain,
      Some(streamingJoinSql),
      "incremental join-view maintenance: delta-join algebra over file-backed side tables"),
    Op("stream_cdc_apply", streamingCdcApply,
      Some(graft.ops.CdcMerge.cdcUpsertSql),
      "incremental CDC via foreachBatch: version-guarded, tombstoned merges; fixpoint = batch MERGE"),
    Op("stream_sessionize", sessionizeBatch, Some(sessionizeBatchSql),
      "30-min-gap sessionization (typed Dataset; streaming twin in sessionizeStream)"),
    Op("stream_hourly_window", hourlyWindowed, Some(hourlyWindowedSql),
      "tumbling-window agg executed via Structured Streaming memory sink"),
    Op("stream_dedup", streamingDedup, Some(streamingDedupSql),
      "watermark-bounded streaming dedup (dropDuplicatesWithinWatermark)"),
    Op("stream_join", streamingJoin, Some(streamingJoinSql),
      "stream-stream interval join with watermark-evicted join state"),
    Op("stream_enrich", streamingEnrich, Some(streamingEnrichSql),
      "stateless stream-static broadcast enrichment join (append mode, no watermark)"),
    Op("stream_session_window", sessionWindowed, Some(sessionWindowedSql),
      "sessionization via the NATIVE session_window aggregation (Catalyst-planned session merge)"))
}
