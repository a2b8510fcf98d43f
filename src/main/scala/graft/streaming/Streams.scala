package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Graft
import graft.engine.Num._

/** Accumulating per-user session state for [[Streams.sessionizeStream]]
  * (top-level: encoders need a stable TypeTag). */
case class SessionAcc(startMs: Long, lastMs: Long, cnt: Long)

/** Closed session emitted by [[Streams.sessionizeStream]]. */
case class ClosedSession(user_id: Long, s_start: java.sql.Timestamp,
    s_end: java.sql.Timestamp, cnt: Long)

/** Input row for [[Streams.runningStatsTws]] (top-level for a stable
  * encoder). */
case class UserEvt(user_id: Long, event_type: String, value: Double)

/** Output row of [[Streams.runningStatsTws]]. */
case class UserStats(user_id: Long, n_events: Long, vsum: Long, n_types: Long)

/** Per-user running stats as a Spark 4 `StatefulProcessor` (the
  * `transformWithState` arbitrary-state API that supersedes
  * mapGroupsWithState): a ValueState holds the (count, floor-sum)
  * pair, a MapState the distinct event types — each state item is
  * keyed and stored independently in the state store (RocksDB
  * provider), so per-user state is O(#distinct types) and the store
  * scales with key cardinality, not event volume. TTL is left NONE
  * here; the API surface (TTLConfig per state item) is the modern
  * replacement for GroupStateTimeout. */
class RunningStatsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvt, UserStats] {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[(Long, Long)] = _
  @transient private var types: MapState[String, Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    totals = getHandle.getValueState("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    types = getHandle.getMapState("types",
      Encoders.STRING, Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[UserEvt],
      timerValues: TimerValues): Iterator[UserStats] = {
    var (c, s) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { e =>
      c += 1
      s += math.floor(e.value).toLong
      if (!types.containsKey(e.event_type)) types.updateValue(e.event_type, true)
    }
    totals.update((c, s))
    Iterator.single(UserStats(key, c, s, types.keys().size.toLong))
  }
}

/** Session close-out on EVENT-TIME TIMERS via the transformWithState
  * SPI — the modern twin of [[Streams.sessionizeStream]]'s
  * flatMapGroupsWithState version: state is one open [[SessionAcc]]
  * per user; every update re-arms a single timer at last+gap (the old
  * timer is deleted first, so exactly one is live per key); when the
  * watermark passes the timer, [[handleExpiredTimer]] emits the closed
  * session and clears state. In-batch splits emit inline, identical to
  * the fMGWS version's sweep. */
class SessionTimerProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, java.sql.Timestamp), ClosedSession] {
  import org.apache.spark.sql.{Encoders => Encs}
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var acc: ValueState[SessionAcc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getValueState("sess", Encs.product[SessionAcc], TTLConfig.NONE)

  override def handleInputRows(uid: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    val prior = if (acc.exists()) Some(acc.get()) else None
    prior.foreach(p => getHandle.deleteTimer(p.lastMs + gapMs))
    // Same interval sweep as sessionizeStream: merge the stored open
    // session with the batch's points, close all but the latest.
    val batch = rows.map(_._2.getTime).toArray.sorted
      .map(t => SessionAcc(t, t, 1L))
    val all = (prior.toSeq ++ batch).sortBy(a => (a.startMs, a.lastMs))
    val merged = scala.collection.mutable.ListBuffer[SessionAcc]()
    all.foreach { s =>
      if (merged.nonEmpty && s.startMs - merged.last.lastMs <= gapMs) {
        val p = merged.remove(merged.size - 1)
        merged += SessionAcc(math.min(p.startMs, s.startMs),
          math.max(p.lastMs, s.lastMs), p.cnt + s.cnt)
      } else merged += s
    }
    val open = merged.remove(merged.size - 1)
    acc.update(open)
    getHandle.registerTimer(open.lastMs + gapMs)
    merged.iterator.map(s => ClosedSession(uid,
      new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs), s.cnt))
  }

  override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    // Only the CURRENT timer closes the session (a stale timer for a
    // since-extended session was deleted, but double-check anyway).
    if (acc.exists() && acc.get().lastMs + gapMs == expiredTimerInfo.getExpiryTimeInMs) {
      val s = acc.get()
      acc.clear()
      Iterator.single(ClosedSession(uid, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.lastMs), s.cnt))
    } else Iterator.empty
  }
}

/** Structured-Streaming surface over the `events` table (SURVEY §2.10).
  *
  * The reference is batch-only (Kafka/Kinesis connectors map topics to
  * static tables — `plugin/trino-kafka/.../KafkaConnector.java`), so
  * this module is a capability ADD, built on Spark's native streaming
  * operators: event-time windows (tumbling / sliding / session),
  * watermarks, and stateful dedup.
  *
  * Every transform below is written against a plain DataFrame, so the
  * SAME code runs in batch mode (verified row-for-row against the
  * DuckDB oracle via SparkEntry) and in streaming mode
  * (readStream → transform → writeStream; exercised with MemoryStream
  * in StreamingSpec). That batch/stream unification is the Spark-first
  * design: one declarative plan, two execution modes.
  *
  * Scale notes (100 TB/day of events): windowed aggregation state is
  * bounded by watermark horizon × key cardinality; session windows
  * shuffle once on user_id; dedup keeps one bloom/row per key within
  * the watermark. No operator below accumulates unbounded state.
  */
object Streams {

  /** Events with micros `ts` (see Graft.events). */
  private def ev(s: SparkSession, dir: String): DataFrame = Graft.events(s, dir)

  // -------------------------------------------- st1 tumbling window
  /** Tumbling 1-hour event-time window per event type: the canonical
    * `groupBy(window($"ts", "1 hour"))` aggregation. */
  def st1(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), decSumLong(unscaled2dp(col("value")), 2).cast("double").as("val_sum"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"), col("val_sum"))

  val st1Sql: String =
    """SELECT date_trunc('hour', ts) AS w_start, event_type, count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val_sum
      |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin

  // --------------------------------------------- st2 sliding window
  /** Sliding window (1 hour, 30-minute slide): every event lands in
    * two overlapping windows. The oracle replays the same assignment
    * with time_bucket on the 30-minute grid. */
  def st2(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"), decSumLong(unscaled2dp(col("value")), 2).cast("double").as("val_sum"))
      .select(col("window.start").as("w_start"), col("cnt"), col("val_sum"))

  val st2Sql: String =
    """SELECT w_start, count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val_sum
      |FROM (
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, value FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w_start, value
      |  FROM events) w
      |GROUP BY w_start""".stripMargin

  // --------------------------------------------- st3 session window
  /** Session windows with a 5-minute inactivity gap per user — Spark's
    * `session_window`; the oracle derives identical sessions with the
    * gaps-and-islands rewrite (lag + running sum of breaks). */
  def st3(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), decSumLong(unscaled2dp(col("value")), 2).cast("double").as("val_sum"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("cnt"), col("val_sum"))

  val st3Sql: String =
    """WITH d AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL '5 minutes' THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d)
      |SELECT min(ts) AS s_start, max(ts) + INTERVAL '5 minutes' AS s_end,
      |  user_id, count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS val_sum
      |FROM s GROUP BY user_id, sid""".stripMargin

  // ------------------------------------------------------ st4 dedup
  /** Stream-dedup census: distinct (user_id, event_type) keys vs total
    * events — the cardinality a streaming `dropDuplicates` over those
    * keys would emit (the streaming form itself is exercised in
    * StreamingSpec; which physical row survives is nondeterministic,
    * so the batch oracle pins the deterministic census instead). */
  def st4(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).agg(
      count(lit(1)).as("total_events"),
      countDistinct(col("user_id"), col("event_type")).as("distinct_keys"),
      countDistinct(col("event_id")).as("distinct_ids"))

  val st4Sql: String =
    """SELECT count(*) AS total_events,
      |  count(DISTINCT (user_id, event_type)) AS distinct_keys,
      |  count(DISTINCT event_id) AS distinct_ids
      |FROM events""".stripMargin

  // ------------------------------------------ st5 stream-stream join
  /** Stream-stream interval join: every click matched to the same
    * user's purchases within the following hour — the canonical
    * two-stream correlation (Structured Streaming plans this with
    * per-side watermark state; the time-range predicate is what
    * BOUNDS that state, so it's not an optimization hint but the
    * operator's memory contract at 100 TB/day). Batch semantics are
    * identical to the equi+range join the oracle runs; the streaming
    * form of the same code is exercised in StreamingSpec. */
  def st5(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_event"),
        col("ts").as("c_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
        col("value").as("p_value"), col("ts").as("p_ts"))
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("c_event"), col("p_event"),
        col("p_value"), col("c_ts"), col("p_ts"))
  }

  val st5Sql: String =
    """SELECT c.user_id, c.event_id AS c_event, p.event_id AS p_event,
      |  p.value AS p_value, c.ts AS c_ts, p.ts AS p_ts
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'""".stripMargin

  // ------------------------------- st8 stream-stream LEFT OUTER join
  /** st5's correlation as a LEFT OUTER join: every click appears, with
    * purchase columns null when no purchase followed within the hour.
    * In streaming mode this is the harder operator: the null row for
    * an unmatched click can only be emitted once the WATERMARK proves
    * no matching purchase can still arrive (c_ts + 1 h + watermark
    * delay), so correctness depends on state-expiry semantics, not
    * just matching — exercised against MemoryStream in StreamingSpec
    * (null-emission exactly at state expiry, batch ≡ stream). State
    * bound is identical to st5's inner form: (watermark + 1 h) of
    * traffic per side, regardless of stream length. */
  def st8(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_event"),
        col("ts").as("c_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
        col("value").as("p_value"), col("ts").as("p_ts"))
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"), "left_outer")
      .select(col("c_user").as("user_id"), col("c_event"), col("p_event"),
        col("p_value"), col("c_ts"), col("p_ts"))
  }

  val st8Sql: String =
    """SELECT c.user_id, c.event_id AS c_event, p.event_id AS p_event,
      |  p.value AS p_value, c.ts AS c_ts, p.ts AS p_ts
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'""".stripMargin

  // ------------------------------ st10 stream-stream FULL OUTER join
  /** FULL OUTER interval join (st8's completion — Spark supports full
    * outer stream-stream joins with time bounds on both sides since
    * 3.1): unmatched CLICKS and unmatched PURCHASES both survive with
    * nulls. In streaming mode both sides' state expires at the
    * watermark, each emitting its null row at expiry;
    * [[fullOuterIntervalJoinStreams]] is the genuine two-stream form
    * and StreamingSpec proves batch ≡ streaming on the same rows. */
  def st10(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_event"),
        col("ts").as("c_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_event"),
        col("value").as("p_value"), col("ts").as("p_ts"))
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"), "full_outer")
      .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
        col("c_event"), col("p_event"), col("p_value"), col("c_ts"), col("p_ts"))
  }

  val st10Sql: String =
    """SELECT coalesce(c.user_id, p.user_id) AS user_id,
      |  c.event_id AS c_event, p.event_id AS p_event,
      |  p.value AS p_value, c.ts AS c_ts, p.ts AS p_ts
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'""".stripMargin

  /** st10 as a genuine two-stream FULL OUTER join: each side's state
    * expires at the global watermark and emits its null row then — the
    * only point "no match" is provable on EITHER side of an unbounded
    * stream (reference comparison: the reference engine is batch-only;
    * this surface is the engine's beyond-reference streaming story). */
  def fullOuterIntervalJoinStreams(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("c_ts", "10 minutes")
      .join(purchases.withWatermark("p_ts", "10 minutes"),
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"),
        "fullOuter")
      .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
        col("c_event"), col("p_event"), col("p_value"), col("c_ts"), col("p_ts"))

  // ------------------------------------------ st6 stream-static join
  /** Stream-static enrichment join: the event stream joined to the
    * static customer dimension (user_id is a customer key in the
    * fixture's id space). In streaming mode this is stateLESS — the
    * static side is re-planned per micro-batch (broadcast when small,
    * shuffled otherwise) and no watermark state accrues; the batch
    * plan here is the identical equi-join the oracle runs. */
  def st6(s: SparkSession, dir: String): DataFrame = {
    val cust = Graft.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    ev(s, dir)
      .join(cust, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        // floor, not int-cast: Spark's double->int truncates while the
        // oracle engine's rounds — floor agrees everywhere
        graft.engine.Num.lsum(floor(col("value")).cast("long")).as("vsum"))
  }

  val st6Sql: String =
    """SELECT c_mktsegment, event_type, count(*) AS cnt,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS vsum
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type""".stripMargin

  // ---------------------------------------------- streaming builders
  /** The same tumbling aggregation as a genuine streaming transform
    * (watermark + append-mode-compatible window agg): applied to any
    * streaming DataFrame with (ts, event_type, value). */
  def tumblingStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

  /** Streaming session windows (watermarked). */
  def sessionStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("s_start"), col("user_id"), col("cnt"))

  /** Streaming dedup on (user_id, event_type) within the watermark.
    *
    * `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: plain
    * dropDuplicates only evicts state when the event-time column is
    * part of the dedup KEY — on a bare business key its state grows
    * with total distinct keys forever (an unbounded-state bug at
    * 100 TB/day). The WithinWatermark variant keeps the business key
    * alone as the identity and still expires each key's state once the
    * watermark passes its first-seen time + delay — bounded by
    * watermark-horizon key cardinality. Duplicates arriving within the
    * watermark window are dropped; a re-occurrence after expiry is
    * treated as new (the documented at-least-once contract). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** st5's interval join as a genuine two-stream join: watermarks on
    * BOTH sides plus the two-sided time-range predicate are what let
    * Structured Streaming evict join state — clicks older than the
    * watermark minus the join window can never match a future
    * purchase, so state stays bounded by (watermark + 1h) of traffic
    * per side regardless of total stream length. */
  def intervalJoinStreams(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("c_ts", "10 minutes")
      .join(purchases.withWatermark("p_ts", "10 minutes"),
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("c_event"), col("p_event"),
        col("p_value"), col("c_ts"), col("p_ts"))

  /** st8's left-outer interval join as a genuine two-stream join. The
    * outer side's null rows are emitted by the state store at EXPIRY
    * time: a click row is held until the watermark passes
    * c_ts + 1 h (+ delay); if no purchase matched by then, the row is
    * evicted AND emitted with nulls — the only point at which
    * "no match" is provable over an unbounded stream. */
  def outerIntervalJoinStreams(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.withWatermark("c_ts", "10 minutes")
      .join(purchases.withWatermark("p_ts", "10 minutes"),
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR"),
        "leftOuter")
      .select(col("c_user").as("user_id"), col("c_event"), col("p_event"),
        col("p_value"), col("c_ts"), col("p_ts"))

  /** [[RunningStatsProcessor]] applied to any (user_id, event_type,
    * value) DataFrame via `transformWithState` — runs in BOTH batch
    * mode (each key's rows arrive in one call; st9's oracle gate) and
    * streaming mode (state accumulates across micro-batches in
    * RocksDB; StreamingSpec proves cross-batch accumulation equals the
    * batch result). */
  def runningStatsTws(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    org.apache.spark.sql.graft.PlanExec
      .ensureStateStoreCoordinator(events.sparkSession)
    events.selectExpr("user_id", "event_type", "value").as[UserEvt]
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF()
  }

  // ---------------------------- st9 transformWithState running stats
  /** Batch execution of the transformWithState processor: one output
    * row per user with final (count, floor-sum, distinct-type count)
    * — deterministic (floor-sum is order-independent in Long), so the
    * full result hash-matches the oracle's GROUP BY. */
  def st9(s: SparkSession, dir: String): DataFrame =
    runningStatsTws(ev(s, dir))

  val st9Sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS vsum,
      |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
      |FROM events GROUP BY user_id""".stripMargin

  /** [[SessionTimerProcessor]] wired to a watermarked stream in
    * event-time mode: exactly one live timer per user closes the
    * session when the watermark passes last+gap — the timer-based
    * equivalent of [[sessionizeStream]]'s EventTimeTimeout. */
  def sessionizeTws(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val gapMs = 5 * 60 * 1000L
    events.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }

  /** Custom keyed state via mapGroupsWithState (SURVEY §2.10: the
    * arbitrary-stateful-processing surface): running per-user event
    * count and decimal-free value sum, updated per micro-batch. State
    * is O(1) per user and lives in the state store — bounded, scales
    * with key cardinality not event volume. */
  def runningUserStats(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        var (c, sum) = state.getOption.getOrElse((0L, 0.0))
        it.foreach { e => c += 1; sum += e._2 }
        state.update((c, sum))
        (uid, c, sum)
      }.toDF("user_id", "n_events", "value_sum")
  }

  /** Session close-out via flatMapGroupsWithState + EventTimeTimeout —
    * the arbitrary-stateful surface st3's declarative session_window
    * can't express: emit a session record the moment the watermark
    * proves it over (last event + gap < watermark), not at query end.
    * State per user is one (start, last, cnt) triple; the event-time
    * timeout is re-armed to last+gap on every update, so state is
    * dropped deterministically as the watermark passes — bounded by
    * live-session cardinality at 100 TB/day, independent of history.
    * Splits that happen INSIDE one micro-batch are emitted inline;
    * cross-batch closes ride the timeout path. */
  def sessionizeStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapMs = 5 * 60 * 1000L
    events.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (uid, it, state) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator(ClosedSession(uid, new java.sql.Timestamp(s.startMs),
            new java.sql.Timestamp(s.lastMs), s.cnt))
        } else {
          // Re-sessionize state + batch together as an interval sweep:
          // the stored session is an interval whose INTERNAL member
          // gaps are all <= gap (invariant), batch events are points;
          // sorted by start, adjacent items merge iff their gap is
          // <= gapMs. This keeps the gap invariant for out-of-order
          // events too (watermark 10 min > gap 5 min, so a late event
          // can precede the open session): an event within the span or
          // within gap of a boundary merges (invariant preserved —
          // interior points only shrink member gaps); an event more
          // than gap BEFORE the session start becomes its own earlier
          // session instead of illegally stretching startMs backwards.
          // All but the latest merged session close now (same
          // emit-eagerly choice the in-batch split path always made);
          // the latest stays open awaiting the watermark.
          val batch = it.map(_._2.getTime).toArray.sorted
            .map(t => SessionAcc(t, t, 1L))
          val all = (state.getOption.toSeq ++ batch).sortBy(a => (a.startMs, a.lastMs))
          val merged = scala.collection.mutable.ListBuffer[SessionAcc]()
          all.foreach { s =>
            if (merged.nonEmpty && s.startMs - merged.last.lastMs <= gapMs) {
              val p = merged.remove(merged.size - 1)
              merged += SessionAcc(math.min(p.startMs, s.startMs),
                math.max(p.lastMs, s.lastMs), p.cnt + s.cnt)
            } else merged += s
          }
          val open = merged.remove(merged.size - 1)
          state.update(open)
          state.setTimeoutTimestamp(open.lastMs + gapMs)
          merged.iterator.map(s => ClosedSession(uid,
            new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
            s.cnt))
        }
      }.toDF()
  }

  // ---------------------------------- st7 sketch aggs in windows
  /** Sketch aggregation inside event-time windows: per tumbling hour,
    * the space-saving heavy-hitter summary of event types
    * (`approx_most_frequent`) — the composition a streaming analytics
    * pipeline runs (windowed sketches, merged across micro-batches in
    * the state store). Capacity 10 > the corpus's 5 distinct types, so
    * the summary is exact (the sketch's documented
    * exact-at-low-cardinality regime) and the canonical sorted render
    * hash-matches exact per-window counts; 183 of the hour windows
    * have top-1 count ties, which is exactly why the FULL map is
    * rendered instead of a nondeterministic top-1 pick.
    *
    * At 100 TB: per-window state is one bounded sketch (capacity
    * entries), merged map-side; the streaming variant keeps one
    * sketch buffer per open window in the state store (bounded by
    * watermark horizon), proven batch≡streaming in StreamingSpec. */
  def windowTopTypes(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("approx_most_frequent(10, event_type)").as("m"))
      .select(col("window.start").as("w_start"),
        expr("array_join(transform(array_sort(map_entries(m)), " +
          "e -> concat(e.key, ':', e.value)), ',')").as("counts"))

  def st7(s: SparkSession, dir: String): DataFrame =
    windowTopTypes(ev(s, dir))

  val st7Sql: String =
    """WITH c AS (
      |  SELECT date_trunc('hour', ts) AS w_start, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2)
      |SELECT w_start,
      |  string_agg(event_type || ':' || c, ',' ORDER BY event_type) AS counts
      |FROM c GROUP BY w_start""".stripMargin

  // ------------------------------------------------------------- exports
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1_tumbling_window" -> st1 _,
    "st2_sliding_window" -> st2 _,
    "st3_session_window" -> st3 _,
    "st4_stream_dedup" -> st4 _,
    "st5_stream_join" -> st5 _,
    "st6_stream_static" -> st6 _,
    "st7_window_sketch" -> st7 _,
    "st8_stream_outer_join" -> st8 _,
    "st9_transform_with_state" -> st9 _,
    "st10_stream_full_outer_join" -> st10 _)

  val oracle: Map[String, String] = Map(
    "st1_tumbling_window" -> st1Sql,
    "st2_sliding_window" -> st2Sql,
    "st3_session_window" -> st3Sql,
    "st4_stream_dedup" -> st4Sql,
    "st5_stream_join" -> st5Sql,
    "st6_stream_static" -> st6Sql,
    "st7_window_sketch" -> st7Sql,
    "st8_stream_outer_join" -> st8Sql,
    "st9_transform_with_state" -> st9Sql,
    "st10_stream_full_outer_join" -> st10Sql)
}
