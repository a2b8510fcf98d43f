package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Event fixture for streaming tests (top-level: encoders need a
  * stable TypeTag). */
case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Two-stream join fixtures (top-level for stable encoders). */
case class ClickEv(c_user: Long, c_event: Long, c_ts: Timestamp)
case class PurchEv(p_user: Long, p_event: Long, p_value: Double, p_ts: Timestamp)

/** Streaming-mode smoke: the same transforms that pass the batch
  * DuckDB oracle run as genuine Structured Streaming queries over a
  * MemoryStream, and their final results match the batch run of the
  * identical plan — Spark's batch/stream unification, exercised. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var sparkSession: SparkSession = _

  override def beforeAll(): Unit = {
    sparkSession = graft.engine.Graft.session("graft-stream-test", 4)
    sparkSession.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (sparkSession != null) sparkSession.stop()

  private def mkEvents(): Seq[Ev] = {
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    for (i <- 0 until 600) yield Ev(
      new Timestamp(base + i * 37000L), // 37s apart → spans ~6 hours
      i % 7, Seq("click", "view", "error")(i % 3), (i % 100) / 4.0)
  }

  test("tumbling window: streaming result equals batch result") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents()
    val stream = MemoryStream[Ev]
    stream.addData(data)

    val q = Streams.tumblingStream(stream.toDF())
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = Streams.tumblingStream(data.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("windowed sketch agg: streaming heavy-hitter summary equals batch") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents()
    val stream = MemoryStream[Ev]
    // split across two micro-batches so the sketch buffer must merge
    // through the state store, not just within one batch
    val (a, b) = data.splitAt(data.length / 2)
    stream.addData(a)
    stream.addData(b)

    val q = Streams.windowTopTypes(stream.toDF())
      .writeStream.format("memory").queryName("sketch_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sketch_out")
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    val batch = Streams.windowTopTypes(data.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("session window: streaming sessions match batch sessions") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents()
    val stream = MemoryStream[Ev]
    stream.addData(data)

    val q = Streams.sessionStream(stream.toDF())
      .writeStream.format("memory").queryName("session_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("session_out")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Streams.sessionStream(data.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("mapGroupsWithState accumulates across micro-batches") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents()
    val (b1, b2) = data.splitAt(300)
    val stream = MemoryStream[Ev]

    val q = Streams.runningUserStats(stream.toDF())
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update").start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
    } finally q.stop()

    // latest update per user must equal the full-data batch aggregate
    val latest = spark.table("state_out")
      .groupBy($"user_id").agg(org.apache.spark.sql.functions.max($"n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = data.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(latest == expected)
  }

  test("transformWithState timers close sessions when the watermark passes") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(ms: Long, uid: Long) = Ev(new Timestamp(ms), uid, "view", 1.0)
    try {
      val stream = MemoryStream[Ev]
      val q = graft.streaming.Streams.sessionizeTws(stream.toDF())
        .writeStream.format("memory").queryName("tws_sessions_out")
        .outputMode("append").start()
      try {
        // batch 1 keeps the watermark BELOW t0 (max event t0+60 s,
        // delay 10 min) so batch 2's extension is not late-dropped.
        stream.addData(Seq(ev(t0, 1), ev(t0 + 60000, 1), ev(t0, 2),
          ev(t0, 3)))
        q.processAllAvailable()
        // batch 2: u1's extension (2 min after its last event) must
        // RE-ARM the timer, not let the old one fire; u3's 20-min-later
        // event splits the session inside the processor (closes inline).
        stream.addData(Seq(ev(t0 + 3 * 60000, 1), ev(t0 + 20 * 60000, 3)))
        q.processAllAvailable()
        // advance the watermark past the first-wave timeouts (but NOT
        // past u3's second-session timeout at +25 min), twice so the
        // timers actually fire after the watermark commits
        stream.addData(Seq(ev(t0 + 30 * 60000, 99)))
        q.processAllAvailable()
        stream.addData(Seq(ev(t0 + 31 * 60000, 99)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_sessions_out")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
          r.getTimestamp(2).getTime, r.getLong(3))).toSet
      val expected = Set(
        (1L, t0, t0 + 3 * 60000, 3L), // extended once, then timer-closed
        (2L, t0, t0, 1L),             // timer-closed
        (3L, t0, t0, 1L))             // closed inline by in-batch split
      assert(got == expected, got.toString)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("flatMapGroupsWithState closes sessions on event-time timeout") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(ms: Long, uid: Long) = Ev(new Timestamp(ms), uid, "view", 1.0)
    val stream = MemoryStream[Ev]
    val q = graft.streaming.Streams.sessionizeStream(stream.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // u1: 2-event session; u2: 1-event session; u3: splits INSIDE the
      // batch (second event 20 min later -> first session closes inline)
      stream.addData(Seq(ev(t0, 1), ev(t0 + 60000, 1), ev(t0, 2),
        ev(t0, 3), ev(t0 + 20 * 60000, 3)))
      q.processAllAvailable()
      // advance the watermark past every first-wave timeout (+30 min
      // event -> watermark 10:20 after this batch commits)...
      stream.addData(Seq(ev(t0 + 30 * 60000, 99)))
      q.processAllAvailable()
      // ...and one more batch so the timeouts actually fire
      stream.addData(Seq(ev(t0 + 31 * 60000, 99)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    val expected = Set(
      (1L, t0, t0 + 60000, 2L),             // timeout-closed
      (2L, t0, t0, 1L),                     // timeout-closed
      (3L, t0, t0, 1L))                     // closed inline by in-batch split
    assert(got == expected)
    // u3's second session and u99 are still live -> NOT emitted
    assert(!got.exists(s => s._1 == 99L || (s._1 == 3L && s._2 > t0)))
  }

  test("sessionize keeps the gap invariant for out-of-order events") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(ms: Long, uid: Long) = Ev(new Timestamp(ms), uid, "view", 1.0)
    val min = 60000L
    val stream = MemoryStream[Ev]
    val q = graft.streaming.Streams.sessionizeStream(stream.toDF())
      .writeStream.format("memory").queryName("late_sessions_out")
      .outputMode("append").start()
    try {
      // open sessions: u5 and u6 each at t0+8min
      stream.addData(Seq(ev(t0 + 8 * min, 5), ev(t0 + 8 * min, 6)))
      q.processAllAvailable()
      // late arrivals (watermark is t0-2min, both survive it):
      // u5 at t0 is MORE than the 5-min gap before its session start —
      // it must become its own earlier session, not stretch startMs
      // back across an 8-minute hole; u6 at t0+5min is within gap of
      // the start and must merge, extending the session backwards
      stream.addData(Seq(ev(t0, 5), ev(t0 + 5 * min, 6)))
      q.processAllAvailable()
      // push the watermark past every timeout, then fire them
      stream.addData(Seq(ev(t0 + 40 * min, 99)))
      q.processAllAvailable()
      stream.addData(Seq(ev(t0 + 41 * min, 99)))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("late_sessions_out")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3))).toSet
    assert(got.contains((5L, t0, t0, 1L)), s"late singleton session: $got")
    assert(got.contains((5L, t0 + 8 * min, t0 + 8 * min, 1L)),
      s"original u5 session must be untouched: $got")
    assert(got.contains((6L, t0 + 5 * min, t0 + 8 * min, 2L)),
      s"u6 must merge backwards within gap: $got")
    // no emitted session may span an internal hole wider than the gap
    // with only its 2 members at the boundaries
    assert(!got.exists(s => s._4 == 2 && s._3 - s._2 > 5 * min), got.toString)
  }

  test("streaming dedup emits one row per key") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = mkEvents()
    val stream = MemoryStream[Ev]
    stream.addData(data)

    val q = Streams.dedupStream(stream.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out").count()
      val expected = data.map(e => (e.user_id, e.event_type)).distinct.size
      assert(got == expected)

      // State BOUNDEDNESS (the 100 TB contract): advance the watermark
      // far past every first-seen time — dedup state must be evicted,
      // and the same business key with a fresh timestamp is then
      // treated as NEW (emitted again). Plain dropDuplicates on a bare
      // business key would keep its state forever and suppress it.
      val farMs = data.map(_.ts.getTime).max + 3 * 3600 * 1000L
      stream.addData(Seq(Ev(new Timestamp(farMs), 424242L, "advance", 0.0)))
      q.processAllAvailable()
      val reKey = data.head
      stream.addData(Seq(Ev(new Timestamp(farMs + 60000L),
        reKey.user_id, reKey.event_type, 1.0)))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == expected + 2,
        "expired key must re-emit after watermark eviction")
      val removed = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsRemoved).sum
      assert(removed >= expected, s"dedup state not evicted (removed=$removed)")
    } finally q.stop()
  }

  test("stream-stream interval join: streaming result equals batch result") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val clicks = for (i <- 0 until 120) yield
      ClickEv(i % 5, 1000L + i, new Timestamp(base + i * 61000L))
    val purchases = for (i <- 0 until 120) yield
      PurchEv(i % 5, 2000L + i, i / 2.0, new Timestamp(base + i * 67000L + 30000L))

    val cs = MemoryStream[ClickEv]
    val ps = MemoryStream[PurchEv]
    cs.addData(clicks)
    ps.addData(purchases)
    val q = Streams.intervalJoinStreams(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    val streamed = spark.table("sjoin_out").collect().map(key).toSet
    val batch = Streams.intervalJoinStreams(clicks.toDF(), purchases.toDF())
      .collect().map(key).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("transformWithState accumulates across micro-batches (RocksDB state)") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[graft.streaming.UserEvt]
      val q = Streams.runningStatsTws(src.toDF())
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      try {
        src.addData(graft.streaming.UserEvt(1L, "click", 1.5),
          graft.streaming.UserEvt(1L, "view", 2.5),
          graft.streaming.UserEvt(2L, "click", 3.9))
        q.processAllAvailable()
        src.addData(graft.streaming.UserEvt(1L, "click", 10.0))
        q.processAllAvailable()
        val rows = spark.table("tws_out").collect()
        // update mode: one emission per seen user per batch. User 1's
        // second emission must CONTINUE from RocksDB state: count 3,
        // floor-sum 1+2+10, still 2 distinct types.
        val u1 = rows.filter(_.getLong(0) == 1L)
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        assert(u1 == Set((2L, 3L, 2L), (3L, 13L, 2L)), rows.mkString("; "))
        val u2 = rows.filter(_.getLong(0) == 2L)
        assert(u2.length == 1 && u2.head.getLong(1) == 1L &&
          u2.head.getLong(2) == 3L && u2.head.getLong(3) == 1L)
      } finally q.stop()
      // batch mode over the same rows reproduces the final per-user state
      val batch = Streams.runningStatsTws(Seq(
        graft.streaming.UserEvt(1L, "click", 1.5),
        graft.streaming.UserEvt(1L, "view", 2.5),
        graft.streaming.UserEvt(2L, "click", 3.9),
        graft.streaming.UserEvt(1L, "click", 10.0)).toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(batch == Set((1L, 3L, 13L, 2L), (2L, 1L, 3L, 1L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("outer interval join emits the null row exactly at state expiry") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000L)

    val cs = MemoryStream[ClickEv]
    val ps = MemoryStream[PurchEv]
    val q = Streams.outerIntervalJoinStreams(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("oj_out")
      .outputMode("append").start()
    try {
      // batch 1: click 100 has NO purchase within its hour; click 101
      // is matched 60 s later. Only the match can be emitted now — the
      // null row for 100 is unprovable until the watermark passes
      // c_ts + 1 h.
      cs.addData(ClickEv(1L, 100L, ts(0)), ClickEv(2L, 101L, ts(0)))
      ps.addData(PurchEv(2L, 201L, 9.99, ts(60)))
      q.processAllAvailable()
      val afterB1 = spark.table("oj_out").collect()
      assert(afterB1.length == 1 && afterB1.head.getLong(2) == 201L)

      // batch 2: advance BOTH sides 3 h (global watermark = min across
      // sources) → watermark ≈ t0 + 2 h 50 min > t0 + 1 h, so click
      // 100's state expires and its null row MUST be emitted. The
      // advancer pair matches too.
      cs.addData(ClickEv(3L, 102L, ts(3 * 3600)))
      ps.addData(PurchEv(3L, 202L, 1.0, ts(3 * 3600 + 5)))
      q.processAllAvailable()
      val rows = spark.table("oj_out").collect()
      assert(rows.length == 3, rows.mkString("; "))
      val nullRows = rows.filter(_.isNullAt(2))
      assert(nullRows.length == 1 && nullRows.head.getLong(1) == 100L &&
        nullRows.head.isNullAt(3) && nullRows.head.isNullAt(5))
    } finally q.stop()

    // Batch mode over the same rows produces the same multiset (the
    // null row needs no watermark proof when the input is finite).
    val clicks = Seq(ClickEv(1L, 100L, ts(0)), ClickEv(2L, 101L, ts(0)),
      ClickEv(3L, 102L, ts(3 * 3600)))
    val purchases = Seq(PurchEv(2L, 201L, 9.99, ts(60)),
      PurchEv(3L, 202L, 1.0, ts(3 * 3600 + 5)))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    val batch = Streams.outerIntervalJoinStreams(clicks.toDF(), purchases.toDF())
      .collect().map(key).toSet
    val streamed = spark.table("oj_out").collect().map(key).toSet
    assert(batch == streamed)
  }

  test("FULL OUTER interval join: both sides' null rows emit at expiry; batch parity") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000L)

    val cs = MemoryStream[ClickEv]
    val ps = MemoryStream[PurchEv]
    val q = Streams.fullOuterIntervalJoinStreams(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("foj_out")
      .outputMode("append").start()
    try {
      // click 100 never matches; purchase 300 never matches (user 9);
      // click 101 matches purchase 201.
      cs.addData(ClickEv(1L, 100L, ts(0)), ClickEv(2L, 101L, ts(0)))
      ps.addData(PurchEv(2L, 201L, 9.99, ts(60)), PurchEv(9L, 300L, 5.0, ts(0)))
      q.processAllAvailable()
      assert(spark.table("foj_out").collect().count(r => !r.isNullAt(1) && !r.isNullAt(2)) == 1)

      // advance both watermarks past every bound → BOTH unmatched rows
      // must appear: the click-side null row AND the purchase-side one
      cs.addData(ClickEv(3L, 102L, ts(3 * 3600)))
      ps.addData(PurchEv(3L, 202L, 1.0, ts(3 * 3600 + 5)))
      q.processAllAvailable()
      val rows = spark.table("foj_out").collect()
      val clickNull = rows.filter(r => !r.isNullAt(1) && r.isNullAt(2))
      val purchNull = rows.filter(r => r.isNullAt(1) && !r.isNullAt(2))
      assert(clickNull.map(_.getLong(1)).toSet == Set(100L),
        rows.mkString("; "))
      assert(purchNull.map(_.getLong(2)).toSet == Set(300L),
        rows.mkString("; "))
    } finally q.stop()

    // batch parity over the same rows
    val clicks = Seq(ClickEv(1L, 100L, ts(0)), ClickEv(2L, 101L, ts(0)),
      ClickEv(3L, 102L, ts(3 * 3600)))
    val purchases = Seq(PurchEv(2L, 201L, 9.99, ts(60)),
      PurchEv(9L, 300L, 5.0, ts(0)), PurchEv(3L, 202L, 1.0, ts(3 * 3600 + 5)))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))
    val batch = Streams.fullOuterIntervalJoinStreams(clicks.toDF(), purchases.toDF())
      .collect().map(key).toSet
    val streamed = spark.table("foj_out").collect().map(key).toSet
    assert(batch == streamed)
  }

  test("interval join: late rows past the watermark are dropped, state evicted") {
    val spark = sparkSession
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(offsetSec: Long) = new Timestamp(t0 + offsetSec * 1000L)

    val cs = MemoryStream[ClickEv]
    val ps = MemoryStream[PurchEv]
    val q = Streams.intervalJoinStreams(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      // batch 1: one matching click/purchase pair at t0. Watermark after
      // this batch is max event time - 10 min ≈ t0 - 9 min.
      cs.addData(ClickEv(1L, 100L, ts(0)))
      ps.addData(PurchEv(1L, 200L, 9.99, ts(60)))
      q.processAllAvailable()
      assert(spark.table("wm_out").count() == 1)

      // batch 2: advance BOTH sides 3 h (global watermark is the min
      // across sources) → watermark becomes ≈ t0 + 2 h 50 min, far past
      // the pair's state-retention bound (c_ts + 1 h join interval).
      // The advancer pair also matches, adding one output row.
      cs.addData(ClickEv(2L, 101L, ts(3 * 3600)))
      ps.addData(PurchEv(2L, 201L, 1.0, ts(3 * 3600 + 5)))
      q.processAllAvailable()
      assert(spark.table("wm_out").count() == 2)

      // batch 3: a purchase 30 s after t0 that WOULD match click 100 —
      // it is now hours behind the watermark and must be dropped before
      // the join, producing no output and touching no state.
      ps.addData(PurchEv(1L, 202L, 5.0, ts(30)))
      q.processAllAvailable()
      assert(spark.table("wm_out").count() == 2)

      val stateProgs = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
      // the late purchase was dropped by the watermark filter…
      assert(stateProgs.map(_.numRowsDroppedByWatermark).sum >= 1)
      // …and batch 1's rows were physically removed from the join state
      assert(stateProgs.map(_.numRowsRemoved).sum >= 2)
      // only the advancer pair remains in state (one row per side)
      assert(stateProgs.last.numRowsTotal == 2)
    } finally q.stop()
  }
}
