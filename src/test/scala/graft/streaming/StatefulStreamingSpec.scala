package graft.streaming

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stateful streaming semantics: watermarked tumbling windows (append mode
  * finalizes closed windows, drops too-late rows) and gap sessionization
  * via flatMapGroupsWithState (sessions emitted on event-time timeout;
  * batch window-function form agrees on the same data).
  */
class StatefulStreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed agg: append emits a window only after the watermark closes it") {
    val input = MemoryStream[(Timestamp, String, Double)](
      org.apache.spark.sql.Encoders.product[(Timestamp, String, Double)], spark.sqlContext)
    val agg = WindowedAgg.streamingByType(
      input.toDF().toDF("ts", "event_type", "value"), "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("wa_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts("2024-01-01 09:10:00"), "view", 1.0), (ts("2024-01-01 09:20:00"), "view", 2.0))
      q.processAllAvailable()
      // watermark = 09:20 - 10min = 09:10 < 10:00 → nothing final yet
      assert(spark.table("wa_out").count() == 0)

      input.addData((ts("2024-01-01 11:00:00"), "click", 5.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 11:30:00"), "click", 6.0)) // push watermark past 10:00
      q.processAllAvailable()
      val rows = spark.table("wa_out")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set((ts("2024-01-01 09:00:00"), "view", 2L, 3.0)),
        s"only the closed 09:00 window may emit, got $rows")

      // a row far behind the watermark (>10 min late) must be dropped
      input.addData((ts("2024-01-01 09:40:00"), "view", 99.0))
      input.addData((ts("2024-01-01 13:30:00"), "click", 7.0)) // close the 11:00 window
      q.processAllAvailable()
      val all = spark.table("wa_out")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(all == Set(
        (ts("2024-01-01 09:00:00"), "view", 2L, 3.0),
        (ts("2024-01-01 11:00:00"), "click", 2L, 11.0)),
        s"late 09:40 row must be dropped and 11:00 window must close: $all")
    } finally q.stop()
  }

  test("streaming session_window: cross-batch merge, append emits behind the watermark") {
    val input = MemoryStream[(Long, Timestamp, Double)](
      org.apache.spark.sql.Encoders.product[(Long, Timestamp, Double)], spark.sqlContext)
    val sessions = WindowedAgg.streamingByUserSession(
      input.toDF().toDF("user_id", "ts", "value"), "30 minutes", "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sw_out")
      .outputMode(OutputMode.Append).start()
    try {
      // two events 20 min apart arrive in DIFFERENT batches → one session
      input.addData((1L, ts("2024-01-01 09:00:00"), 1.0))
      q.processAllAvailable()
      input.addData((1L, ts("2024-01-01 09:20:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("sw_out").count() == 0, "session still open — nothing emits")

      // advance the watermark past the session end (09:50)
      input.addData((2L, ts("2024-01-01 11:00:00"), 5.0))
      q.processAllAvailable()
      val rows = spark.table("sw_out")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(rows == Set(
        (1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:50:00"), 2L, 3.0)),
        s"the merged cross-batch session must emit once closed: $rows")
    } finally q.stop()
  }

  test("sessionize: sessions split on gap and emit on event-time timeout") {
    val input = MemoryStream[Sessionize.Event](
      org.apache.spark.sql.Encoders.product[Sessionize.Event], spark.sqlContext)
    val q = Sessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // burst 1: two events 10 min apart; burst 2 for another user
      input.addData(
        Sessionize.Event(1L, ts("2024-01-01 09:00:00"), 1.0),
        Sessionize.Event(1L, ts("2024-01-01 09:10:00"), 2.0),
        Sessionize.Event(2L, ts("2024-01-01 09:05:00"), 7.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0, "open sessions must not emit")

      // user 1 returns 3 h later: same batch closes the old session once
      // the watermark (max 12:00 − 1 h lateness = 11:00) passes 09:40
      input.addData(Sessionize.Event(1L, ts("2024-01-01 12:00:00"), 3.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(1L, ts("2024-01-01 14:00:00"), 0.0)) // advance watermark again
      q.processAllAvailable()

      val sessions = spark.table("sess_out").as[Sessionize.Session].collect()
        .map(s => (s.user_id, s.session_start, s.n_events, s.sum_value)).toSet
      assert(sessions.contains((1L, ts("2024-01-01 09:00:00"), 2L, 3.0)),
        s"user 1's first session must close with both events: $sessions")
      assert(sessions.contains((2L, ts("2024-01-01 09:05:00"), 1L, 7.0)),
        s"user 2's single-event session must close: $sessions")
    } finally q.stop()
  }

  test("gapMerge: interval coalescing laws (pure function)") {
    import Sessionize.{gapMerge, SessionAgg}
    val gap = 100L
    def s(a: Long, b: Long, n: Long = 1, v: Double = 1.0) = SessionAgg(a, b, n, v)
    // empty and singleton are fixed points
    assert(gapMerge(Nil, gap) == Nil)
    assert(gapMerge(List(s(5, 9)), gap) == List(s(5, 9)))
    // chain within gap collapses to one session with summed aggregates
    assert(gapMerge(List(s(0, 0), s(50, 50), s(140, 140)), gap) ==
      List(SessionAgg(0, 140, 3, 3.0)))
    // gap exceeded → split exactly there
    assert(gapMerge(List(s(0, 0), s(101, 101)), gap) == List(s(0, 0), s(101, 101)))
    assert(gapMerge(List(s(0, 0), s(100, 100)), gap) == List(SessionAgg(0, 100, 2, 2.0)))
    // an interval that lands INSIDE an open session merges and widens nothing
    assert(gapMerge(List(s(0, 200, 5, 5.0), s(50, 50)), gap) ==
      List(SessionAgg(0, 200, 6, 6.0)))
    // an early point chains through a middle point into the open session
    assert(gapMerge(List(s(0, 0), s(90, 90), s(150, 300, 2, 2.0)), gap) ==
      List(SessionAgg(0, 300, 4, 4.0)))
  }

  test("sessionize: late cross-batch event before session start widens session_start") {
    val input = MemoryStream[Sessionize.Event](
      org.apache.spark.sql.Encoders.product[Sessionize.Event], spark.sqlContext)
    val q = Sessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Sessionize.Event(1L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // 09:45 arrives a batch later: within the 1 h lateness (watermark is
      // 09:00) and within the gap BEFORE the open session's start — batch
      // semantics put it in the same session, widening session_start
      input.addData(Sessionize.Event(1L, ts("2024-01-01 09:45:00"), 2.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(1L, ts("2024-01-01 13:00:00"), 0.0)) // push watermark to 12:00
      q.processAllAvailable()
      val sessions = spark.table("sess_late").as[Sessionize.Session].collect()
        .map(s => (s.session_start, s.session_end, s.n_events, s.sum_value)).toSet
      assert(sessions == Set((ts("2024-01-01 09:45:00"), ts("2024-01-01 10:00:00"), 2L, 3.0)),
        s"late 09:45 event must join and widen the 10:00 session: $sessions")
    } finally q.stop()
  }

  test("sessionize: late event more than a gap before the open session closes separately") {
    val input = MemoryStream[Sessionize.Event](
      org.apache.spark.sql.Encoders.product[Sessionize.Event], spark.sqlContext)
    val q = Sessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sess_sep")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Sessionize.Event(1L, ts("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      // 09:40 is 50 min before the open session's start: a DISTINCT
      // session under the gap rule (the old end-only test glued it in,
      // since 09:40 − 10:30 is negative and so ≤ gap)
      input.addData(Sessionize.Event(1L, ts("2024-01-01 09:40:00"), 2.0))
      q.processAllAvailable()
      input.addData(Sessionize.Event(1L, ts("2024-01-01 13:00:00"), 0.0)) // push watermark to 12:00
      q.processAllAvailable()
      val sessions = spark.table("sess_sep").as[Sessionize.Session].collect()
        .map(s => (s.session_start, s.n_events, s.sum_value)).toSet
      assert(sessions == Set(
        (ts("2024-01-01 09:40:00"), 1L, 2.0),
        (ts("2024-01-01 10:30:00"), 1L, 1.0)),
        s"09:40 must close as its own session, not merge into 10:30: $sessions")
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys across micro-batches land once") {
    val input = MemoryStream[(Long, Timestamp, Double)](
      org.apache.spark.sql.Encoders.product[(Long, Timestamp, Double)], spark.sqlContext)
    val deduped = StreamDedup.exactWithinWatermark(
      input.toDF().toDF("event_id", "ts", "value")
        .withWatermark("ts", "10 minutes"),
      Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, ts("2024-01-01 09:00:00"), 1.0), (2L, ts("2024-01-01 09:01:00"), 2.0))
      q.processAllAvailable()
      // same key replayed in a later batch within the watermark window
      input.addData((1L, ts("2024-01-01 09:02:00"), 1.0), (3L, ts("2024-01-01 09:03:00"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dd_out").select("event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L), s"duplicate must be dropped: $ids")
    } finally q.stop()
  }

  test("native session_window: bounds, exact-gap boundary, and agreement with sessionize") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, "a", 1.0),
      (2L, ts("2024-01-01 09:10:00"), 10L, "a", 2.0),
      (3L, ts("2024-01-01 11:00:00"), 10L, "a", 3.0), // > gap → new session
      (4L, ts("2024-01-01 09:05:00"), 20L, "a", 7.0),
      // exactly one gap after: the touching windows [09:05, 09:35) and
      // [09:35, 10:05) MERGE (diff == gap stays in-session — verified
      // empirically; the same boundary rule as Sessionization's
      // `diff > gap → new`, so the two operators agree everywhere)
      (5L, ts("2024-01-01 09:35:00"), 20L, "a", 8.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = WindowedAgg.byUserSessionWindow(events, "30 minutes")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
    assert(got == Set(
      (10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:40:00"), 2L, 3.0),
      (10L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00"), 1L, 3.0),
      (20L, ts("2024-01-01 09:05:00"), ts("2024-01-01 10:05:00"), 2L, 15.0)),
      s"got $got")
    // cross-check against the custom sessionizer on real data: same
    // (user, start) set, native end = custom last-event end + gap
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val native = WindowedAgg.byUserSessionWindow(ev, "30 minutes")
      .select($"user_id", $"session_start", $"session_end", $"n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    val custom = graft.operators.Sessionization.sessionize(spark, dir)
      .select($"user_id", $"session_start",
        ($"session_end" + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
          .as("session_end"), $"n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(native == custom)
  }

  test("batch sessionization (window-function form) agrees with the gap rule") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L, "a", 1.0),
      (2L, ts("2024-01-01 09:10:00"), 10L, "a", 2.0),
      (3L, ts("2024-01-01 11:00:00"), 10L, "a", 3.0), // > 30 min gap → new session
      (4L, ts("2024-01-01 09:05:00"), 20L, "a", 7.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.Sessionization.sessionize(events)
      .select("user_id", "session_id", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((10L, 1L, 2L, 3.0), (10L, 2L, 1L, 3.0), (20L, 1L, 1L, 7.0)))
  }
}
