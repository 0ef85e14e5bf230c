package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Analytics

/** Continuously-maintained anomaly baselines: the stream's current board
  * converges to the batch operator's answer on any event interleaving
  * (additive count state), and state compaction preserves merged counts
  * through its crash windows.
  */
class StreamAnomalySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("out-of-order micro-batches converge to the batch dailyAnomalies answer") {
    val tmp = Files.createTempDirectory("graft_sa_").toString
    val rows = Seq(
      // day 1: 2 views; day 2: 2; day 3: 4 — delivered SHUFFLED across
      // batches, with day-1 stragglers arriving after day-3 events
      (1L, ts("2024-01-01 10:00:01"), 1L, "view", 0.0),
      (2L, ts("2024-01-02 10:00:01"), 1L, "view", 0.0),
      (3L, ts("2024-01-03 10:00:01"), 1L, "view", 0.0),
      (4L, ts("2024-01-03 10:00:02"), 1L, "view", 0.0),
      (5L, ts("2024-01-01 10:00:02"), 1L, "view", 0.0), // late day-1
      (6L, ts("2024-01-02 10:00:02"), 1L, "view", 0.0),
      (7L, ts("2024-01-03 10:00:03"), 1L, "view", 0.0),
      (8L, ts("2024-01-03 10:00:04"), 1L, "view", 0.0),
    )
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](
      org.apache.spark.sql.Encoders
        .product[(Long, Timestamp, Long, String, Double)], spark.sqlContext)
    val q = StreamAnomaly.start(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      s"$tmp/state", s"$tmp/out", s"$tmp/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData(rows.take(4))
      q.processAllAvailable()
      input.addData(rows.drop(4))
      q.processAllAvailable()
    } finally q.stop()
    val got = StreamAnomaly.currentBoard(spark, s"$tmp/out")
      .as[(String, Timestamp, Long, Long, Option[Double])].collect().toSet
    val want = Analytics.dailyAnomalies(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .as[(String, Timestamp, Long, Long, Option[Double])].collect().toSet
    assert(got == want)
    assert(got.map(r => (r._2, r._3)) ==
      Set((ts("2024-01-01 00:00:00"), 2L), (ts("2024-01-02 00:00:00"), 2L),
        (ts("2024-01-03 00:00:00"), 4L)),
      "late day-1 events must fold into day 1, not a new row")
    // atomic publish: the marker names a committed board generation; at
    // most the current + previous board dirs remain
    val boards = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(boards.forall(_.startsWith("board-")) && boards.size <= 2, s"got $boards")
    assert(boards.contains(Generations.readMarker(spark, s"$tmp/out").get))
  }

  test("compactEvery hook: mid-stream compactions via the batch loop, board unchanged") {
    val tmp = Files.createTempDirectory("graft_sa_h_").toString
    val rows = (1 to 12).map(i =>
      (i.toLong, ts(f"2024-01-${(i % 4) + 1}%02d 10:00:0${i % 10}"), 1L, "view", 0.0))
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](
      org.apache.spark.sql.Encoders
        .product[(Long, Timestamp, Long, String, Double)], spark.sqlContext)
    // compact every 2nd batch, driven BY THE HOOK while the stream runs
    val q = StreamAnomaly.start(
      input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      s"$tmp/state", s"$tmp/out", s"$tmp/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      compactEvery = 2)
    try {
      rows.grouped(3).foreach { g => input.addData(g); q.processAllAvailable() }
    } finally q.stop()
    // ≥2 compaction cycles ran: a fold generation exists and live gens
    // are far fewer than the 4 raw batches would leave
    val live = StreamAnomaly.liveGens(spark, s"$tmp/state")
    assert(live.exists(_.startsWith("gen-compact-")), s"no fold in $live")
    // board equals the batch operator on everything delivered
    val got = StreamAnomaly.currentBoard(spark, s"$tmp/out")
      .as[(String, Timestamp, Long, Long, Option[Double])].collect().toSet
    val want = Analytics.dailyAnomalies(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .as[(String, Timestamp, Long, Long, Option[Double])].collect().toSet
    assert(got == want)
  }

  test("compactState folds all but the newest generation; merged counts unchanged") {
    val tmp = Files.createTempDirectory("graft_sa_c_").toString
    val stateDir = s"$tmp/state"
    (0 to 2).foreach { g =>
      Seq(("view", ts("2024-01-01 00:00:00"), 2L), ("view", ts("2024-01-02 00:00:00"), 1L))
        .toDF("event_type", "day", "n")
        .write.parquet(s"$stateDir/gen-$g")
    }
    val before = StreamAnomaly.mergedCounts(spark, stateDir)
      .as[(String, Timestamp, Long)].collect().toSet
    StreamAnomaly.compactState(spark, stateDir)
    val after = StreamAnomaly.mergedCounts(spark, stateDir)
      .as[(String, Timestamp, Long)].collect().toSet
    assert(after == before)
    val gens = java.nio.file.Files.list(java.nio.file.Paths.get(stateDir))
      .map(_.getFileName.toString).toArray.map(_.toString).toSet
    // gens 0 and 1 folded (manifest-excluded from every reader) but kept
    // on disk until the NEXT run's leftover sweep — deleting them in the
    // same run would race a concurrent board recompute that listed the
    // generations moments before the fold's rename; newest (gen-2) is
    // kept aside for replay safety
    assert(gens == Set("gen-compact-1", "gen-0", "gen-1", "gen-2"), s"got $gens")
    assert(StreamAnomaly.liveGens(spark, stateDir).toSet ==
      Set("gen-compact-1", "gen-2"))

    // fold-of-fold: a later compaction folds the prior fold + settled
    // gens, and counts still sum exactly once
    Seq(("view", ts("2024-01-01 00:00:00"), 2L)).toDF("event_type", "day", "n")
      .write.parquet(s"$stateDir/gen-3")
    StreamAnomaly.compactState(spark, stateDir)
    val after2 = StreamAnomaly.mergedCounts(spark, stateDir)
      .as[(String, Timestamp, Long)].collect().toSet
    assert(after2 == Set(
      ("view", ts("2024-01-01 00:00:00"), 8L),
      ("view", ts("2024-01-02 00:00:00"), 3L)))

    // CRASH/DEFERRED WINDOW: gen-2 (and gen-compact-1) are still on disk,
    // listed in gen-compact-2's manifest — exactly the state a crashed
    // post-fold delete leaves. EVERY reader must exclude them — the
    // per-batch board recompute (mergedCounts) immediately, and the next
    // compaction must sweep rather than double-fold them.
    Seq(("view", ts("2024-01-04 00:00:00"), 5L)).toDF("event_type", "day", "n")
      .write.parquet(s"$stateDir/gen-4")
    val duringCrashWindow = StreamAnomaly.mergedCounts(spark, stateDir)
      .as[(String, Timestamp, Long)].collect().toSet
    assert(duringCrashWindow == Set(
      ("view", ts("2024-01-01 00:00:00"), 8L),
      ("view", ts("2024-01-02 00:00:00"), 3L),
      ("view", ts("2024-01-04 00:00:00"), 5L)),
      "mergedCounts must exclude manifest-listed leftovers BEFORE any compaction runs")
    StreamAnomaly.compactState(spark, stateDir)
    val after3 = StreamAnomaly.mergedCounts(spark, stateDir)
      .as[(String, Timestamp, Long)].collect().toSet
    assert(after3 == Set(
      ("view", ts("2024-01-01 00:00:00"), 8L),
      ("view", ts("2024-01-02 00:00:00"), 3L),
      ("view", ts("2024-01-04 00:00:00"), 5L)))
  }
}
