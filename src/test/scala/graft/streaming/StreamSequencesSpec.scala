package graft.streaming

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming per-user histories: arrival-order insensitivity — after any
  * interleaving of (late, out-of-order) arrivals across micro-batches,
  * the latest emitted history per user equals the batch operator on the
  * same event set.
  */
class StreamSequencesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("histories converge to the batch answer under out-of-order arrivals") {
    val all = Seq(
      // user 1: five events; maxLen=3 keeps a,b,c regardless of arrival order
      StreamSequences.Event(1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:01"), 2L, "b"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:02"), 3L, "c"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:03"), 4L, "d"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:04"), 5L, "e"),
      // user 2: short complete history
      StreamSequences.Event(2L, ts("2024-01-01 11:00:00"), 6L, "x"),
      StreamSequences.Event(2L, ts("2024-01-01 11:00:01"), 7L, "y"),
    )
    // batch 1 delivers LATER events first; the head event (id 1) arrives
    // last, in batch 2 — it must displace the provisional head
    val batch1 = Seq(all(3), all(4), all(1), all(6))
    val batch2 = Seq(all(0), all(2), all(5))

    val input = MemoryStream[StreamSequences.Event](
      org.apache.spark.sql.Encoders.product[StreamSequences.Event], spark.sqlContext)
    val q = StreamSequences.userHistories(input.toDS(), maxLen = 3)
      .writeStream.format("memory").queryName("ss_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      // mid-stream: user 1's provisional head is (b, d, e) — no a/c yet
      val mid = spark.table("ss_out")
        .as[(Long, Long, Long, String)].collect()
        .filter(_._1 == 1L).maxBy(_._2)
      assert(mid == ((1L, 3L, 3L, "b|d|e")), s"got $mid")

      input.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("ss_out")
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
      // ground truth: the batch operator over the full event set
      val want = graft.operators.Analytics.userEventSequences(
        all.toDF("user_id", "ts", "event_id", "event_type"), maxLen = 3)
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == want, s"stream $got != batch $want")
      assert(want.contains((1L, 5L, 3L, "a|b|c")))
    } finally q.stop()
  }

  test("landed latest-history table equals the batch operator across restarts") {
    val all = Seq(
      StreamSequences.Event(1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:01"), 2L, "b"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:02"), 3L, "c"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:03"), 4L, "d"),
      StreamSequences.Event(1L, ts("2024-01-01 10:00:04"), 5L, "e"),
      StreamSequences.Event(2L, ts("2024-01-01 11:00:00"), 6L, "x"),
      StreamSequences.Event(2L, ts("2024-01-01 11:00:01"), 7L, "y"),
      StreamSequences.Event(3L, ts("2024-01-01 12:00:00"), 8L, "z"),
    )
    val dir = java.nio.file.Files.createTempDirectory("seq-snap").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("seq-ckpt").toFile.getAbsolutePath
    val input = MemoryStream[StreamSequences.Event](
      org.apache.spark.sql.Encoders.product[StreamSequences.Event], spark.sqlContext)
    def runOnce(): Unit = {
      val q = StreamSequences.startLanded(input.toDS(), maxLen = 3, dir, ckpt)
      q.awaitTermination()
    }
    def landed(): Set[(Long, Long, Long, String)] =
      StreamSequences.latestHistories(spark, dir)
        .select("user_id", "n_events", "seq_len", "seq")
        .as[(Long, Long, Long, String)].collect().toSet
    def batchWant(events: Seq[StreamSequences.Event]): Set[(Long, Long, Long, String)] =
      graft.operators.Analytics.userEventSequences(
        events.toDF("user_id", "ts", "event_id", "event_type"), maxLen = 3)
        .as[(Long, Long, Long, String)].collect().toSet

    // out-of-order delivery, each batch in its own restarted query
    input.addData(all(3), all(4), all(1), all(6))
    runOnce()
    // mid-stream: landed table is exactly the batch answer on what arrived
    assert(landed() == batchWant(Seq(all(3), all(4), all(1), all(6))))

    input.addData(all(0), all(2), all(5))
    runOnce()
    input.addData(all(7))
    runOnce()
    assert(landed() == batchWant(all), "landed table must equal the batch fold")
    // one row per user, queryable directly
    assert(StreamSequences.latestHistories(spark, dir).count() == 3)
    // the landed __seq/__op plumbing columns must not leak into the table
    assert(StreamSequences.latestHistories(spark, dir).columns.toSet ==
      Set("user_id", "n_events", "seq_len", "seq"))

    // transitions served off the heads equal the pairs of the batch
    // operator's sequences — out-of-order safe by construction (the
    // arrivals above were deliberately shuffled)
    val wantPairs = batchWant(all).toSeq
      .flatMap { case (_, _, _, seq) =>
        val s = seq.split('|').toSeq
        s.zip(s.drop(1))
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotPairs = StreamSequences.transitions(spark, dir)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotPairs == wantPairs, s"got $gotPairs want $wantPairs")
    // the streamed stationary mix equals the power-iteration tail over
    // exactly those counts
    // all head tokens, including pairless singleton users (user 3's "z")
    val types = batchWant(all).toSeq
      .flatMap(_._4.split('|').toSeq).filter(_.nonEmpty)
      .distinct.sorted.toArray
    val wantPi = graft.operators.Analytics.stationaryFromCounts(spark,
        wantPairs.map { case ((f, t), n) => (f, t, n) }.toArray, types, 5)
      .as[(String, Double)].collect().toSet
    val gotPi = StreamSequences.stationaryMix(spark, dir)
      .as[(String, Double)].collect().toSet
    assert(gotPi == wantPi)
  }
}
