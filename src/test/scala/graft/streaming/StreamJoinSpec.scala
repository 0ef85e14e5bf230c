package graft.streaming

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Stream–stream interval join: window/boundary semantics, cross-batch
  * matching, and agreement with the batch form of the same join.
  */
class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def mkStream() = MemoryStream[(Long, Long, Timestamp)](
    org.apache.spark.sql.Encoders.product[(Long, Long, Timestamp)], spark.sqlContext)

  test("clicks within the window before an error match; later/older clicks don't") {
    val clicks = mkStream()
    val errors = mkStream()
    val joined = StreamJoin.clicksBeforeErrors(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      errors.toDF().toDF("event_id", "user_id", "ts"))
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        (100L, 1L, ts("2024-01-01 09:00:00")), // 30 min before error: boundary, in
        (101L, 1L, ts("2024-01-01 09:20:00")), // in window
        (102L, 1L, ts("2024-01-01 08:20:00")), // too old
        (103L, 2L, ts("2024-01-01 09:25:00"))) // other user
      q.processAllAvailable()
      errors.addData((200L, 1L, ts("2024-01-01 09:30:00")))
      q.processAllAvailable()
      // a click AFTER the error, arriving in a later batch, must not match
      clicks.addData((104L, 1L, ts("2024-01-01 09:31:00")))
      q.processAllAvailable()

      val got = spark.table("sj_out")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        (200L, 1L, 100L, 30L * 60 * 1000000),
        (200L, 1L, 101L, 10L * 60 * 1000000)), s"got $got")
    } finally q.stop()
  }

  test("left_outer: unmatched errors emit with NULL click only after the watermark") {
    val clicks = mkStream(); val errors = mkStream()
    val q = StreamJoin.clicksBeforeErrors(
        clicks.toDF().toDF("event_id", "user_id", "ts"),
        errors.toDF().toDF("event_id", "user_id", "ts"),
        joinType = "left_outer")
      .writeStream.format("memory").queryName("sj_outer")
      .outputMode(OutputMode.Append).start()
    try {
      errors.addData((200L, 1L, ts("2024-01-01 09:30:00"))) // no click anywhere
      clicks.addData((100L, 2L, ts("2024-01-01 09:29:00"))) // other user
      q.processAllAvailable()
      val early = spark.table("sj_outer").count()
      assert(early == 0, s"unmatched error must be held until the watermark, got $early rows")

      // advance BOTH watermarks far past 09:30 + window + lateness
      errors.addData((201L, 9L, ts("2024-01-01 12:00:00")))
      clicks.addData((101L, 9L, ts("2024-01-01 11:59:00")))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.table("sj_outer")
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(rows.contains((200L, 1L, None, None)),
        s"closed unmatched error must emit with NULL click: $rows")
      assert(rows.contains((201L, 9L, Some(101L), Some(60L * 1000000))),
        s"matched pair must emit normally: $rows")
    } finally q.stop()
  }

  test("streaming result equals the batch join of the same data") {
    val clickRows = Seq(
      (100L, 1L, ts("2024-01-01 09:00:00")), (101L, 1L, ts("2024-01-01 09:20:00")),
      (102L, 2L, ts("2024-01-01 10:00:00")), (103L, 2L, ts("2024-01-01 11:00:00")))
    val errorRows = Seq(
      (200L, 1L, ts("2024-01-01 09:30:00")), (201L, 2L, ts("2024-01-01 10:15:00")),
      (202L, 3L, ts("2024-01-01 10:00:00")))

    val batch = StreamJoin.clicksBeforeErrors(
        clickRows.toDF("event_id", "user_id", "ts"),
        errorRows.toDF("event_id", "user_id", "ts"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val clicks = mkStream(); val errors = mkStream()
    val q = StreamJoin.clicksBeforeErrors(
        clicks.toDF().toDF("event_id", "user_id", "ts"),
        errors.toDF().toDF("event_id", "user_id", "ts"))
      .writeStream.format("memory").queryName("sj_eq")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(clickRows.take(2)); errors.addData(errorRows.take(1))
      q.processAllAvailable()
      clicks.addData(clickRows.drop(2)); errors.addData(errorRows.drop(1))
      q.processAllAvailable()
      val streamed = spark.table("sj_eq").as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
