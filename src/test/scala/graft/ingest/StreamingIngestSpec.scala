package graft.ingest

import graft.SparkTestBase
import graft.model.Schemas
import graft.sources.FileLinesSource
import graft.streaming.StreamSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics the reference pins down (SURVEY §2.4): append mode,
  * checkpointed exactly-once restart, malformed-JSON behavior in both
  * PERMISSIVE (from_json parity) and strict (Athena
  * ignore.malformed.json parity) modes.
  */
class StreamingIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val good1 = """{"event_id":1,"user_id":10,"event_type":"view","value":1.5}"""
  private val good2 = """{"event_id":2,"user_id":20,"event_type":"click","value":2.5}"""
  private val bad = """{"event_id":3,  NOT JSON"""

  test("append-mode parse→parquet sink lands each micro-batch exactly once") {
    val input = MemoryStream[String](org.apache.spark.sql.Encoders.STRING, spark.sqlContext)
    val parsed = Parse.parse(input.toDF(), Schemas.eventRecord)
    val out = tmp("ss_out_"); val ckpt = tmp("ss_ckpt_")
    val q = StreamSink.start(parsed, out, ckpt)
    try {
      input.addData(good1)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 1)
      input.addData(good2)
      q.processAllAvailable()
      val rows = spark.read.parquet(out).orderBy("event_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      assert(rows.head.getString(2) == "view" && rows.head.getDouble(3) == 1.5)
    } finally q.stop()
  }

  test("checkpoint restart: no duplicates, no loss (exactly-once file sink)") {
    val input = MemoryStream[String](org.apache.spark.sql.Encoders.STRING, spark.sqlContext)
    val parsed = Parse.parse(input.toDF(), Schemas.eventRecord)
    val out = tmp("cr_out_"); val ckpt = tmp("cr_ckpt_")

    val q1 = StreamSink.start(parsed, out, ckpt)
    input.addData(good1)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() == 1)

    // Restart from the same checkpoint; only the new record may land.
    input.addData(good2)
    val q2 = StreamSink.start(parsed, out, ckpt)
    try {
      q2.processAllAvailable()
      val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L), s"restart must not duplicate or drop: got $ids")
    } finally q2.stop()
  }

  test("malformed JSON: PERMISSIVE yields an all-NULL row, strict drops it") {
    val df = Seq(good1, bad).toDF("value")
    val permissive = Parse.parse(df, Schemas.eventRecord).collect()
    assert(permissive.length == 2)
    assert(permissive.count(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)) == 1)

    val strict = Parse.parse(df, Schemas.eventRecord, strict = true).collect()
    assert(strict.length == 1 && strict.head.getLong(0) == 1L)
  }

  test("missing fields parse to NULL columns, not errors (PERMISSIVE parity)") {
    val df = Seq("""{"event_id":7}""").toDF("value")
    val row = Parse.parse(df, Schemas.eventRecord).collect().head
    assert(row.getLong(0) == 7L && row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
  }

  test("file-lines source drains via AvailableNow and is re-drainable from checkpoint") {
    val inDir = tmp("fl_in_"); val out = tmp("fl_out_"); val ckpt = tmp("fl_ckpt_")
    Seq(good1, good2).toDF("value").coalesce(1).write.mode("append").text(inDir)
    val parsed = Parse.parse(FileLinesSource(inDir).stream(spark), Schemas.eventRecord)
    StreamSink.drainAvailable(parsed, out, ckpt)
    assert(spark.read.parquet(out).count() == 2)

    // New file appears; a second drain from the same checkpoint picks up
    // only the delta.
    Seq("""{"event_id":9,"user_id":90,"event_type":"view","value":9.9}""")
      .toDF("value").coalesce(1).write.mode("append").text(inDir)
    StreamSink.drainAvailable(parsed, out, ckpt)
    val ids = spark.read.parquet(out).select("event_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 9L))
  }

  test("toJsonValue → parse round-trips rows (P10 ∘ P2 = id)") {
    val src = Seq((1L, 10L, "view", 1.5), (2L, 20L, "click", 2.5))
      .toDF("event_id", "user_id", "event_type", "value")
    val back = Parse.parse(Parse.toJsonValue(src), Schemas.eventRecord)
    assert(back.orderBy("event_id").collect().toSeq == src.orderBy("event_id").collect().toSeq)
  }
}
