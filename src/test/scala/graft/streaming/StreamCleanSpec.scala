package graft.streaming

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Continuous ingest hygiene: every drop path (eval overlap, corpus-known
  * content, in-stream duplicate) and the redaction rewrite, across
  * micro-batches.
  */
class StreamCleanSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream cleaning drops contaminated/known/duplicate arrivals and redacts the rest") {
    val evalSet = Seq("e1 e2 e3 e4 e5 e6 e7 e8").toDF("text")
    val corpusFps = Seq("already landed text").toDF("text")
      .select(md5(col("text").cast("binary")).as("fp"))

    val input = MemoryStream[(Timestamp, Long, String)](
      org.apache.spark.sql.Encoders.product[(Timestamp, Long, String)], spark.sqlContext)
    val cleaned = StreamClean.clean(
      input.toDF().toDF("ts", "doc_id", "text"),
      evalSet, corpusFps, "doc_id", "text", "ts", watermark = "10 minutes")
    val q = cleaned.writeStream.format("memory").queryName("sc_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L, "a fresh doc mail me a@b.io"),
        (ts("2024-01-01 09:00:10"), 2L, "x e1 e2 e3 e4 e5 e6 e7 e8 y"), // eval 8-gram → drop
        (ts("2024-01-01 09:00:20"), 3L, "already landed text"),          // corpus-known → drop
        (ts("2024-01-01 09:00:30"), 4L, "another fresh doc"))
      q.processAllAvailable()
      // a second micro-batch re-sends doc 4's text: in-stream dup → drop
      input.addData((ts("2024-01-01 09:05:00"), 5L, "another fresh doc"))
      q.processAllAvailable()
      val out = spark.table("sc_out").select("doc_id", "text")
        .as[(Long, String)].collect().toMap
      assert(out.keySet == Set(1L, 4L), s"got $out")
      assert(out(1L) == "a fresh doc mail me <EMAIL>")
      assert(out(4L) == "another fresh doc")
    } finally q.stop()
  }
}
