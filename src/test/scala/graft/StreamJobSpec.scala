package graft

import java.nio.file.Files

/** The runnable job (entry point A parity): env-map assembly, file-source
  * stand-in, strict-mode drop, and the date-partitioned sink layout the
  * reference suggests but never implements.
  */
class StreamJobSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val goodName =
    """{"name":"Ms. Ada Lovelace","gender":"female","address":"12, High St","city":"London","nation":"UK","zip":"42","latitude":51.5,"longitude":-0.1,"email":"ada@example.com"}"""
  private val malformed = """{"name": BROKEN"""

  test("file-source job lands parsed records; strict drops malformed; partitioned by ingest_date") {
    val in = tmp("sj_in_"); val out = tmp("sj_out_"); val ckpt = tmp("sj_ckpt_")
    Seq(goodName, malformed).toDF("value").coalesce(1).write.mode("append").text(in)
    val q = StreamJob.start(spark, Map(
      "GRAFT_SOURCE_DIR" -> in,
      "GRAFT_OUT_PATH" -> out,
      "GRAFT_CHECKPOINT" -> ckpt,
      "GRAFT_STRICT" -> "true",
      "GRAFT_PARTITION_DATE" -> "true"))
    try {
      q.processAllAvailable()
      val landed = spark.read.parquet(out)
      val rows = landed.collect()
      assert(rows.length == 1, "strict mode must drop the malformed line")
      assert(landed.columns.contains("ingest_date"))
      assert(rows.head.getAs[String]("name") == "Ms. Ada Lovelace")
      // partition layout on disk: ingest_date=YYYY-MM-DD directories
      val partDirs = new java.io.File(out).listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("ingest_date="))
      assert(partDirs.nonEmpty, "sink must be laid out by partition column")
    } finally q.stop()
  }

  test("dead-letter mode quarantines the malformed line raw and lands the clean row") {
    val in = tmp("sjd_in_"); val out = tmp("sjd_out_")
    val dlq = tmp("sjd_dlq_"); val ckpt = tmp("sjd_ckpt_")
    Seq(goodName, malformed).toDF("value").coalesce(1).write.mode("append").text(in)
    val q = StreamJob.start(spark, Map(
      "GRAFT_SOURCE_DIR" -> in, "GRAFT_OUT_PATH" -> out,
      "GRAFT_CHECKPOINT" -> ckpt, "GRAFT_DLQ_DIR" -> dlq))
    try {
      q.processAllAvailable()
      val clean = graft.streaming.DeadLetter.cleanRows(spark, out).collect()
      assert(clean.length == 1 &&
        clean.head.getAs[String]("name") == "Ms. Ada Lovelace")
      val dead = graft.streaming.DeadLetter.deadLetters(spark, dlq)
        .as[String].collect().toSeq
      assert(dead == Seq(malformed), "the raw line must land byte-for-byte")
    } finally q.stop()
  }

  test("permissive (default) keeps malformed lines as all-NULL rows") {
    val in = tmp("sjp_in_"); val out = tmp("sjp_out_"); val ckpt = tmp("sjp_ckpt_")
    Seq(goodName, malformed).toDF("value").coalesce(1).write.mode("append").text(in)
    val q = StreamJob.start(spark, Map(
      "GRAFT_SOURCE_DIR" -> in, "GRAFT_OUT_PATH" -> out, "GRAFT_CHECKPOINT" -> ckpt))
    try {
      q.processAllAvailable()
      val landed = spark.read.parquet(out).collect()
      assert(landed.length == 2)
      assert(landed.count(_.isNullAt(0)) == 1)
    } finally q.stop()
  }
}
