package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{DoubleType, StringType, StructType}
import graft.ingest.Parse

/** Dead-letter routing: clean rows parse and land, malformed lines land
  * raw in the quarantine, and no input row is ever lost — across
  * micro-batches.
  */
class DeadLetterSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = new StructType()
    .add("name", StringType).add("latitude", DoubleType)

  test("clean rows land parsed; malformed lines land raw; rows conserve") {
    val tmp = Files.createTempDirectory("graft_dlq_").toString
    val (outDir, dlqDir, ckpt) = (s"$tmp/out", s"$tmp/dlq", s"$tmp/ckpt")

    val input = MemoryStream[String](
      org.apache.spark.sql.Encoders.STRING, spark.sqlContext)
    val tagged = Parse.parseTagged(input.toDF().toDF("value"), schema)
    val q = DeadLetter.start(tagged, outDir, dlqDir, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData(
        """{"name": "Ada", "latitude": 51.5}""",
        """{"name": "Bob"}""",             // missing field → NULL column, clean
        """not json at all""")             // malformed → dead letter
      q.processAllAvailable()
      input.addData(
        """{"name": "Cyd", "latitude": -3.25}""",
        """{"name": "Dee", "latitude": }""", // malformed → dead letter
        "   ")                               // blank line → dead letter, NOT a clean NULL row
      q.processAllAvailable()

      val clean = DeadLetter.cleanRows(spark, outDir)
        .as[(String, Option[Double])].collect().toSet
      assert(clean == Set(
        ("Ada", Some(51.5)), ("Bob", None), ("Cyd", Some(-3.25))))
      val dead = DeadLetter.deadLetters(spark, dlqDir)
        .as[String].collect().toSet
      // the RAW line is preserved byte-for-byte for replay-after-fix
      assert(dead == Set("not json at all", """{"name": "Dee", "latitude": }""", "   "))
      assert(clean.size + dead.size == 6, "input rows must conserve")
    } finally q.stop()
  }
}
