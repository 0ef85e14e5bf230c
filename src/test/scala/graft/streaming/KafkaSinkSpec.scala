package graft.streaming

import graft.SparkTestBase
import graft.ingest.Parse
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** The Kafka sink seam, tested up to the jar boundary: wire-format shape
  * (a single `value` string column, the contract Spark's Kafka sink
  * requires) and producer-config parity with the reference's
  * `build_producer` (dags/producer/kafka_streaming_service.py:180-188).
  */
class KafkaSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("producerOptions: reference build_producer parity, kafka.-prefixed") {
    val opts = KafkaSink.producerOptions()
    assert(opts == Map(
      "kafka.acks" -> "all",
      "kafka.enable.idempotence" -> "true",
      "kafka.compression.type" -> "gzip",
      "kafka.linger.ms" -> "20",
      "kafka.batch.size" -> "64000"))
    assert(opts.keys.forall(_.startsWith("kafka.")),
      "options must use the kafka. prefix Spark forwards to the producer")
    assert(KafkaSink.producerOptions(acks = "1", idempotence = false)("kafka.acks") == "1")
  }

  test("wire format: one string `value` column, round-trippable") {
    val df = Seq(("Ms. Jane Doe", "female")).toDF("name", "gender")
    val wire = Parse.toJsonValue(df)
    assert(wire.columns.toSeq == Seq("value"),
      "Kafka sink contract: exactly a value column")
    assert(wire.schema("value").dataType == StringType)
    val back = Parse.parse(
      wire.select(col("value").cast("binary").as("value")), df.schema)
    assert(back.as[(String, String)].collect().toSeq == Seq(("Ms. Jane Doe", "female")))
  }
}
