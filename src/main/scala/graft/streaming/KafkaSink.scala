package graft.streaming

import graft.ingest.Parse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** S2: the producer's publish stage (reference `build_producer` +
  * `publish_once`, dags/producer/kafka_streaming_service.py:178-208) as a
  * Spark Kafka sink: rows → `to_json` wire values → `format("kafka")`.
  *
  * Config-only in this environment (no spark-sql-kafka jar; same seam as
  * [[graft.sources.KafkaRawSource]]) — compiled here, exercised on a real
  * cluster. Delivery guarantees map as: producer idempotence/acks=all →
  * the Kafka sink's producer configs; the reference's per-message delivery
  * callbacks and `flush(10)` are subsumed by Spark's task commit. Topic
  * admin (S3, `ensure_topic`) stays out-of-band: create the topic with
  * broker tooling, as the reference does from its DAG, not from the engine.
  */
object KafkaSink {

  /** Producer configuration, exact parity with the reference's
    * `build_producer` (dags/producer/kafka_streaming_service.py:180-188):
    * acks=all + idempotence (its delivery guarantee), gzip compression,
    * linger.ms=20 / batch.size=64000 (its batching shape) — expressed as
    * the `kafka.`-prefixed options Spark's sink forwards verbatim to the
    * underlying producer. Pure function: unit-testable without the
    * kafka jar. */
  def producerOptions(
      acks: String = "all",
      idempotence: Boolean = true,
      compression: String = "gzip",
      lingerMs: Int = 20,
      batchSize: Int = 64000): Map[String, String] = Map(
    "kafka.acks" -> acks,
    "kafka.enable.idempotence" -> idempotence.toString,
    "kafka.compression.type" -> compression,
    "kafka.linger.ms" -> lingerMs.toString,
    "kafka.batch.size" -> batchSize.toString)

  def write(df: DataFrame, brokers: String, topic: String): Unit =
    Parse.toJsonValue(df)
      .write.format("kafka")
      .options(producerOptions())
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()

  def writeStream(df: DataFrame, brokers: String, topic: String, checkpoint: String): StreamingQuery =
    Parse.toJsonValue(df)
      .writeStream.format("kafka")
      .options(producerOptions())
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
}
