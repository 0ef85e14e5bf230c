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

  def write(df: DataFrame, brokers: String, topic: String): Unit =
    Parse.toJsonValue(df)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()

  def writeStream(df: DataFrame, brokers: String, topic: String, checkpoint: String): StreamingQuery =
    Parse.toJsonValue(df)
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()
}
