package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ingest seam (SURVEY §7.1): every stage downstream of the source is
  * written against a DataFrame with a `value` column, so the Kafka source
  * is swappable for file/memory stand-ins — mirroring the reference's own
  * seam (`get_streaming_dataframe` / `transform_streaming_data` /
  * `initiate_streaming_to_bucket` are separate functions,
  * spark/app/spark_processing.py:117-162). The test environment has no
  * spark-sql-kafka jar, so [[KafkaRawSource]] is config-only: constructed
  * and compiled here, exercised only on a real cluster.
  */
trait RawSource {
  /** An unbounded DataFrame with (at least) a `value` column. */
  def stream(spark: SparkSession): DataFrame
}

/** S4 (spark_processing.py:117-128): Kafka streaming source with the
  * reference's exact options — earliest offsets, tolerate data loss. */
final case class KafkaRawSource(
    brokers: String,
    topic: String,
    startingOffsets: String = "earliest",
    failOnDataLoss: Boolean = false) extends RawSource {
  override def stream(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", failOnDataLoss.toString)
      .load()
}

/** File-based stand-in: JSON-lines files appear in a directory; each line
  * becomes a string `value` row (same shape the Kafka source exposes after
  * CAST). maxFilesPerTrigger bounds micro-batch size the way
  * maxOffsetsPerTrigger would on Kafka. */
final case class FileLinesSource(dir: String, maxFilesPerTrigger: Option[Int] = None)
    extends RawSource {
  override def stream(spark: SparkSession): DataFrame = {
    val r = spark.readStream
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.text(dir)
  }
}
