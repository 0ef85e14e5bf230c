package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** S5 (reference `initiate_streaming_to_bucket`,
  * spark/app/spark_processing.py:151-162): checkpointed append-mode file
  * sink. Upgraded newline-JSON → Parquet per BASELINE ("spark_approach"):
  * columnar at rest buys scan pruning for the whole query layer while the
  * commit protocol stays identical.
  *
  * Exactly-once: append mode + checkpointLocation gives Structured
  * Streaming's source-offset + file-sink-manifest protocol — on restart,
  * committed batches are skipped and half-written files are invisible to
  * readers (they're not in the manifest). The restart test in
  * StreamingIngestSpec pins this.
  *
  * Scale: `partitionCols` (e.g. an ingest date) implements the
  * partition-the-table tip the reference leaves unimplemented
  * (docs/athena-integrity-check.md:64); at 100 TB unpartitioned appends
  * make every downstream query a full scan.
  */
object StreamSink {

  def writer(
      df: DataFrame,
      path: String,
      checkpoint: String,
      format: String = "parquet",
      partitionCols: Seq[String] = Nil,
      trigger: Option[Trigger] = None): DataStreamWriter[Row] = {
    var w = df.writeStream
      .format(format)
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    trigger.foreach(t => w = w.trigger(t))
    w
  }

  /** Start and return the running query (prod shape: caller owns
    * `awaitTermination`, as the reference does at spark_processing.py:162). */
  def start(
      df: DataFrame,
      path: String,
      checkpoint: String,
      format: String = "parquet",
      partitionCols: Seq[String] = Nil): StreamingQuery =
    writer(df, path, checkpoint, format, partitionCols).start()

  /** Drain everything currently available, then return (batch-parity mode
    * used by Verify and tests — Trigger.AvailableNow processes the backlog
    * in bounded micro-batches and stops). */
  def drainAvailable(
      df: DataFrame,
      path: String,
      checkpoint: String,
      format: String = "parquet",
      partitionCols: Seq[String] = Nil): Unit = {
    val q = writer(df, path, checkpoint, format, partitionCols,
      trigger = Some(Trigger.AvailableNow())).start()
    q.awaitTermination()
  }
}
