package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Dead-letter routing for the ingest parse — the quarantine the
  * reference's two malformed-input behaviors both lack: PERMISSIVE parity
  * turns a malformed line into an all-NULL row (poisoning downstream
  * NULL-semantics queries like Q3), and Athena-strict parity silently
  * DROPS it (docs/athena-integrity-check.md:38,44 — a feed regression
  * vanishes without a trace). Routing a
  * [[graft.ingest.Parse.parseTagged]] stream instead conserves every
  * input row: clean rows land as the parsed table, malformed rows land
  * raw (the original line, undamaged for replay-after-fix) in a
  * side-channel — one parse, one scan, both writes from the same cached
  * micro-batch.
  *
  * Durability: the [[Generations]] layout — both sinks write idempotent
  * per-batch-id Overwrites, so Spark's replay of the last uncommitted
  * batch rewrites both directories byte-identically; a crash between the
  * two writes is healed by the replay, and readers only see
  * `_SUCCESS`-committed generations. (The built-in file sink's manifest
  * protocol gives the same guarantee for ONE sink; two sinks from one
  * stream need either two queries — two scans, two parses — or this
  * foreachBatch split.)
  *
  * Scale shape: the split is two scan-side filters over one persisted
  * micro-batch — no shuffle anywhere; the dead-letter side is
  * empty-or-tiny in the healthy steady state (an empty generation is a
  * metadata-only write).
  */
object DeadLetter {

  /** Start routing `tagged` (a streaming DataFrame from
    * [[graft.ingest.Parse.parseTagged]]: schema columns + `corruptCol`).
    * Clean rows (corruptCol NULL) land under `outDir`, malformed rows'
    * raw lines under `dlqDir`. */
  def start(tagged: DataFrame, outDir: String, dlqDir: String,
      checkpoint: String, corruptCol: String = "_corrupt",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    tagged.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.persist()
        try {
          batch.filter(col(corruptCol).isNull).drop(corruptCol)
            .write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch-$id")
          batch.filter(col(corruptCol).isNotNull)
            .select(col(corruptCol).as("raw"))
            .write.mode(SaveMode.Overwrite).parquet(s"$dlqDir/batch-$id")
        } finally batch.unpersist()
        ()
      }
      .start()
  }

  /** Every committed clean batch, unioned — the parsed landed table. */
  def cleanRows(spark: SparkSession, outDir: String): DataFrame =
    Generations.read(spark, outDir, "batch-")

  /** Every committed dead-letter batch, unioned: one `raw` column with
    * the original malformed lines (replay these through the fixed parser
    * — nothing was lost). */
  def deadLetters(spark: SparkSession, dlqDir: String): DataFrame =
    Generations.read(spark, dlqDir, "batch-")
}
