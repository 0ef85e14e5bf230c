package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Analytics

/** Continuously-maintained anomaly baselines — the streaming face of
  * [[graft.operators.Analytics.dailyAnomalies]] (E91), in the repo's
  * disk-state `foreachBatch` house style (the [[StreamNearDedup]] /
  * [[StreamUpsert]] durability rules):
  *
  *  1. each micro-batch lands its PARTIAL per-(type, day) counts as an
  *     idempotent batch-id-named generation `stateDir/gen-<id>` — a
  *     replayed batch overwrites its own generation byte-identically, so
  *     counts are never doubled;
  *  2. the merged daily counts (sum over every committed generation) are
  *     rescored with the batch operator's OWN window stage
  *     ([[Analytics.anomaliesFromDailyCounts]]) and the full board is
  *     rewritten to `outDir/current` — a continuously-maintained
  *     materialized view of E91's answer.
  *
  * Arrival-order INSENSITIVE by construction: state is additive daily
  * counts, so any interleaving of (late) events converges to the batch
  * counts once drained — and identical counts through the identical
  * scoring stage give the batch answer verbatim (StreamAnomalySpec
  * drives this equivalence). A day's z therefore FIRMS UP as its (and
  * its baseline's) late data lands, rather than freezing at first
  * emission — the Update-mode semantics a monitoring board wants; pair
  * with a watermark-delayed reader for fire-once alerting.
  *
  * Scale shape per batch: the corpus-sized work is the batch's own
  * two-phase daily count (one row per touched (type, day) crosses); the
  * merge + window rescoring runs over types×days aggregate rows — tiny
  * at any event volume. Generations accumulate one small file set per
  * batch; fold them with [[compactState]] at maintenance cadence (same
  * write-then-delete self-healing rule as
  * [[StreamNearDedup.compactIndex]] — counts are summed, so the
  * crash-window duplicate rows it leaves MUST be removed by full-row
  * dedup before the next sum, which compactState's reader does not need:
  * it rewrites from the ORIGINAL generations, making a re-run after a
  * crash idempotent).
  */
object StreamAnomaly {

  /** Merged (event_type, day, n) over every committed state generation. */
  def mergedCounts(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    Generations.read(spark, stateDir, "gen-")
      .groupBy("event_type", "day")
      .agg(sum(col("n")).as("n"))

  def start(events: DataFrame, stateDir: String, outDir: String,
      checkpoint: String, days: Int = 7,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        batch
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
          .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/gen-$id")
        Analytics.anomaliesFromDailyCounts(mergedCounts(spark, stateDir), days)
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/current")
        ()
      }
      .start()
  }

  /** Fold accumulated per-batch count generations into one (small-file
    * maintenance): rows are re-summed per (type, day) so the folded
    * generation is one row per key.
    *
    * Counts are SUMMED, so — unlike [[StreamNearDedup.compactIndex]],
    * where crash-window duplicate rows are inert — reading a fold
    * together with its own sources would double every count. Two rules
    * make the write-then-delete crash window safe anyway:
    *
    *  - every fold commits a `_sources.txt` manifest inside its own
    *    directory; a re-run after a crash treats manifest-listed raw
    *    generations as ALREADY FOLDED (they are deleted, never re-read),
    *    so the re-run converges instead of snowballing;
    *  - the newest raw batch generation is never folded (the
    *    [[StreamNearDedup.compactIndex]] replay rule): if the stream
    *    crashed before its checkpoint commit, that batch replays and
    *    rewrites `gen-<id>` — which must still exist under its own name,
    *    not also live on inside a fold. */
  def compactState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifest(gen: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$stateDir/$gen/_sources.txt")
      if (!f.exists(p)) Seq.empty
      else {
        val in = f.open(p)
        try scala.io.Source.fromInputStream(in).getLines().toList
        finally in.close()
      }
    }
    val priorAll = Generations.committed(spark, stateDir, "gen-compact-")
    val alreadyFolded = priorAll.flatMap(manifest).toSet
    val rawAll = Generations.committed(spark, stateDir, "gen-")
      .filterNot(_.startsWith("gen-compact-"))
    // crash leftovers — folded (raw OR older compact) but not yet
    // deleted: finish the delete instead of ever re-reading them
    (rawAll ++ priorAll).filter(alreadyFolded).foreach(g =>
      f.delete(new org.apache.hadoop.fs.Path(stateDir, g), true))
    val prior = priorAll.filterNot(alreadyFolded)
    val gens = rawAll.filterNot(alreadyFolded)
    val newestBatchGen = gens
      .flatMap(g => g.stripPrefix("gen-").toLongOption.map((_, g)))
      .maxByOption(_._1).map(_._2)
    val sources = prior ++ gens.filterNot(newestBatchGen.contains)
    if (sources.size > 1) {
      val epoch = prior.flatMap(_.stripPrefix("gen-compact-").toLongOption)
        .maxOption.getOrElse(0L) + 1
      val dest = s"$stateDir/gen-compact-$epoch"
      spark.read.parquet(sources.map(g => s"$stateDir/$g"): _*)
        .groupBy("event_type", "day").agg(sum(col("n")).as("n"))
        .write.mode(SaveMode.Overwrite).parquet(dest)
      val out = f.create(
        new org.apache.hadoop.fs.Path(s"$dest/_sources.txt"), true)
      try out.write(sources.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      sources.foreach(g =>
        f.delete(new org.apache.hadoop.fs.Path(stateDir, g), true))
    }
  }
}
