package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Multimodal

/** Continuous PERCEPTUAL media dedup — the streaming face of
  * [[graft.operators.Multimodal.incrementalMediaNew]], completing the
  * per-class gate family ([[StreamClean]] exact, [[StreamNearDedup]]
  * near, [[StreamSemantic]] semantic, [[StreamContain]] containment):
  * re-encoded/trimmed copies of an asset that landed ANY number of
  * batches ago are dropped before they reach decode. Per micro-batch:
  *
  *  1. probe the disk-resident signature index
  *     ([[Multimodal.buildMediaSigIndex]] rows: media_id, 4×16-bit band
  *     array) with the batch's band values, XOR-popcount confirm, and
  *     drop arrivals within τ of anything landed — plus the higher-id
  *     side of within-batch near pairs;
  *  2. land the survivors to `outDir/batch-<id>`;
  *  3. append the survivors' signatures to the index as its own
  *     generation `indexDir/gen-<id>`.
  *
  * Cross-batch state lives in the INDEX ON DISK (32 signature bytes per
  * landed asset — never the payloads), so near-copies are caught across
  * any batch distance with zero executor state growth.
  *
  * Durability: the [[StreamNearDedup]] rules verbatim — idempotent
  * Overwrite of batch-id-named directories (signatures are a pure
  * function of the landed bytes, so a replayed batch rewrites its
  * generation byte-identically), `_SUCCESS`-committed reads, and the
  * replayed batch's OWN generation excluded from its probe BY NAME.
  * Duplicate index rows are inert (the probe's candidate set is
  * `distinct()`ed before the confirm), so compaction is the
  * self-healing [[StreamNearDedup.compactIndex]] fold discipline,
  * shared here via the same newest-generation replay protection.
  *
  * Scale shape per batch: batch signatures are one codegen kernel call
  * per arrival at the scan — payloads never shuffle; the probe is the
  * (band, bv) equi-join against the accumulated index generations; the
  * confirm touches |candidates| signature pairs. Landed payloads are
  * never re-read.
  */
object StreamMedia extends Logging {

  /** Every committed signature generation, unioned, tombstoned assets
    * excluded ([[Retention]] — a deleted asset's signature must stop
    * gating future arrivals); `template` supplies the (empty) schema
    * before the first generation commits. */
  def currentIndex(spark: SparkSession, indexDir: String,
      template: => DataFrame, exclude: Set[String] = Set.empty): DataFrame = {
    val gens = Generations.committed(spark, indexDir, "gen-").filterNot(exclude)
    if (gens.isEmpty) template
    else Retention.filter(
      Generations.readNames(spark, indexDir, gens, "gen-"),
      indexDir, "media_id")
  }

  /** Every committed admitted batch, unioned — the continuously-growing
    * deduplicated media corpus, tombstoned assets excluded. `idCol`
    * names the landed id column (the one passed to [[start]]). */
  def admittedMedia(spark: SparkSession, outDir: String,
      idCol: String = "media_id"): DataFrame =
    Retention.filter(Generations.read(spark, outDir, "batch-"),
      outDir, idCol)

  /** Targeted deletion across both maintained roots (the
    * [[StreamNearDedup.delete]] discipline for media): tombstone the
    * landed corpus and the signature index; serve-side exclusion is
    * immediate, [[compactIndex]] purges physically. */
  def delete(spark: SparkSession, indexDir: String, outDir: String,
      requestId: String, ids: Seq[Long]): Unit = {
    Retention.tombstone(spark, indexDir, requestId, ids)
    Retention.tombstone(spark, outDir, requestId, ids)
  }

  /** Fold accumulated signature generations into one, keeping the
    * newest batch generation out (the [[StreamNearDedup.compactIndex]]
    * replay rule: an uncommitted trailing batch excludes its own
    * generation from its probe BY NAME on replay — folded in, the
    * replay would drop the whole batch as near-dups of itself at
    * hamming 0). Full-row dropDuplicates makes an interrupted fold
    * self-healing; duplicate signature rows are probe-inert anyway. */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val gens = Generations.committed(spark, indexDir, "gen-")
      .filterNot(_.startsWith("gen-compact-"))
    val priorCompactions = Generations.committed(spark, indexDir, "gen-compact-")
    val newestBatchGen = gens
      .flatMap(g => g.stripPrefix("gen-").toLongOption.map((_, g)))
      .maxByOption(_._1).map(_._2)
    val sources = priorCompactions ++ gens.filterNot(newestBatchGen.contains)
    if (sources.size > 1) {
      val epoch = priorCompactions
        .flatMap(_.stripPrefix("gen-compact-").toLongOption)
        .maxOption.getOrElse(0L) + 1
      // tombstoned assets drop from the fold — Retention's
      // physical-purge half
      Retention.filter(
          spark.read.parquet(sources.map(g => s"$indexDir/$g"): _*)
            .dropDuplicates(),
          indexDir, "media_id")
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$indexDir/gen-compact-$epoch")
      val f = new org.apache.hadoop.fs.Path(indexDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      sources.foreach(g =>
        f.delete(new org.apache.hadoop.fs.Path(indexDir, g), true))
      logInfo(s"compacted ${sources.size} media index generations into " +
        s"gen-compact-$epoch under $indexDir")
    }
  }

  /** Start gating `media` (a streaming DataFrame carrying `idCol` and
    * `payloadCol`) into `outDir`, growing the signature index at
    * `indexDir`. `compactEvery` (0 = off) runs [[compactIndex]] inside
    * the serial batch loop at that cadence — the safe point, as with
    * [[StreamNearDedup.start]]'s hook. Pre-seed a landed corpus by
    * writing [[Multimodal.buildMediaSigIndex]] output to any
    * `gen-*`-named directory under `indexDir` before starting. */
  def start(media: DataFrame, indexDir: String, outDir: String,
      checkpoint: String, idCol: String, payloadCol: String,
      maxHamming: Int = 3,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery = {
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val own = s"gen-$id"
        val idx = currentIndex(spark, indexDir,
          template = Multimodal.buildMediaSigIndex(
            batch.limit(0), idCol, payloadCol),
          exclude = Set(own))
        val survivors = Multimodal.incrementalMediaNew(
          idx, batch, idCol, payloadCol, maxHamming)
        survivors.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch-$id")
        // signatures derive from the LANDED bytes, so a replayed batch
        // re-derives the identical generation
        Multimodal.buildMediaSigIndex(
          spark.read.parquet(s"$outDir/batch-$id"), idCol, payloadCol)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/$own")
        if (compactEvery > 0 && id % compactEvery == compactEvery - 1)
          compactIndex(spark, indexDir)
        ()
      }
      .start()
  }
}
