package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Continuous NEAR-duplicate dedup — the streaming face of
  * [[graft.operators.Dedup.incrementalNearNew]], closing the gap
  * [[StreamClean]] step 2 leaves on an unbounded stream: the exact
  * fingerprint anti-join stops only VERBATIM re-arrivals, so a
  * one-token-perturbed copy of anything already landed (or of an arrival
  * two batches ago) sails through. Per micro-batch:
  *
  *  1. probe the disk-resident signature index
  *     ([[graft.operators.Dedup.buildNearDupIndex]] rows: doc_id, distinct
  *     shingle hashes, MinHash signature) with the batch's band hashes,
  *     exact-Jaccard verify, and drop near-dups of anything landed —
  *     plus the higher-id side of within-batch near-dup pairs;
  *  2. land the survivors to `outDir/batch-<id>`;
  *  3. append the survivors' signatures to the index as its own
  *     generation `indexDir/gen-<id>`.
  *
  * Cross-batch state lives in the INDEX TABLE ON DISK, not in streaming
  * state: batch N+1's arrivals are probed against every committed
  * generation ≤ N, so near-dups are caught across any batch distance with
  * zero executor state growth — the unbounded-horizon answer
  * `dropDuplicatesWithinWatermark` (bounded horizon by design) cannot
  * give, for the near-dup relation it cannot express at all.
  *
  * Durability (same rules as [[StreamUpsert]]): every write is an
  * idempotent `Overwrite` of a batch-id-named directory, so Spark's
  * replay of the last uncommitted batch rewrites both directories
  * byte-identically; reads consider only `_SUCCESS`-committed
  * generations, and the replayed batch's OWN generation is excluded from
  * its probe index (a crash between step 3 and the checkpoint commit
  * must not make the batch drop itself as a duplicate on replay).
  *
  * Scale shape per batch: the probe re-derives band hashes over the
  * accumulated index and pays one index-side (doc_id, band, bh) shuffle
  * — O(|corpus|) per batch, fine at ingest cadences where batches are
  * minutes apart, NOT the batch operator's bucketed exchange-free plan
  * (a union of per-batch generation files carries no bucketing
  * metadata). The steady-state amortization at large corpus sizes is
  * periodic [[compactIndex]] plus landing the compacted index in the
  * probe-aligned bucketed form ([[graft.operators.Dedup.landNearDupIndex]])
  * and draining arrivals through
  * [[graft.operators.Dedup.incrementalNearNewBanded]] between
  * re-landings. The index grows by |survivors| signature rows (a few
  * hundred longs each) per batch; landed text is never re-read.
  * Pre-seed a corpus by writing
  * [[graft.operators.Dedup.buildNearDupIndex]] output to any
  * `gen-*`-named directory under `indexDir` before starting.
  */
object StreamNearDedup extends Logging {

  private def committedGens(spark: SparkSession, dir: String,
      prefix: String): Seq[String] = Generations.committed(spark, dir, prefix)
  // (kept as a named local alias: every listing in this file is
  // generation-layout listing, and the name documents that)

  /** Every committed signature generation, unioned, tombstoned docs
    * excluded ([[Retention]] — a DELETED document's signature must stop
    * gating future arrivals, or near-copies of content the corpus no
    * longer holds would be silently dropped); `template` supplies the
    * (empty) schema before the first generation commits. */
  def currentIndex(spark: SparkSession, indexDir: String,
      template: => DataFrame, exclude: Set[String] = Set.empty): DataFrame = {
    val gens = committedGens(spark, indexDir, "gen-").filterNot(exclude)
    if (gens.isEmpty) template
    else Retention.filter(
      Generations.readNames(spark, indexDir, gens, "gen-"),
      indexDir, "doc_id")
  }

  /** Every LIVE committed cleaned batch, unioned — the continuously-
    * growing deduplicated corpus, tombstoned docs excluded and corpus
    * folds manifest-resolved ([[Retention.liveBatches]]). `idCol` names
    * the landed id column (the one passed to [[start]]). */
  def cleanedDocs(spark: SparkSession, outDir: String,
      idCol: String = "doc_id"): DataFrame =
    Retention.liveBatches(spark, outDir, idCol)

  /** Targeted deletion across both maintained roots: the landed corpus
    * (`outDir` batch generations) and the signature index. Serve-side
    * exclusion is immediate; [[compactIndex]] purges the index rows
    * physically at its next run, and [[Retention.compactCorpus]] (wired
    * into the same hook) purges the landed text itself. */
  def delete(spark: SparkSession, indexDir: String, outDir: String,
      requestId: String, ids: Seq[Long]): Unit = {
    Retention.tombstone(spark, indexDir, requestId, ids)
    Retention.tombstone(spark, outDir, requestId, ids)
  }

  /** Compact the index's accumulated per-batch generations into one —
    * the signature-index instance of the small-file pathology
    * [[graft.sources.Compaction]] exists for (a long-running stream
    * leaves one tiny directory per batch; probe planning then pays
    * per-file open cost on every micro-batch). Writes the union of all
    * currently-committed generations as a single new generation, THEN
    * deletes the sources — a crash between the two steps leaves
    * duplicated signature rows, which are semantically inert here: the
    * probe's candidate set is `distinct()`ed before verification, so
    * duplicate index rows can only re-propose the same candidate pair.
    * Maintenance op: run while the stream is stopped or between triggers
    * (deleting a generation out from under an in-flight probe read is
    * the one unsafe interleaving). */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val gens = committedGens(spark, indexDir, "gen-")
      .filterNot(_.startsWith("gen-compact-"))
    val priorCompactions = committedGens(spark, indexDir, "gen-compact-")
    // NEVER fold the newest batch generation: if the stream crashed after
    // writing gen-<id> but before committing the checkpoint, that batch
    // will be REPLAYED — start() keeps it out of its own probe index by
    // NAME, which only works while its rows still live under that name.
    // Folding them into gen-compact-* would make the replayed batch find
    // its own signatures (Jaccard 1.0) and drop every one of its rows as
    // duplicates of themselves — silent loss of the whole batch.
    val newestBatchGen = gens
      .flatMap(g => g.stripPrefix("gen-").toLongOption.map((_, g)))
      .maxByOption(_._1).map(_._2)
    val sources = priorCompactions ++ gens.filterNot(newestBatchGen.contains)
    if (sources.size > 1) {
      val epoch = priorCompactions
        .flatMap(_.stripPrefix("gen-compact-").toLongOption)
        .maxOption.getOrElse(0L) + 1
      // dropDuplicates makes an interrupted compaction self-healing: a
      // crash between the write and the deletes below leaves the folded
      // rows present twice (gen-compact-<e> ∪ its sources) as EXACT
      // duplicates; the NEXT compaction would otherwise snowball them
      // forever. FULL-row dedup deliberately, not doc_id: if a producer
      // ever reuses a doc_id with different text across batches, both
      // payloads survive compaction, so neither document's future
      // near-arrivals can silently sail past the probe index.
      // tombstoned docs drop from the fold — Retention's physical-purge
      // half (serve-side filtering already excluded them)
      Retention.filter(
          spark.read.parquet(sources.map(g => s"$indexDir/$g"): _*)
            .dropDuplicates(),
          indexDir, "doc_id")
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$indexDir/gen-compact-$epoch")
      val f = new Path(indexDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      sources.foreach(g => f.delete(new Path(indexDir, g), true))
      logInfo(s"compacted ${sources.size} index generations into " +
        s"gen-compact-$epoch under $indexDir")
    }
  }

  /** Start cleaning `docs` (a streaming DataFrame carrying `idCol` and
    * `textCol`) into `outDir`, growing the signature index at `indexDir`.
    *
    * `compactEvery` (0 = off) wires [[compactIndex]] into the batch loop
    * itself: every `compactEvery`-th batch id compacts AFTER the batch's
    * own generation write — the one point in the query's serial
    * foreachBatch lifecycle where no probe read is in flight (the next
    * probe starts only with the next batch), which retires the
    * "maintenance op between triggers" concurrency hazard. The hook keys
    * on the deterministic batch id, so a replayed batch re-runs its
    * compaction too — safe, because [[compactIndex]] is self-healing
    * under interruption and duplicate-row inert. The folded set excludes
    * the newest batch generation by name (the in-flight replay
    * protection), which at hook time is exactly the generation the batch
    * just wrote. */
  def start(docs: DataFrame, indexDir: String, outDir: String,
      checkpoint: String, idCol: String, textCol: String,
      n: Int = 3, k: Int = 128, bands: Int = 32, seed: Long = 42L,
      threshold: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val own = s"gen-$id"
        val idx = currentIndex(spark, indexDir,
          template = Dedup.buildNearDupIndex(
            batch.limit(0), idCol, textCol, n, k, seed),
          exclude = Set(own))
        val survivors = Dedup.incrementalNearNew(
          idx, batch, idCol, textCol, n, k, bands, seed, threshold)
        survivors.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch-$id")
        // signatures are derived from the LANDED bytes, so a replayed
        // batch re-derives the identical generation
        Dedup.buildNearDupIndex(
          spark.read.parquet(s"$outDir/batch-$id"), idCol, textCol, n, k, seed)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/$own")
        if (compactEvery > 0 && id % compactEvery == compactEvery - 1) {
          compactIndex(spark, indexDir)
          // landed-corpus purge: deleted docs' text stops existing on
          // disk, not just being serve-filtered
          Retention.compactCorpus(spark, outDir, idCol)
        }
        ()
      }
      .start()
  }
}
