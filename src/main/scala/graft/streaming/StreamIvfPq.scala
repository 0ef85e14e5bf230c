package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Similarity

/** Continuous IVF-PQ index maintenance — the ANN sibling of
  * [[StreamNearDedup]]: arriving vectors are encoded with the LANDED
  * trained quantizers ([[graft.operators.Similarity.landQuantizers]] —
  * the fixed coarse centroids + PQ codebook every batch must share, or
  * the codes aren't comparable) and appended to a disk-resident
  * inverted code list as batch-id-named generations. Per micro-batch:
  *
  *  1. encode the batch scan-side into (vec_id, cell_id, sub, code)
  *     inverted-list rows ([[Similarity.ivfPqIndexRows]] — the same m
  *     LUT-addressable bytes per vector the batch index carries);
  *  2. land them as the batch's own generation `indexDir/gen-<id>`
  *     (idempotent Overwrite: a replayed batch rewrites byte-identically
  *     because the quantizers are landed constants);
  *  3. at `compactEvery` cadence, fold accumulated generations into one
  *     ([[compactIndex]]) inside the serial batch loop — the safe point,
  *     as with [[StreamNearDedup.start]]'s hook.
  *
  * Queries serve from the accumulated index at any time via [[search]] —
  * the identical prune + ADC plan as the batch operator, reading the
  * landed code rows instead of re-encoding the corpus. Because ADC
  * partial sums are NOT inert under row duplication (a crashed
  * compaction's fold + not-yet-deleted sources would double-count),
  * search always collapses candidates post-prune
  * (`dedupCandidates = true`); compaction itself full-row-dedups, so an
  * interrupted fold self-heals on the next cycle.
  *
  * Scale shape per batch: encode is scan-side codegen (zero shuffles
  * beyond the bounded centroid argmax); the generation write is
  * batch-sized; search reads (nprobe/|cells|) of the code table via the
  * broadcast probe equi-join. The corpus embeddings are never re-read
  * after their batch lands — the index IS the m-byte codes.
  */
object StreamIvfPq extends Logging {

  /** Every committed index generation, unioned; `template` supplies the
    * (empty) schema before the first generation commits. */
  def currentIndex(spark: SparkSession, indexDir: String,
      template: => DataFrame, exclude: Set[String] = Set.empty): DataFrame = {
    val gens = Generations.committed(spark, indexDir, "gen-").filterNot(exclude)
    if (gens.isEmpty) template
    else Generations.readNames(spark, indexDir, gens, "gen-")
  }

  /** Fold accumulated per-batch code generations into one (the
    * [[StreamNearDedup.compactIndex]] recipe on the ANN index): union →
    * full-row dropDuplicates → one new `gen-compact-<epoch>` → delete
    * sources. The newest raw batch generation is never folded (replay
    * protection: an uncommitted trailing batch rewrites `gen-<id>` under
    * its own name on replay; its rows must not ALSO live in a fold —
    * though even that window is safe here because [[search]] dedups
    * candidates). Interruption between write and deletes leaves exact
    * duplicate rows; the next fold's dropDuplicates collapses them. */
  def compactIndex(spark: SparkSession, indexDir: String): Unit =
    Generations.compactFold(spark, indexDir)

  /** Start encoding `vectors` (a streaming DataFrame carrying `vec_id`
    * and `embedding`) into the inverted code list at `indexDir`, using
    * the caller-supplied FIXED quantizers (landed artifacts — see the
    * corpus-dir convenience overload). */
  def start(vectors: DataFrame, indexDir: String, checkpoint: String,
      centroids: DataFrame, book: Seq[(Int, Int, Array[Double])],
      m: Int = 8, subDim: Int = 8,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery = {
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        Similarity.ivfPqIndexRows(batch, m, subDim, centroids, book)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/gen-$id")
        if (compactEvery > 0 && id % compactEvery == compactEvery - 1)
          compactIndex(spark, indexDir)
        ()
      }
      .start()
  }

  /** [[start]] with the quantizers loaded from (training-and-landing on
    * first use) the corpus dir's landed artifact tables. */
  def startFromLanded(vectors: DataFrame, indexDir: String,
      checkpoint: String, corpusDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery = {
    val (centroids, book) =
      Similarity.loadLandedQuantizers(vectors.sparkSession, corpusDir)
    start(vectors, indexDir, checkpoint, centroids, book,
      trigger = trigger, compactEvery = compactEvery)
  }

  /** Top-k ADC search over everything the stream has landed so far —
    * identical answer to the batch [[Similarity.topKPqIvfWith]] over the
    * union of all arrived vectors (StreamIvfPqSpec pins that law,
    * cross-restart and across compaction cycles). */
  def search(spark: SparkSession, indexDir: String, queries: DataFrame,
      centroids: DataFrame, book: Seq[(Int, Int, Array[Double])],
      k: Int = 5, nprobe: Int = 4, m: Int = 8, subDim: Int = 8): DataFrame =
    Similarity.searchIvfPqIndex(
      Generations.read(spark, indexDir, "gen-"),
      queries, k, nprobe, m, subDim, centroids, book,
      dedupCandidates = true)

  /** [[search]] with the quantizers from the corpus dir's landed
    * artifact tables. */
  def searchFromLanded(spark: SparkSession, indexDir: String,
      queries: DataFrame, corpusDir: String, k: Int = 5,
      nprobe: Int = 4): DataFrame = {
    val (centroids, book) = Similarity.loadLandedQuantizers(spark, corpusDir)
    search(spark, indexDir, queries, centroids, book, k, nprobe)
  }
}
