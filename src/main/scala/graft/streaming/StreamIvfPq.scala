package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Similarity

/** Continuous IVF-PQ index maintenance — the ANN sibling of
  * [[StreamNearDedup]]: arriving vectors are encoded with the LANDED
  * trained quantizers ([[graft.operators.Similarity.landQuantizers]] —
  * the fixed coarse centroids + PQ codebook every batch must share, or
  * the codes aren't comparable) and appended to a disk-resident
  * inverted code list as batch-id-named generations, each PHYSICALLY
  * PARTITIONED BY `cell_id` — the on-disk inverted-list layout, so a
  * serve-time `cell_id IN (probed cells)` prunes partitions and reads
  * only the probed lists (the round-9 layout kept cell_id as an
  * ordinary column and every query scanned the whole code table).
  * Per micro-batch:
  *
  *  1. encode the batch scan-side into (vec_id, sub, code) rows under
  *     their coarse cell ([[Similarity.ivfPqIndexRows]]);
  *  2. land them as the batch's own generation `indexDir/gen-<id>`,
  *     `partitionBy("cell_id")` (idempotent Overwrite: a replayed batch
  *     rewrites byte-identically because the quantizers are landed
  *     constants);
  *  3. at `compactEvery` cadence, fold accumulated generations into one
  *     ([[compactIndex]]) inside the serial batch loop — the safe point,
  *     as with [[StreamNearDedup.start]]'s hook.
  *
  * Queries serve from the accumulated index at any time via [[search]] —
  * the identical prune + ADC plan as the batch operator, reading ONLY
  * the probed cells' partitions of the landed code rows. ADC partial
  * sums are NOT inert under row duplication, so compaction follows the
  * MANIFESTED discipline ([[Generations.compactManifested]]): readers
  * resolve fold manifests and never observe a fold together with its
  * sources, which is what lets [[search]] skip any candidate dedup
  * exchange (round 9 paid a per-query dropDuplicates instead).
  *
  * Scale shape per batch: encode is scan-side codegen (zero shuffles
  * beyond the bounded centroid argmax); the generation write is
  * batch-sized; search reads (nprobe/|cells|) of the code table via
  * partition pruning (IvfPqLayoutSpec pins `PartitionFilters` on the
  * serve scan). The corpus embeddings are never re-read after their
  * batch lands — the index IS the m-byte codes.
  */
object StreamIvfPq extends Logging {

  /** Every LIVE committed index generation (manifest-resolved —
    * [[Generations.live]]), unioned with per-root partition recovery and
    * optionally pruned to `cells` BEFORE the partition column is
    * normalized back to long (partition-value inference types the
    * `cell_id=` directory values as int; the filter runs on the inferred
    * column so `PartitionFilters` prune, then the cast restores the
    * batch schema). `template` supplies the (empty) schema before the
    * first generation commits. */
  def currentIndex(spark: SparkSession, indexDir: String,
      template: => DataFrame, cells: Option[Seq[Long]] = None): DataFrame = {
    val paths = Generations.livePaths(spark, indexDir)
    if (paths.isEmpty) template
    else Retention.filter(paths.map { p =>
      val raw = spark.read.parquet(p)
      val pruned = cells match {
        case Some(cs) => raw.filter(col("cell_id").isin(cs: _*))
        case None => raw
      }
      pruned.select(col("vec_id").cast("long"), col("sub").cast("int"),
        col("code").cast("long"), col("cell_id").cast("long"))
    }.reduce(_.unionByName(_)), indexDir, "vec_id")
  }

  /** Targeted deletion: commit the tombstone generation — every
    * [[currentIndex]] read excludes the vectors immediately, and the
    * next [[compactIndex]] purges their code rows physically
    * ([[Retention]]'s two halves; no additive sidecar here, so deletion
    * is the tombstone alone). */
  def delete(spark: SparkSession, indexDir: String, requestId: String,
      vecIds: Seq[Long]): Unit =
    Retention.tombstone(spark, indexDir, requestId, vecIds)

  /** Fold accumulated per-batch code generations into one, keeping the
    * cell-partitioned layout ([[Generations.compactManifested]] with
    * `partitionBy("cell_id")` — identity fold: code rows are append-only
    * and doc-unique, and the manifested discipline guarantees readers
    * never double-read a fold with its sources, so no dedup exchange is
    * paid at fold time either). Tombstoned vectors' rows are dropped
    * from the fold — the physical-purge half of [[delete]]. */
  def compactIndex(spark: SparkSession, indexDir: String): Unit =
    Generations.compactManifested(spark, indexDir,
      d => Retention.filter(
        d.select(col("vec_id").cast("long"), col("sub").cast("int"),
          col("code").cast("long"), col("cell_id").cast("long")),
        indexDir, "vec_id"),
      partitionCols = Seq("cell_id"))

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
        // empty micro-batch: skip the generation — a partitionBy write
        // of zero rows lands no schema-bearing file and would wedge
        // every later generation read
        if (!batch.isEmpty)
          Similarity.ivfPqIndexRows(batch, m, subDim, centroids, book)
            .write.mode(SaveMode.Overwrite).partitionBy("cell_id")
            .parquet(s"$indexDir/gen-$id")
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
    * cross-restart and across compaction cycles). The probe assignment
    * is collected first ([[Similarity.collectProbes]]) so the generation
    * read itself is pruned to the probed cells' partitions. */
  def search(spark: SparkSession, indexDir: String, queries: DataFrame,
      centroids: DataFrame, book: Seq[(Int, Int, Array[Double])],
      k: Int = 5, nprobe: Int = 4, m: Int = 8, subDim: Int = 8): DataFrame = {
    val probes = Similarity.collectProbes(queries, centroids, nprobe)
    Similarity.searchIvfPqIndex(
      currentIndex(spark, indexDir,
        template = throw new IllegalStateException(
          s"no committed index generation under $indexDir"),
        cells = Some(probes.map(_._2).distinct.sorted)),
      queries, k, nprobe, m, subDim, centroids, book,
      probesPre = Some(probes))
  }

  /** [[search]] with the quantizers from the corpus dir's landed
    * artifact tables. */
  def searchFromLanded(spark: SparkSession, indexDir: String,
      queries: DataFrame, corpusDir: String, k: Int = 5,
      nprobe: Int = 4): DataFrame = {
    val (centroids, book) = Similarity.loadLandedQuantizers(spark, corpusDir)
    search(spark, indexDir, queries, centroids, book, k, nprobe)
  }
}
