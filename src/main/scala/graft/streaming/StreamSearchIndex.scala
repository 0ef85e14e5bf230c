package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextAnalysis

/** Continuous search-index maintenance — the full-text sibling of
  * [[StreamIvfPq]]: arriving documents are tokenized into BM25 postings
  * and appended to a disk-resident inverted index as batch-id-named
  * generations, each PHYSICALLY PARTITIONED by a term hash-bucket
  * (`bkt = crc32(term) mod 32` — term cardinality is unbounded, so the
  * partition key is the bucket, not the term), so a query's
  * `bkt IN (buckets of Q)` prunes partitions and reads only the query
  * terms' slices — the bucket-pruned serve cost the batch
  * [[TextAnalysis.landSearchIndex]] layout gets from the catalog, kept
  * across the streamed generations (round 9 served from unpartitioned
  * parquet and scanned every posting per query). Per micro-batch:
  *
  *  1. derive the batch's postings (term, doc_id, dl, tf), positional
  *     postings (term, doc_id, pos), doclens (doc_id, dl), and a 1-row
  *     ADDITIVE statistics sidecar (n_docs, dl_sum) — landed stats mean
  *     serving never rescans doclens to recompute (N, avgdl): round 9
  *     paid a corpus-sized dedup+agg per query for exactly this row;
  *  2. land the four as the batch's own generations
  *     `indexDir/{postings,positions,lens,stats}/gen-<id>` (idempotent
  *     Overwrite: tokenization is deterministic, so a replayed batch
  *     rewrites byte-identically);
  *  3. at `compactEvery` cadence, fold each side's generations into one
  *     ([[compactIndex]]) inside the serial batch loop — the
  *     single-maintenance-job safe point, as with every other hook.
  *
  * BM25 statistics, phrase occurrence counts, and the additive sidecar
  * are all NOT inert under row duplication, so every fold follows the
  * MANIFESTED discipline ([[Generations.compactManifested]]): readers
  * resolve fold manifests ([[Generations.live]]) and never observe a
  * fold together with its sources — which is what lets [[search]] and
  * [[searchPhrase]] drop the round-9 full-row dedups from the serve
  * plans entirely.
  *
  * CONTRACT: doc ids are unique across the stream (the
  * [[StreamNearDedup]] id discipline); a re-sent id with different text
  * would contribute twice to postings and stats.
  *
  * Scale shape per batch: tokenize/explode is scan-side, the (term,
  * doc, dl) tf count shuffles batch-sized rows only, the stats row is a
  * 1-row agg, and the generation writes are batch-sized. Serve cost is
  * the PRUNED postings of the query terms plus a few 1-row stats reads
  * — independent of corpus size (StreamSearchIndexSpec pins the
  * `PartitionFilters` on the serve scan and the absence of any doclens
  * scan in the serve plan).
  */
object StreamSearchIndex {

  /** Term-bucket fan-out of the partitioned layout. At 100 TB: ≈ index
    * size / 128–256 MiB, rounded to cluster parallelism (the
    * [[graft.sources.Layout]] bucket-count rule). */
  val TermBuckets = 32

  /** The partition bucket of a term — CRC32 mod [[TermBuckets]], chosen
    * because both engines of the contract can compute it exactly: the
    * plan side as the codegen'd `crc32` over the term's UTF-8 bytes, the
    * driver side ([[termBucket]]) as `java.util.zip.CRC32` — so serve
    * can turn a query into literal partition values with no extra job. */
  def termBucketCol(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(crc32(term.cast("binary")), lit(TermBuckets.toLong))

  /** Driver-side [[termBucketCol]]: the literal partition values of a
    * query's terms. */
  def termBucket(term: String): Int = {
    val crc = new java.util.zip.CRC32()
    crc.update(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (crc.getValue % TermBuckets).toInt
  }

  /** The batch's postings rows — tokenization identical to
    * [[TextAnalysis.bm25Rank]]'s, so stream-built and batch-built
    * statistics agree exactly. */
  def postingsOf(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))

  /** The batch's doclen rows — every document, including zero-token
    * ones (they carry no posting but DO count in (N, avgdl)). Landed as
    * the per-doc durable record; serving reads the 1-row [[statsOf]]
    * sidecar instead. */
  def doclensOf(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch.select(col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).as("dl"))

  /** The batch's 1-row additive corpus-statistics sidecar: (n_docs,
    * dl_sum). Summed across live generations at serve time, it yields
    * the same (N, avgdl) the batch operator computes — doclen sums are
    * exact integers, so the double division matches `avg(dl)` bitwise. */
  def statsOf(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    doclensOf(batch, idCol, textCol)
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("dl_sum"))

  /** The batch's positional-posting rows — the (term, doc_id, pos)
    * occurrences [[TextAnalysis.landSearchIndex]]'s `_positions` table
    * lands, so the streamed index serves phrase queries too
    * ([[searchPhrase]]). */
  def positionsOf(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("w"))
      .select(col("doc_id"), posexplode(col("w")))
      .select(col("col").as("term"), col("doc_id"), (col("pos") + 1).as("pos"))

  /** One micro-batch's index maintenance — the four generation writes,
    * callable from any foreachBatch loop (the [[StreamHybrid]] composer
    * shares it): idempotent Overwrite (tokenization is deterministic, so
    * a replayed batch rewrites byte-identically). */
  def indexBatch(batch: DataFrame, indexDir: String, id: Long,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    // an empty micro-batch writes NO generations: a partitionBy write of
    // zero rows lands only _SUCCESS (no schema-bearing file), which every
    // later generation read would refuse — and an all-zero stats row
    // contributes nothing. Absent generations read as absent rows.
    if (batch.isEmpty) return
    postingsOf(batch, idCol, textCol)
      .withColumn("bkt", termBucketCol(col("term")))
      .write.mode(SaveMode.Overwrite).partitionBy("bkt")
      .parquet(s"$indexDir/postings/gen-$id")
    positionsOf(batch, idCol, textCol)
      .withColumn("bkt", termBucketCol(col("term")))
      .write.mode(SaveMode.Overwrite).partitionBy("bkt")
      .parquet(s"$indexDir/positions/gen-$id")
    doclensOf(batch, idCol, textCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/lens/gen-$id")
    statsOf(batch, idCol, textCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats/gen-$id")
  }

  /** Start indexing `docs` (a streaming DataFrame carrying `idCol` and
    * `textCol`) into the inverted index at `indexDir`. */
  def start(docs: DataFrame, indexDir: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        indexBatch(batch, indexDir, id, idCol, textCol)
        if (compactEvery > 0 && id % compactEvery == compactEvery - 1)
          compactIndex(spark, indexDir)
        ()
      }
      .start()

  /** Fold each side's accumulated generations ([[Generations
    * .compactManifested]] four times — the sides compact independently;
    * manifest resolution means readers never need a joint commit point):
    * postings/positions fold by identity, KEEPING the term-bucket
    * partitioning so serve pruning survives compaction; lens fold by
    * identity; the stats sidecar folds by SUM (additive — the
    * [[StreamAnomaly]] counts argument, which is also what absorbs
    * [[delete]]'s negative delta generations with no special casing).
    * Every per-doc fold additionally anti-joins the committed tombstone
    * ids ([[Retention]]) — the PHYSICAL-PURGE half of deletion. */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    def purge(df: DataFrame): DataFrame =
      Retention.filter(df, indexDir, "doc_id")
    Generations.compactManifested(spark, s"$indexDir/postings",
      d => purge(d.select(col("term"), col("doc_id"), col("dl"), col("tf"),
        col("bkt"))),
      partitionCols = Seq("bkt"))
    Generations.compactManifested(spark, s"$indexDir/positions",
      d => purge(d.select(col("term"), col("doc_id"), col("pos"), col("bkt"))),
      partitionCols = Seq("bkt"))
    Generations.compactManifested(spark, s"$indexDir/lens", purge)
    Generations.compactManifested(spark, s"$indexDir/stats",
      _.agg(sum(col("n_docs")).as("n_docs"), sum(col("dl_sum")).as("dl_sum")))
  }

  /** Targeted deletion ([[Retention]]'s discipline instantiated for the
    * additive-sidecar family): subtract the freshly-deleted documents
    * from the stats sidecar, then commit the tombstone generation that
    * excludes their postings/positions/lens rows from every serve and
    * purges them at the next fold.
    *
    * ORDER AND CRASH WINDOW: the negative delta lands FIRST. A crash
    * between the two writes leaves stats subtracted while postings still
    * serve — closed by re-running delete under the SAME requestId: the
    * delta recomputes from ids not already tombstoned (own generation
    * excluded) against the live lens rows, which no fold can have purged
    * (the tombstone that would purge them is exactly the write that
    * didn't happen), so the rewrite is byte-identical and the tombstone
    * commit completes the pair. The reverse order would break replay: a
    * fold between crash and re-run would purge the lens rows the delta
    * needs, silently zeroing the subtraction.
    *
    * A crashed delete is replayed BEFORE any other maintenance on this
    * root (the micro-batch replay rule applied to deletions): a stats
    * fold or an overlapping later delete slotted into the window would
    * change what the byte-identical-rewrite argument may assume.
    *
    * A SPURIOUS replay of an already-COMPLETED delete is additionally a
    * structural no-op ([[Retention.tombstoneCommitted]] gates the pair):
    * without the guard, a replay arriving after a [[compactIndex]] had
    * purged the lens rows would recompute a ZERO delta and overwrite the
    * real one if the stats fold hadn't absorbed it yet — a lost
    * subtraction the out-of-band discipline alone had to prevent.
    *
    * Cost: one live-lens read per deletion request (a maintenance op,
    * not a serve) + two bounded writes. Ids never landed (or already
    * deleted) contribute nothing. */
  def delete(spark: SparkSession, indexDir: String, requestId: String,
      docIds: Seq[Long]): Unit = {
    if (Retention.tombstoneCommitted(spark, indexDir, requestId)) return
    import spark.implicits._
    val own = s"gen-$requestId"
    val fresh0 = docIds.distinct.sorted.toDF("doc_id")
    val fresh = Retention.deletedIds(spark, indexDir, exclude = Set(own))
      .map(t => fresh0.join(broadcast(t.select(col("id").as("doc_id"))),
        Seq("doc_id"), "left_anti"))
      .getOrElse(fresh0)
    val lensLive =
      if (Generations.livePaths(spark, s"$indexDir/lens").isEmpty)
        Seq.empty[(Long, Int)].toDF("doc_id", "dl")
      else readSide(spark, s"$indexDir/lens", None)
    lensLive.join(broadcast(fresh), Seq("doc_id"))
      .agg((count(lit(1)) * lit(-1L)).as("n_docs"),
        (coalesce(sum(col("dl")), lit(0L)) * lit(-1L)).as("dl_sum"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/stats/gen-tomb-$requestId")
    Retention.tombstone(spark, indexDir, requestId, docIds)
  }

  /** Live (manifest-resolved) union of one side's generations, each dir
    * read as its own root; for the term-bucketed sides, `bkts` prunes
    * each scan's partitions BEFORE the recovered partition column is
    * dropped from the result. Per-doc sides exclude tombstoned documents
    * ([[Retention.filter]] — the serve-side half of [[delete]]); the
    * stats side must NOT filter (deletion reaches it as the negative
    * delta generations instead). */
  private def readSide(spark: SparkSession, dir: String,
      bkts: Option[Seq[Int]], tombRoot: Option[String] = None): DataFrame = {
    val paths = Generations.livePaths(spark, dir)
    require(paths.nonEmpty, s"no committed 'gen-' generations under $dir")
    val u = paths.map { p =>
      val raw = spark.read.parquet(p)
      bkts match {
        case Some(bs) => raw.filter(col("bkt").isin(bs: _*)).drop("bkt")
        case None => raw
      }
    }.reduce(_.unionByName(_))
    tombRoot.map(r => Retention.filter(u, r, "doc_id")).getOrElse(u)
  }

  /** The streamed index's (n_docs, avgdl) — a sum over the live 1-row
    * stats sidecars (a few rows at any corpus size), NOT a doclens
    * rescan. */
  private def corpusStats(spark: SparkSession, indexDir: String): DataFrame =
    readSide(spark, s"$indexDir/stats", None)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("dl_sum")).as("dl_sum"))
      .select(col("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs").cast("double")).as("avgdl"))

  /** BM25 top-k over everything the stream has landed so far — the
    * [[TextAnalysis.bm25RankIndexed]] serve plan over PRUNED generation
    * reads: partition pruning to the query terms' buckets, df from the
    * pruned rows, (N, avgdl) from the additive sidecar. No dedup, no
    * doclens scan (the manifested-fold discipline and the stats sidecar
    * retire both round-9 costs). */
  def search(spark: SparkSession, indexDir: String, query: Seq[String],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty && k > 0)
    val tf = readSide(spark, s"$indexDir/postings",
        Some(query.map(termBucket).distinct.sorted), Some(indexDir))
      .filter(col("term").isin(query: _*))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    TextAnalysis.bm25ScoreTail(tf, dfs, corpusStats(spark, indexDir), k, k1, b)
  }

  /** Exact-phrase occurrence counts over everything the stream has landed
    * so far — [[TextAnalysis.phraseCountOver]]'s positional intersection
    * over the PRUNED live generations (the phrase terms' buckets only;
    * manifest resolution replaces the round-9 full-row dedup). */
  def searchPhrase(spark: SparkSession, indexDir: String,
      phrase: Seq[String]): DataFrame =
    TextAnalysis.phraseCountOver(
      readSide(spark, s"$indexDir/positions",
        Some(phrase.map(termBucket).distinct.sorted), Some(indexDir)),
      phrase)

  /** Minimum-covering-window proximity ranking off the live positional
    * generations — the [[TextAnalysis.proximityOver]] window tail, with
    * the read pruned to the query terms' partitions like
    * [[searchPhrase]]'s. The scan is NOT duplication-inert (a
    * duplicated position row cannot change a max-so-far, but readers
    * still resolve fold manifests so a fold and its sources are never
    * both read — the shared readSide rule). */
  def searchProximity(spark: SparkSession, indexDir: String,
      query: Seq[String]): DataFrame =
    TextAnalysis.proximityOver(
      readSide(spark, s"$indexDir/positions",
        Some(query.map(termBucket).distinct.sorted), Some(indexDir)),
      query)
}
