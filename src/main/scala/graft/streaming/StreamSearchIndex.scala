package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.TextAnalysis

/** Continuous search-index maintenance — the full-text sibling of
  * [[StreamIvfPq]]: arriving documents are tokenized into BM25 postings
  * and appended to a disk-resident inverted index as batch-id-named
  * generations. Per micro-batch:
  *
  *  1. derive the batch's postings (term, doc_id, dl, tf) — the same
  *     rows [[TextAnalysis.landSearchIndex]] lands, minus the bucketing
  *     (a per-batch write is batch-sized; the bucketed layout is the
  *     COMPACTED form's job) — and its doclens (doc_id, dl), the
  *     corpus-statistics sidecar that keeps zero-token documents in
  *     (N, avgdl) exactly as the batch operator counts them — and its
  *     positional postings (term, doc_id, pos), the `_positions` rows
  *     that let the streamed index serve phrase queries;
  *  2. land the three as the batch's own generations
  *     `indexDir/{postings,lens,positions}/gen-<id>`
  *     (idempotent Overwrite: tokenization is deterministic, so a
  *     replayed batch rewrites byte-identically);
  *  3. at `compactEvery` cadence, fold each side's generations into one
  *     ([[Generations.compactFold]]) inside the serial batch loop — the
  *     single-maintenance-job safe point, as with every other hook.
  *
  * [[search]] serves BM25 over everything landed so far — identical
  * answer to the batch [[TextAnalysis.bm25Rank]] on the union of all
  * arrived documents (StreamSearchIndexSpec pins that law, cross-restart
  * and across compaction cycles). BM25 statistics are NOT inert under
  * row duplication (df counts and the per-doc sum would double), so
  * search full-row-dedups both sides first — exact duplicates are the
  * only kind the crash window (fold written, sources not yet deleted)
  * or a replayed generation can produce.
  *
  * CONTRACT: doc ids are unique across the stream (the
  * [[StreamNearDedup]] id discipline); a re-sent id with different text
  * would contribute two doclen rows and skew N.
  *
  * Scale shape per batch: tokenize/explode is scan-side, the (term,
  * doc, dl) tf count shuffles batch-sized rows only, and the generation
  * write is batch-sized. Serve cost is the accumulated postings of the
  * query terms — the compacted index is one fold away from
  * [[TextAnalysis.landSearchIndex]]'s bucket-pruned layout, which a
  * deployment would apply to the fold output.
  */
object StreamSearchIndex {

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
    * ones (they carry no posting but DO count in (N, avgdl)). */
  def doclensOf(batch: DataFrame, idCol: String, textCol: String): DataFrame =
    batch.select(col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).as("dl"))

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
        postingsOf(batch, idCol, textCol)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/postings/gen-$id")
        doclensOf(batch, idCol, textCol)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/lens/gen-$id")
        positionsOf(batch, idCol, textCol)
          .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/positions/gen-$id")
        if (compactEvery > 0 && id % compactEvery == compactEvery - 1)
          compactIndex(spark, indexDir)
        ()
      }
      .start()

  /** Fold both sides' accumulated generations ([[Generations.compactFold]]
    * twice — postings and lens compact independently; search dedups, so
    * the two sides never need a joint commit point). */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    Generations.compactFold(spark, s"$indexDir/postings")
    Generations.compactFold(spark, s"$indexDir/lens")
    Generations.compactFold(spark, s"$indexDir/positions")
  }

  /** BM25 top-k over everything the stream has landed so far — the
    * [[TextAnalysis.bm25RankIndexed]] serve plan over generation reads,
    * with the duplication guard described above. */
  def search(spark: SparkSession, indexDir: String, query: Seq[String],
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty && k > 0)
    val tf = Generations.read(spark, s"$indexDir/postings", "gen-")
      .dropDuplicates()
      .filter(col("term").isin(query: _*))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = Generations.read(spark, s"$indexDir/lens", "gen-")
      .dropDuplicates()
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    TextAnalysis.bm25ScoreTail(tf, dfs, stats, k, k1, b)
  }

  /** Exact-phrase occurrence counts over everything the stream has landed
    * so far — [[TextAnalysis.phraseCountOver]]'s positional intersection
    * over the accumulated generations. Occurrence counts are NOT inert
    * under row duplication (the L-way join multiplies duplicated rows),
    * so the positions full-row-dedup first — the same guard as
    * [[search]]'s BM25 statistics. */
  def searchPhrase(spark: SparkSession, indexDir: String,
      phrase: Seq[String]): DataFrame =
    TextAnalysis.phraseCountOver(
      Generations.read(spark, s"$indexDir/positions", "gen-").dropDuplicates(),
      phrase)
}
