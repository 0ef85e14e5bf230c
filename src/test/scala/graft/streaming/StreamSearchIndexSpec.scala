package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.operators.TextAnalysis

/** Streaming search-index maintenance: after any sequence of arrival
  * batches — across restarts and hook-driven compaction cycles — BM25
  * over the landed postings equals the batch bm25Rank on the union of
  * everything that arrived.
  */
class StreamSearchIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("post-stream search equals batch BM25 on the union corpus, cross-restart") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    val q = TextAnalysis.searchQuery
    val batches = (0 to 3).map(i => all.filter(_._1 % 4 == i))
    val tmp = Files.createTempDirectory("graft_ssearch_").toString
    val (indexDir, ckpt) = (s"$tmp/idx", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    def runOnce(): Unit =
      StreamSearchIndex.start(
        input.toDF().toDF("doc_id", "text"), indexDir, ckpt,
        compactEvery = 2).awaitTermination()
    def searchNow(): Seq[(Long, Double)] =
      StreamSearchIndex.search(spark, indexDir, q, k = 25)
        .as[(Long, Double)].collect().toSeq
    def batchWant(corpus: Seq[(Long, String)]): Seq[(Long, Double)] =
      TextAnalysis.bm25Rank(corpus.toDF("doc_id", "text"),
          "doc_id", "text", q, k = 25)
        .as[(Long, Double)].collect().toSeq

    input.addData(batches(0): _*); runOnce()
    assert(searchNow() == batchWant(batches(0)),
      "mid-stream: search must equal batch BM25 on what arrived so far")

    input.addData(batches(1): _*); runOnce()
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds at batch id 3
    val gens = new java.io.File(s"$indexDir/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    assert(searchNow() == batchWant(all),
      "post-stream: search must equal batch BM25 on the union corpus")

    // lens carry every document exactly once after dedup; (N, avgdl)
    // therefore match the batch operator's corpus stats
    val lens = Generations.read(spark, s"$indexDir/lens", "gen-")
      .dropDuplicates().as[(Long, Int)].collect()
    assert(lens.length == all.size, "one doclen per arrived doc")

    // crash-window duplication is harmless: duplicate a compacted
    // generation wholesale (a fold whose source delete died) on BOTH
    // sides — df counts, (N, avgdl), and per-doc sums must not double
    // because search full-row-dedups first
    val aGen = gens.find(_.startsWith("gen-compact-")).get
    spark.read.parquet(s"$indexDir/postings/$aGen")
      .write.parquet(s"$indexDir/postings/gen-900")
    val lensGens = new java.io.File(s"$indexDir/lens").listFiles()
      .filter(_.isDirectory).map(_.getName)
    spark.read.parquet(s"$indexDir/lens/${lensGens.head}")
      .write.parquet(s"$indexDir/lens/gen-900")
    assert(searchNow() == batchWant(all),
      "duplicated index rows must not perturb BM25 statistics")

    // phrase serve over the streamed positions: equals the batch scan
    // kernel on the union corpus — across the compaction cycles above
    // and under a duplicated positions generation (occurrence counts
    // are not duplication-inert; searchPhrase dedups first)
    val p = TextAnalysis.searchPhrase
    def phraseWant(corpus: Seq[(Long, String)]): Map[Long, Int] =
      corpus.toDF("doc_id", "text")
        .select(col("doc_id"),
          TextAnalysis.phraseCount(col("text"), p).as("n_occ"))
        .filter(col("n_occ") > 0)
        .as[(Long, Int)].collect().toMap
    def phraseNow(): Map[Long, Int] =
      StreamSearchIndex.searchPhrase(spark, indexDir, p)
        .as[(Long, Int)].collect().toMap
    assert(phraseWant(all).nonEmpty, "the fixture phrase must occur at sf0.001")
    assert(phraseNow() == phraseWant(all),
      "streamed positional index must serve the batch phrase answer")
    val posGens = new java.io.File(s"$indexDir/positions").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(posGens.exists(_.startsWith("gen-compact-")), "positions must fold too")
    spark.read.parquet(s"$indexDir/positions/${posGens.head}")
      .write.parquet(s"$indexDir/positions/gen-900")
    assert(phraseNow() == phraseWant(all),
      "duplicated position rows must not inflate occurrence counts")
  }
}
