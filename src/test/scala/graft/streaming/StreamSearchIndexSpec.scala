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

    // CRASH/DEFERRED WINDOW: the manifested fold defers source deletes
    // to the NEXT compaction, so the fold and (some of) its sources
    // coexist on disk right now — BM25 statistics are not
    // duplication-inert; the exact search above proves readers resolve
    // manifests instead of dedup-scanning per query
    val live = Generations.live(spark, s"$indexDir/postings").toSet
    assert(gens.diff(live).nonEmpty,
      s"expected manifest-excluded sources still on disk; gens=$gens live=$live")

    // live lens generations carry every document exactly once, and the
    // additive stats sidecar sums to the batch operator's (N, dl_sum)
    val lens = Generations.readNames(spark, s"$indexDir/lens",
        Generations.live(spark, s"$indexDir/lens"), "gen-")
      .as[(Long, Int)].collect()
    assert(lens.length == all.size, "one doclen per arrived doc, no dedup needed")
    val stats = Generations.readNames(spark, s"$indexDir/stats",
        Generations.live(spark, s"$indexDir/stats"), "gen-")
      .agg(org.apache.spark.sql.functions.sum("n_docs"),
        org.apache.spark.sql.functions.sum("dl_sum"))
      .as[(Long, Long)].collect().head
    assert(stats == ((all.size.toLong, lens.map(_._2.toLong).sum)),
      "stats sidecars must sum to the corpus (n_docs, dl_sum)")

    // the serve plan is PRUNED and stats-sidecar-fed: the postings scan
    // carries a bkt partition filter, and no doclens path is scanned
    val served = StreamSearchIndex.search(spark, indexDir, q, k = 25)
    served.collect()
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(raw"PartitionFilters: \[[^\]]*bkt".r.findFirstIn(plan).isDefined,
      s"postings serve scan must carry a bkt partition filter:\n$plan")
    assert(!plan.contains("/lens/"),
      s"serve must read the stats sidecar, not rescan doclens:\n$plan")
    // generation dirs are physically partitioned by term bucket
    assert(gens.exists(g => Option(new java.io.File(s"$indexDir/postings/$g")
      .listFiles()).exists(_.exists(_.getName.startsWith("bkt=")))),
      "postings generations must be physically partitioned by bkt")

    // phrase serve over the streamed positions: equals the batch scan
    // kernel on the union corpus — across the compaction cycles above
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

    // proximity serve over the same streamed positions: equals the batch
    // minimum-covering-window operator on the union corpus
    val pq = TextAnalysis.searchQuery
    def proxWant(corpus: Seq[(Long, String)]): Map[Long, Long] =
      TextAnalysis.proximityRank(corpus.toDF("doc_id", "text"),
        "doc_id", "text", pq).as[(Long, Long)].collect().toMap
    def proxNow(): Map[Long, Long] =
      StreamSearchIndex.searchProximity(spark, indexDir, pq)
        .as[(Long, Long)].collect().toMap
    assert(proxWant(all).nonEmpty, "the fixture query must co-occur at sf0.001")
    assert(proxNow() == proxWant(all),
      "streamed positional index must serve the batch proximity answer")

    // a crashed fold's tmp dir is invisible; the next compaction sweeps
    // it and the deferred sources, and answers stay exact
    val tmpFold = new java.io.File(s"$indexDir/postings/tmp-gen-compact-99")
    tmpFold.mkdirs()
    assert(searchNow() == batchWant(all),
      "an uncommitted tmp fold must be invisible to search")
    StreamSearchIndex.compactIndex(spark, indexDir)
    assert(!tmpFold.exists(), "next compaction must sweep crashed tmp folds")
    assert(searchNow() == batchWant(all) && phraseNow() == phraseWant(all),
      "search must stay exact after a manual compaction cycle")
  }
}
