package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.operators.Similarity

/** Streaming IVF-PQ index maintenance: after any sequence of arrival
  * batches — across restarts and hook-driven compaction cycles — search
  * over the landed code list equals the batch topKPqIvfWith on the union
  * of everything that arrived.
  */
class StreamIvfPqSpec extends SparkTestBase {
  import spark.implicits._

  test("post-stream search equals batch IVF-PQ on the union corpus, cross-restart") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    // fixed quantizers: the corpus dir's landed artifacts (trained+landed
    // on first use; every batch and the batch-side oracle share them)
    val (centroids, book) = Similarity.loadLandedQuantizers(spark, dir)
    val all = emb.as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
    // four arrival batches, each in its own restarted query, compaction
    // hooked every 2nd batch id (a fold needs >1 settled source, so the
    // first fold actually happens at batch id 3 over gen-0..2)
    val batches = (0 to 3).map(i => all.filter(_._1 % 4 == i))
    val tmp = Files.createTempDirectory("graft_sivfpq_").toString
    val (indexDir, ckpt) = (s"$tmp/idx", s"$tmp/ckpt")
    val input = MemoryStream[(Long, Array[Float])](
      org.apache.spark.sql.Encoders.product[(Long, Array[Float])], spark.sqlContext)
    def runOnce(): Unit = {
      val q = StreamIvfPq.start(
        input.toDF().toDF("vec_id", "embedding"), indexDir, ckpt,
        centroids, book, compactEvery = 2)
      q.awaitTermination()
    }
    def queries(ofCorpus: Seq[Long]) =
      emb.filter(col("vec_id").isin(ofCorpus: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    def searchNow(qIds: Seq[Long]): Set[(Long, Long, Double)] =
      StreamIvfPq.search(spark, indexDir, queries(qIds), centroids, book)
        .as[(Long, Long, Double)].collect().toSet
    def batchWant(corpus: Seq[(Long, Array[Float])], qIds: Seq[Long]): Set[(Long, Long, Double)] =
      Similarity.topKPqIvfWith(
        corpus.toDF("vec_id", "embedding"), queries(qIds),
        k = 5, nprobe = 4, m = 8, subDim = 8, centroids, book)
        .as[(Long, Long, Double)].collect().toSet

    val probeIds = Similarity.defaultProbeIds

    input.addData(batches(0): _*); runOnce()
    assert(searchNow(probeIds) == batchWant(batches(0), probeIds),
      "mid-stream: search must equal batch IVF-PQ on what arrived so far")

    input.addData(batches(1): _*); runOnce()
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds gen-0..2 at id 3
    // ≥1 hook compaction actually ran
    val gens = new java.io.File(indexDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    assert(searchNow(probeIds) == batchWant(all, probeIds),
      "post-stream: search must equal batch IVF-PQ on the union corpus")

    // index rows are the full inverted list: m rows per vector
    val rows = Generations.read(spark, indexDir, "gen-").count()
    assert(rows == all.size * 8L, s"got $rows")

    // crash-window duplication is harmless to search: duplicate an
    // existing generation wholesale (a fold whose source delete died),
    // answers must not change because candidates are deduped post-prune
    val aGen = gens.find(_.startsWith("gen-compact-")).get
    spark.read.parquet(s"$indexDir/$aGen")
      .write.parquet(s"$indexDir/gen-900")
    assert(searchNow(probeIds) == batchWant(all, probeIds),
      "duplicated index rows must not double ADC sums")
  }
}
