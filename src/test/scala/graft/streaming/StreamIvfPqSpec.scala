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

    // CRASH/DEFERRED WINDOW: the manifested fold defers source deletes to
    // the NEXT compaction, so right now the fold AND (some of) its sources
    // coexist on disk — exactly the state a crashed post-fold delete
    // leaves. ADC sums are not duplication-inert; readers must resolve
    // manifests (Generations.live) rather than dedup per query.
    val live = Generations.live(spark, indexDir).toSet
    assert(gens.diff(live).nonEmpty,
      s"expected manifest-excluded sources still on disk; gens=$gens live=$live")
    // index rows (live, manifest-resolved) are the full inverted list:
    // m rows per vector, exactly once
    val rows = StreamIvfPq.currentIndex(spark, indexDir,
      template = sys.error("gens exist")).count()
    assert(rows == all.size * 8L, s"got $rows")

    // generations land partitioned by cell_id and the serve scan prunes:
    // the probed cells appear as PartitionFilters on the generation read
    assert(gens.exists(g => new java.io.File(s"$indexDir/$g").listFiles() != null &&
      new java.io.File(s"$indexDir/$g").listFiles().exists(_.getName.startsWith("cell_id="))),
      "generation dirs must be physically partitioned by cell_id")
    val served = StreamIvfPq.search(spark, indexDir, queries(probeIds), centroids, book)
    served.collect()
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(raw"PartitionFilters: \[[^\]]*cell_id".r.findFirstIn(plan).isDefined,
      s"serve scan must carry a cell_id partition filter:\n$plan")

    // a crashed fold's tmp dir is invisible to readers and swept by the
    // next compaction
    val tmpFold = new java.io.File(s"$indexDir/tmp-gen-compact-99")
    tmpFold.mkdirs()
    assert(searchNow(probeIds) == batchWant(all, probeIds),
      "an uncommitted tmp fold must be invisible to search")
    StreamIvfPq.compactIndex(spark, indexDir)
    assert(!tmpFold.exists(), "next compaction must sweep crashed tmp folds")
    assert(searchNow(probeIds) == batchWant(all, probeIds),
      "search must be exact after a manual compaction cycle")
  }
}
