package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, concat_ws}
import graft.operators.Dedup

/** Streaming entity resolution: after any sequence of arrival batches —
  * across restarts and hook-driven compaction cycles — the canonical
  * entity set equals batch resolveEntities on the union of everything
  * that arrived.
  */
class StreamLinkSpec extends SparkTestBase {
  import spark.implicits._

  test("post-stream canonical set equals batch resolveEntities on the union, cross-restart") {
    val dir = "/root/testdata/sf0.001"
    // the resolveCustomers blocking: fuzzy-match the name only within
    // (mktsegment, nationkey) blocks
    val all = graft.sources.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"),
        concat_ws("|", col("c_mktsegment"),
          col("c_nationkey").cast("string"), col("c_name")).as("blocked_name"),
        col("c_acctbal").cast("double").as("c_acctbal"))
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    val batches = (0 to 3).map(i => all.filter(_._1 % 4 == i))
    val tmp = Files.createTempDirectory("graft_slink_").toString
    val (stateDir, ckpt) = (s"$tmp/state", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String, Double)](
      org.apache.spark.sql.Encoders.product[(Long, String, Double)], spark.sqlContext)
    def runOnce(): Unit =
      StreamLink.start(
        input.toDF().toDF("c_custkey", "blocked_name", "c_acctbal"),
        stateDir, ckpt, "c_custkey", "blocked_name",
        compactEvery = 2).awaitTermination()
    def nowSet(): Set[(Long, Long, Long)] =
      StreamLink.canonicalEntities(spark, stateDir, "c_custkey", col("c_acctbal"))
        .select(col("c_custkey").cast("long"), col("component").cast("long"),
          col("n_members").cast("long"))
        .as[(Long, Long, Long)].collect().toSet
    def batchWant(corpus: Seq[(Long, String, Double)]): Set[(Long, Long, Long)] =
      Dedup.resolveEntities(
        corpus.toDF("c_custkey", "blocked_name", "c_acctbal"),
        "c_custkey", "blocked_name", col("c_acctbal"))
        .select(col("c_custkey").cast("long"), col("component").cast("long"),
          col("n_members").cast("long"))
        .as[(Long, Long, Long)].collect().toSet

    input.addData(batches(0): _*); runOnce()
    assert(nowSet() == batchWant(batches(0)),
      "mid-stream: canonical set must equal batch resolution of what arrived so far")

    input.addData(batches(1): _*); runOnce()
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds gen-0..2 at id 3
    val want = batchWant(all)
    assert(want.exists(_._3 > 1), "the fixture must produce non-singleton entities")
    assert(nowSet() == want,
      "post-stream: canonical set must equal batch resolveEntities on the union")

    // a compaction cycle ran via the hook, and the manifested fold keeps
    // (some) folded sources on disk until the next cycle — readers must
    // exclude them (n_members is not duplication-inert)
    val pairGens = new java.io.File(s"$stateDir/pairs").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(pairGens.exists(_.startsWith("gen-compact-")), s"no fold in $pairGens")
    // cross-batch links exist: entities spanning two arrival batches
    // prove the landed variant index was probed, not just the batch
    val pairs = StreamLink.currentPairs(spark, stateDir)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 % 4 != p._2 % 4),
      "some discovered pair must span two arrival batches")

    // manual compaction keeps every law intact
    StreamLink.compactState(spark, stateDir)
    assert(nowSet() == want, "canonical set must survive a manual compaction cycle")
  }
}
