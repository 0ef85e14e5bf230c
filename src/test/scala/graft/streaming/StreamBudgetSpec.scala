package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TextAnalysis

/** Streaming absolute token budget: after any sequence of arrival
  * batches — across restarts and compaction cycles — the kept set
  * equals the batch budgetCap on the union of everything that arrived,
  * including displacement of an earlier-admitted doc whose prefix mass
  * a later lower-hash arrival pushed over budget.
  */
class StreamBudgetSpec extends SparkTestBase {
  import spark.implicits._

  test("post-stream kept set equals batch budgetCap on the union, cross-restart") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    // ~one document per source (docs average ~45 tokens): the second
    // md5-ordered doc of a source almost always sits past the budget, so
    // any source whose first ARRIVAL is not its md5-min doc displaces
    val budget = 40L
    // contiguous quarters (the StreamCapSpec aliasing rationale): sources
    // repeat mod 20, so id-contiguous slices spread each source across
    // batches and displacement can occur
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val tmp = Files.createTempDirectory("graft_sbudget_").toString
    val (state, ckpt) = (s"$tmp/state", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String, String)](
      org.apache.spark.sql.Encoders.product[(Long, String, String)],
      spark.sqlContext)
    def runOnce(): Unit =
      StreamBudget.start(input.toDF().toDF("doc_id", "text", "source"),
        state, ckpt, budget, compactEvery = 2).awaitTermination()
    def now(): Set[(Long, String, Long)] =
      StreamBudget.kept(spark, state, budget)
        .as[(Long, String, Long)].collect().toSet
    def want(c: Seq[(Long, String, String)]): Set[(Long, String, Long)] =
      TextAnalysis.budgetCap(c.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", budget)
        .as[(Long, String, Long)].collect().toSet
    // the budget must BIND for the law to check anything
    assert(want(all).size < all.size)

    input.addData(batches(0): _*); runOnce()
    assert(now() == want(batches(0)),
      "mid-stream: the kept set must equal the batch cut on what arrived")

    input.addData(batches(1): _*); runOnce()
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds at batch id 3
    assert(now() == want(all),
      "post-stream: the kept set must equal the batch cut on the union")
    // displacement actually happened (the cut is a corpus property, not
    // an admission gate)
    assert(want(batches(0)).exists(k => !now().contains(k)),
      "a later lower-hash arrival must displace an early admit")

    // the fold went through the absorbing cut — state is bounded at
    // ~budget tokens per source (+ the boundary document)
    val gens = new java.io.File(s"$state/rows").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    val live = Generations.live(spark, s"$state/rows").toSet
    assert(gens.diff(live).nonEmpty,
      s"expected manifest-excluded sources on disk; gens=$gens live=$live")
    val overBudget = Generations.readNames(spark, s"$state/rows",
        live.filter(_.startsWith("gen-compact-")).toSeq, "gen-")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"),
        org.apache.spark.sql.functions.max("n_tokens").as("m"))
      .filter(org.apache.spark.sql.functions.col("t") >=
        org.apache.spark.sql.functions.col("m") + budget)
      .count()
    assert(overBudget == 0L,
      "folded state must hold < budget + boundary-doc tokens per source")

    // a manual compaction cycle keeps the law
    StreamBudget.compactState(spark, state, budget)
    assert(now() == want(all),
      "the kept set must stay exact after a manual compaction cycle")
  }
}
