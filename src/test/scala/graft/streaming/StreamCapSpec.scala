package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TextAnalysis

/** Streaming per-source cap: after any sequence of arrival batches —
  * across restarts and compaction cycles — the kept set equals the
  * batch sourceCap on the union of everything that arrived, including
  * displacement of an earlier-admitted doc by a later lower-hash
  * arrival of the same source.
  */
class StreamCapSpec extends SparkTestBase {
  import spark.implicits._

  test("post-stream kept set equals batch sourceCap on the union, cross-restart") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "source").as[(Long, String)].collect().toSeq.sortBy(_._1)
    val cap = 2
    // the cap must BIND for the law to check anything
    assert(all.groupBy(_._2).values.exists(_.size > cap))
    // contiguous quarters, NOT doc_id % 4: the fixture's source is
    // doc_id mod 20, which % 4 aliases (20 ≡ 0 mod 4) — every source
    // would land wholly in one batch and displacement could never occur
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val tmp = Files.createTempDirectory("graft_scap_").toString
    val (state, ckpt) = (s"$tmp/state", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    def runOnce(): Unit =
      StreamCap.start(input.toDF().toDF("doc_id", "source"),
        state, ckpt, cap, compactEvery = 2).awaitTermination()
    def now(): Set[(String, Long)] =
      StreamCap.kept(spark, state, cap).as[(String, Long)].collect().toSet
    def want(c: Seq[(Long, String)]): Set[(String, Long)] =
      TextAnalysis.sourceCap(c.toDF("doc_id", "source"), cap)
        .as[(String, Long)].collect().toSet

    input.addData(batches(0): _*); runOnce()
    assert(now() == want(batches(0)),
      "mid-stream: the kept set must equal the batch cap on what arrived")

    input.addData(batches(1): _*); runOnce()
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds at batch id 3
    assert(now() == want(all),
      "post-stream: the kept set must equal the batch cap on the union")
    // displacement actually happened: some early arrival fell out of
    // the final kept set (otherwise the cap/admission distinction — the
    // point of the law — went unexercised)
    assert(want(batches(0)).exists(k => !now().contains(k)),
      "a later lower-hash arrival must displace an early admit")

    // the fold went through the absorbing cap cut — state is bounded
    val gens = new java.io.File(s"$state/rows").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    val live = Generations.live(spark, s"$state/rows").toSet
    assert(gens.diff(live).nonEmpty,
      s"expected manifest-excluded sources on disk; gens=$gens live=$live")
    val foldMax = Generations.readNames(spark, s"$state/rows",
        live.filter(_.startsWith("gen-compact-")).toSeq, "gen-")
      .groupBy("source").count()
      .agg(org.apache.spark.sql.functions.max("count"))
      .as[Long].collect().head
    assert(foldMax <= cap, s"folded state must hold ≤ cap per source, got $foldMax")

    // a manual compaction cycle keeps the law
    StreamCap.compactState(spark, state, cap)
    assert(now() == want(all),
      "the kept set must stay exact after a manual compaction cycle")
  }
}
