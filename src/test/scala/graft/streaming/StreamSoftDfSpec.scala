package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup

/** Continuously-maintained gram document frequencies: after any arrival
  * interleaving — across restarts and compaction cycles — the served
  * soft-dedup weights equal the batch softDedupWeights on the union of
  * every arrival, and folded state is bounded at one row per gram.
  */
class StreamSoftDfSpec extends SparkTestBase {
  import spark.implicits._

  test("served weights equal the batch answer on the union, cross-restart, bounded state") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val tmp = Files.createTempDirectory("graft_softdf_").toString
    val (state, ckpt) = (s"$tmp/state", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    def runOnce(): Unit =
      StreamSoftDf.start(input.toDF().toDF("doc_id", "text"),
        state, ckpt, compactEvery = 2).awaitTermination()
    def now(c: Seq[(Long, String)]): Set[(Long, Long, Double, Double)] =
      StreamSoftDf.weights(spark, state, c.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Double, Double)].collect().toSet
    def want(c: Seq[(Long, String)]): Set[(Long, Long, Double, Double)] =
      Dedup.softDedupWeights(c.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Long, Double, Double)].collect().toSet

    input.addData(batches(0): _*); runOnce()
    assert(now(batches(0)) == want(batches(0)),
      "mid-stream: served weights must equal the batch answer on what arrived")

    input.addData(batches(1): _*); runOnce() // restart between batches
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds at batch id 3
    assert(now(all) == want(all),
      "post-stream: served weights must equal the batch answer on the union")

    // the merged df state equals the batch df relation exactly
    val gotDf = StreamSoftDf.dfRows(spark, state)
      .as[(Long, Long)].collect().toSet
    val wantDf = all.toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(
          Dedup.shingleHashes(org.apache.spark.sql.functions.col("text"), 3)))
        .as("gh"))
      .groupBy("gh").count()
      .as[(Long, Long)].collect().toSet
    assert(gotDf == wantDf)

    // the fold is manifested and bounds state at one row per gram
    val gens = new java.io.File(s"$state/rows").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    val live = Generations.live(spark, s"$state/rows").toSet
    assert(gens.diff(live).nonEmpty,
      s"expected manifest-excluded sources on disk; gens=$gens live=$live")
    val foldDups = Generations.readNames(spark, s"$state/rows",
        live.filter(_.startsWith("gen-compact-")).toSeq, "gen-")
      .groupBy("gh").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(foldDups == 0L, "folded state must hold one row per gram")

    // a manual compaction cycle keeps the law
    StreamSoftDf.compactState(spark, state)
    assert(now(all) == want(all),
      "served weights must stay exact after a manual compaction cycle")
  }

  test("noveltyArrivals equals the batch novelty on (landed ∪ batch) restricted to the batch") {
    val landed = Seq((1L, "one two three four"), (2L, "alpha beta gamma delta"))
    val batch = Seq(
      (10L, "one two three four"),     // full re-crawl of landed → 0.0
      (11L, "quiet river stone path"), // fresh → 1.0
      (12L, "quiet river stone path"), // within-batch copy of 11 → 0.0
      (13L, "one two three stone"))    // landed gram + fresh gram → 0.5
    val tmp = Files.createTempDirectory("graft_softdf_nov_").toString
    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    input.addData(landed: _*)
    StreamSoftDf.start(input.toDF().toDF("doc_id", "text"),
      s"$tmp/state", s"$tmp/ckpt").awaitTermination()
    val got = StreamSoftDf.noveltyArrivals(spark, s"$tmp/state",
        batch.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().toSet
    val want = graft.operators.Dedup
      .noveltyScores((landed ++ batch).toDF("doc_id", "text"), "doc_id", "text")
      .filter($"doc_id" >= 10L)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == want, s"got $got want $want")
    assert(got.exists(r => r._1 == 10L && r._4 == 0.0))
    assert(got.exists(r => r._1 == 11L && r._4 == 1.0))
    assert(got.exists(r => r._1 == 12L && r._4 == 0.0))
    assert(got.exists(r => r._1 == 13L && r._4 == 0.5))
  }

  test("delete: serve equals rebuild on remaining; idempotent, re-delete inert, fold absorbs") {
    val b0 = Seq((1L, "one two three four"), (2L, "one two three four"),
      (3L, "alpha beta gamma delta"), (4L, "solo sample body here"))
    val b1 = Seq((5L, "one two three four"), // third copy of 1/2's text
      (6L, "quiet river stone path"), (7L, "alpha beta gamma delta"))
    val tmp = Files.createTempDirectory("graft_softdf_del_").toString
    val (state, ckpt) = (s"$tmp/state", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    def runOnce(): Unit =
      StreamSoftDf.start(input.toDF().toDF("doc_id", "text"),
        state, ckpt).awaitTermination()
    input.addData(b0: _*); runOnce()
    input.addData(b1: _*); runOnce()

    val deleted = Seq((1L, "one two three four"), (6L, "quiet river stone path"))
    val remaining = (b0 ++ b1).filterNot(d => deleted.map(_._1).contains(d._1))
    def served(): Set[(Long, Long, Double, Double)] =
      StreamSoftDf.weights(spark, state, remaining.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Double, Double)].collect().toSet
    val rebuild = graft.operators.Dedup
      .softDedupWeights(remaining.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().toSet

    StreamSoftDf.delete(spark, state, "req1", deleted.toDF("doc_id", "text"))
    assert(served() == rebuild,
      "post-delete serve must equal the batch answer on (arrived − deleted)")

    // replaying the SAME request (the crash-window rule) changes nothing
    StreamSoftDf.delete(spark, state, "req1", deleted.toDF("doc_id", "text"))
    assert(served() == rebuild, "same-requestId replay must be byte-inert")

    // a LATER request deleting already-tombstoned ids cannot double-subtract
    StreamSoftDf.delete(spark, state, "req2",
      Seq((1L, "one two three four")).toDF("doc_id", "text"))
    assert(served() == rebuild, "re-deleting a deleted id must be a no-op")

    // the fold absorbs the negative deltas; fully-deleted grams vanish
    StreamSoftDf.compactState(spark, state)
    assert(served() == rebuild, "post-fold serve must stay exact")
    val foldedNeg = StreamSoftDf.dfRows(spark, state)
      .filter($"df" <= 0).count()
    assert(foldedNeg == 0L, "no non-positive df rows may survive the fold")
    // doc 6 was the only holder of its grams — they must be gone entirely
    val doc6Grams = Seq((6L, "quiet river stone path")).toDF("doc_id", "text")
    val doc6Hits = StreamSoftDf.weights(spark, state, doc6Grams, "doc_id", "text")
      .count()
    assert(doc6Hits == 0L, "grams held only by a deleted doc must be absent")
  }
}
