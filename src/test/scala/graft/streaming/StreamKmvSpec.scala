package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Sketches

/** Continuously-maintained KMV sketches: after any arrival interleaving
  * — across restarts, under element duplication, and through compaction
  * cycles — the served estimates equal the batch sketch family on the
  * union of every arrival, and folded state is bounded at k rows per
  * segment. */
class StreamKmvSpec extends SparkTestBase {
  import spark.implicits._

  test("served estimates equal the batch answer on the union, cross-restart, bounded state") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.load(spark, dir, "events")
      .select("event_type", "user_id")
      .as[(String, Long)].collect().toSeq
    // interleave: contiguous quarters split each segment's audience
    // across batches, and batch 2 REPLAYS batch 0 entirely (the
    // duplication-inertness probe — the law must hold anyway)
    val quarters = all.grouped((all.size + 2) / 3).toSeq
    val batches = Seq(quarters(0), quarters(1), quarters(0), quarters(2))
    val tmp = Files.createTempDirectory("graft_skmv_").toString
    val (state, ckpt) = (s"$tmp/state", s"$tmp/ckpt")
    val input = MemoryStream[(String, Long)](
      org.apache.spark.sql.Encoders.product[(String, Long)], spark.sqlContext)
    def runOnce(): Unit =
      StreamKmv.start(input.toDF().toDF("event_type", "user_id"),
        state, ckpt, compactEvery = 2).awaitTermination()
    def now(): Set[(String, Long, Double)] =
      StreamKmv.estimates(spark, state)
        .as[(String, Long, Double)].collect().toSet
    def want(c: Seq[(String, Long)]): Set[(String, Long, Double)] =
      Sketches.kmvEstimates(Sketches.kmvSketch(
          c.toDF("event_type", "user_id"), "event_type", "user_id"))
        .as[(String, Long, Double)].collect().toSet

    input.addData(batches(0): _*); runOnce()
    assert(now() == want(batches(0)),
      "mid-stream: served estimates must equal the batch answer on what arrived")

    input.addData(batches(1): _*); runOnce()
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds at batch id 3
    assert(now() == want(all),
      "post-stream: duplication and interleaving must not move any estimate")

    // the folded sketch equals the batch sketch exactly, bounded at k
    val got = StreamKmv.sketch(spark, state).as[(String, Long)].collect().toSet
    val wantSk = Sketches.kmvSketch(all.toDF("event_type", "user_id"),
      "event_type", "user_id").as[(String, Long)].collect().toSet
    assert(got == wantSk)
    assert(got.groupBy(_._1).values.forall(_.size <= Sketches.DefaultK))

    // compaction happened and is manifested (sources excluded, on disk)
    val gens = new java.io.File(s"$state/rows").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    val live = Generations.live(spark, s"$state/rows").toSet
    assert(gens.diff(live).nonEmpty,
      s"expected manifest-excluded sources on disk; gens=$gens live=$live")

    // pairwise serve off live state equals the batch pair algebra
    val gotOps = StreamKmv.setOps(spark, state)
      .as[(String, String, Double, Double, Double)].collect().toSet
    val wantOps = Sketches.kmvSetOps(Sketches.kmvSketch(
        all.toDF("event_type", "user_id"), "event_type", "user_id"))
      .as[(String, String, Double, Double, Double)].collect().toSet
    assert(gotOps == wantOps)

    // a manual compaction cycle keeps the law
    StreamKmv.compactState(spark, state)
    assert(now() == want(all),
      "served estimates must stay exact after a manual compaction cycle")
  }
}
