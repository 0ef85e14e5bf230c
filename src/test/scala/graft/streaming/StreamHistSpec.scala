package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Analytics

/** Continuously-maintained histograms: after any arrival interleaving —
  * across restarts and compaction cycles — the served range quantiles
  * equal the batch histQuantiles on the union of every arrival, and
  * folded state is bounded at one row per (day, bin).
  */
class StreamHistSpec extends SparkTestBase {
  import spark.implicits._

  test("served quantiles equal the batch answer on the union, cross-restart, bounded state") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.sources.Tables.load(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect().toSeq.sortBy(_._1)
    // interleave days across batches: contiguous quarters of the
    // id-ordered stream deliver every day's counts split across batches
    val batches = all.grouped((all.size + 3) / 4).toSeq
    val tmp = Files.createTempDirectory("graft_shist_").toString
    val (state, ckpt) = (s"$tmp/state", s"$tmp/ckpt")
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)](
      org.apache.spark.sql.Encoders
        .product[(Long, Timestamp, Long, String, Double)], spark.sqlContext)
    val (from, to, ps) = ("2024-01-05", "2024-01-20", Seq(0.5, 0.9))
    def runOnce(): Unit =
      StreamHist.start(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
        state, ckpt, compactEvery = 2).awaitTermination()
    def now(): Set[(Double, Double, Long)] =
      StreamHist.quantiles(spark, state, from, to, ps)
        .as[(Double, Double, Long)].collect().toSet
    def want(c: Seq[(Long, Timestamp, Long, String, Double)]): Set[(Double, Double, Long)] =
      Analytics.histQuantiles(
        Analytics.dailyValueHistograms(
          c.toDF("event_id", "ts", "user_id", "event_type", "value")),
        from, to, ps)
        .as[(Double, Double, Long)].collect().toSet

    input.addData(batches(0): _*); runOnce()
    assert(now() == want(batches(0)),
      "mid-stream: served quantiles must equal the batch answer on what arrived")

    input.addData(batches(1): _*); runOnce()
    input.addData(batches(2): _*); runOnce()
    input.addData(batches(3): _*); runOnce() // hook folds at batch id 3
    assert(now() == want(all),
      "post-stream: served quantiles must equal the batch answer on the union")

    // the merged histogram state equals the batch histogram exactly
    val gotHist = StreamHist.histogram(spark, state)
      .as[(java.sql.Date, Long, Long)].collect().toSet
    val wantHist = Analytics.dailyValueHistograms(
        all.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    assert(gotHist == wantHist)

    // the fold is manifested and bounds state at one row per (day, bin)
    val gens = new java.io.File(s"$state/rows").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    val live = Generations.live(spark, s"$state/rows").toSet
    assert(gens.diff(live).nonEmpty,
      s"expected manifest-excluded sources on disk; gens=$gens live=$live")
    val foldDups = Generations.readNames(spark, s"$state/rows",
        live.filter(_.startsWith("gen-compact-")).toSeq, "gen-")
      .groupBy("day", "bin").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(foldDups == 0L, "folded state must hold one row per (day, bin)")

    // a manual compaction cycle keeps the law
    StreamHist.compactState(spark, state)
    assert(now() == want(all),
      "served quantiles must stay exact after a manual compaction cycle")
  }
}
