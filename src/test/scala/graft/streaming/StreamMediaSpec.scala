package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Continuous perceptual media dedup: within-batch, cross-batch (via the
  * disk-resident signature index), and pre-seeded-corpus drop paths;
  * post-stream admitted set ≡ the serial batch fold of the incremental
  * gate, across restarts and compaction cycles.
  */
class StreamMediaSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def payloads(): Seq[(Long, Array[Byte])] = {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    docs.map { case (id, t) => (id, t.getBytes("UTF-8")) }
  }

  test("near media are dropped within a batch, across batches, and against a seeded corpus") {
    val all = payloads()
    val tmp = Files.createTempDirectory("graft_smedia_").toString
    val (indexDir, outDir, ckpt) = (s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")

    // pre-seed the index with an already-landed asset (the first doc)
    val (seedId, seedBytes) = all.head
    Multimodal.buildMediaSigIndex(
      Seq((seedId + 5000000L, seedBytes)).toDF("media_id", "payload"),
      "media_id", "payload")
      .write.parquet(s"$indexDir/gen-seed")

    def tail(b: Array[Byte]): Array[Byte] = b ++ " graftdup".getBytes("UTF-8")
    val fresh = all.drop(1).take(3) // three fresh assets
    val input = MemoryStream[(Long, Array[Byte])](
      org.apache.spark.sql.Encoders.product[(Long, Array[Byte])],
      spark.sqlContext)
    val q = StreamMedia.start(
      input.toDF().toDF("media_id", "payload"), indexDir, outDir, ckpt,
      "media_id", "payload",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData(
        fresh(0),                                   // fresh — survives
        fresh(1),                                   // fresh — survives
        (9000001L, tail(fresh(0)._2)),              // within-batch near of fresh(0) — drop
        (9000002L, tail(seedBytes)))                // near the seeded corpus — drop
      q.processAllAvailable()
      input.addData(
        fresh(2),                                   // fresh — survives
        (9000003L, tail(fresh(1)._2)))              // near batch-1 survivor — drop
      q.processAllAvailable()

      val landed = StreamMedia.admittedMedia(spark, outDir)
        .select("media_id").as[Long].collect().toSet
      assert(landed == Set(fresh(0)._1, fresh(1)._1, fresh(2)._1), s"got $landed")
      val idx = StreamMedia.currentIndex(spark, indexDir,
        template = sys.error("index must not be empty"))
      assert(idx.select("media_id").as[Long].collect().toSet ==
        Set(seedId + 5000000L, fresh(0)._1, fresh(1)._1, fresh(2)._1))
    } finally q.stop()
  }

  test("post-stream admitted set equals the serial batch fold of the incremental gate") {
    val all = payloads()
    // arrivals: every asset, plus a tailed near-copy of every 4th one
    // scattered into LATER batches than its original (cross-batch drops)
    val copies = all.filter(_._1 % 4 == 0)
      .map { case (id, b) => (id + 7000000L, b ++ " graftdup".getBytes("UTF-8")) }
    val arrivals = all ++ copies
    val batches = (0 to 3).map(i => arrivals.filter(_._1 % 4 == i))
    val tmp = Files.createTempDirectory("graft_smedia_law_").toString
    val (indexDir, outDir, ckpt) = (s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")
    val input = MemoryStream[(Long, Array[Byte])](
      org.apache.spark.sql.Encoders.product[(Long, Array[Byte])],
      spark.sqlContext)
    // each runOnce is a fresh AvailableNow query off the shared
    // checkpoint — every batch boundary here IS a restart
    def runOnce(): Unit =
      StreamMedia.start(input.toDF().toDF("media_id", "payload"),
        indexDir, outDir, ckpt, "media_id", "payload", compactEvery = 2)
        .awaitTermination()
    batches.foreach { b => input.addData(b: _*); runOnce() }

    // serial batch fold of the gate over the same batch sequence
    var landedIdx = Multimodal.buildMediaSigIndex(
      Seq.empty[(Long, Array[Byte])].toDF("media_id", "payload"),
      "media_id", "payload")
    var admitted = Set.empty[Long]
    batches.foreach { b =>
      val survivors = Multimodal.incrementalMediaNew(landedIdx,
        b.toDF("media_id", "payload"), "media_id", "payload")
      admitted ++= survivors.select("media_id").as[Long].collect()
      landedIdx = landedIdx.unionByName(Multimodal.buildMediaSigIndex(
        survivors, "media_id", "payload")).localCheckpoint()
    }
    val got = StreamMedia.admittedMedia(spark, outDir)
      .select("media_id").as[Long].collect().toSet
    assert(got == admitted, s"stream=$got\nbatch fold=$admitted")
    // compaction ran (batch ids 1 and 3 hit the hook) and the law held
    val gens = new java.io.File(indexDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens.exists(_.startsWith("gen-compact-")), s"no fold in $gens")
    // signatures in the index are exactly the admitted assets'
    val idx = StreamMedia.currentIndex(spark, indexDir,
      template = sys.error("index must not be empty"))
    assert(idx.select("media_id").as[Long].collect().toSet == admitted)
  }
}
