package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup

/** Continuous near-dup dedup: within-batch, cross-batch (via the
  * disk-resident signature index), and pre-seeded-corpus drop paths, plus
  * index-generation growth, across micro-batches.
  */
class StreamNearDedupSpec extends SparkTestBase {
  import spark.implicits._

  import graft.TestDocs.doc

  test("near-dups are dropped within a batch, across batches, and against a seeded corpus") {
    val tmp = Files.createTempDirectory("graft_snd_").toString
    val (indexDir, outDir, ckpt) = (s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")

    // pre-seed the index with an already-landed corpus doc (id 900)
    Dedup.buildNearDupIndex(
      Seq((900L, doc(900))).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(s"$indexDir/gen-seed")

    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    val q = StreamNearDedup.start(
      input.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt,
      "doc_id", "text",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData(
        (1L, doc(1)),            // fresh — survives
        (2L, doc(2)),            // fresh — survives
        (3L, doc(1) + " pad"),   // within-batch near-dup of 1 — drop
        (4L, doc(900) + " pad")) // near-dup of the seeded corpus — drop
      q.processAllAvailable()
      input.addData(
        (5L, doc(5)),            // fresh — survives
        (6L, doc(2) + " pad"))   // near-dup of batch-1 survivor 2 — drop
      q.processAllAvailable()

      val landed = StreamNearDedup.cleanedDocs(spark, outDir)
        .select("doc_id").as[Long].collect().toSet
      assert(landed == Set(1L, 2L, 5L), s"got $landed")

      // the index grew by one committed generation per batch (+ the seed),
      // holding exactly the seeded + landed signatures
      val idx = StreamNearDedup.currentIndex(spark, indexDir,
        template = sys.error("index must not be empty"))
      assert(idx.select("doc_id").as[Long].collect().toSet == Set(900L, 1L, 2L, 5L))
    } finally q.stop()
  }

  test("compactIndex folds all but the newest batch generation; probes are unchanged") {
    val tmp = Files.createTempDirectory("graft_snd_c_").toString
    val indexDir = s"$tmp/index"
    (1 to 3).foreach { g =>
      Dedup.buildNearDupIndex(
        Seq((g.toLong, doc(g))).toDF("doc_id", "text"), "doc_id", "text")
        .write.parquet(s"$indexDir/gen-$g")
    }
    StreamNearDedup.compactIndex(spark, indexDir)
    // gen-3 survives by design: it could be the stream's uncommitted
    // trailing batch, whose replay excludes it from its probe BY NAME —
    // folding it would make the replay drop the whole batch as dups
    val dirs = new java.io.File(indexDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("gen-compact-1", "gen-3"), s"got $dirs")
    val idx = StreamNearDedup.currentIndex(spark, indexDir,
      template = sys.error("index must not be empty"))
    assert(idx.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // nothing foldable remains (one compaction + the protected newest):
    // a second compaction is a no-op
    StreamNearDedup.compactIndex(spark, indexDir)
    assert(new java.io.File(indexDir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet == Set("gen-compact-1", "gen-3"))
    // an interrupted compaction (sources folded but not yet deleted)
    // self-heals: rows appear twice, the next fold dedups them
    Dedup.buildNearDupIndex(
      Seq((2L, doc(2))).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(s"$indexDir/gen-99") // duplicate of an already-folded row
    Dedup.buildNearDupIndex(
      Seq((4L, doc(4))).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(s"$indexDir/gen-100") // newest — protected
    StreamNearDedup.compactIndex(spark, indexDir)
    val idx2 = StreamNearDedup.currentIndex(spark, indexDir,
      template = sys.error("index must not be empty"))
    assert(idx2.collect().length == 4, "duplicate doc rows must fold away")
    // a probe against the compacted index still drops near-dups
    val batch = Seq((10L, doc(10)), (11L, doc(2) + " pad")).toDF("doc_id", "text")
    val out = Dedup.incrementalNearNew(idx2, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(10L))
  }

  test("compactEvery hook: mid-stream compactions via the batch loop, survivors identical") {
    // same arrivals through a hook-compacted stream and an uncompacted
    // one; near-dup pairs deliberately SPAN compaction boundaries (batch
    // 3 carries near-dups of batch-1 survivors, probed against the FOLDED
    // index)
    val batches = Seq(
      Seq((1L, doc(1)), (2L, doc(2))),
      Seq((3L, doc(3)), (4L, doc(1) + " pad")),   // cross-batch near-dup → drop
      Seq((5L, doc(5)), (6L, doc(2) + " pad")),   // probes the compacted index
      Seq((7L, doc(3) + " pad"), (8L, doc(8))),   // again after another fold
    )
    def run(compactEvery: Int): (Set[Long], Set[String]) = {
      val tmp = Files.createTempDirectory(s"graft_snd_h${compactEvery}_").toString
      val input = MemoryStream[(Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
      val q = StreamNearDedup.start(
        input.toDF().toDF("doc_id", "text"), s"$tmp/index", s"$tmp/out", s"$tmp/ckpt",
        "doc_id", "text",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
        compactEvery = compactEvery)
      try {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val survivors = StreamNearDedup.cleanedDocs(spark, s"$tmp/out")
        .select("doc_id").as[Long].collect().toSet
      val gens = new java.io.File(s"$tmp/index").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      (survivors, gens)
    }
    val (hooked, hookedGens) = run(compactEvery = 2)
    val (plain, plainGens) = run(compactEvery = 0)
    assert(hooked == plain, s"hooked $hooked != uncompacted $plain")
    assert(hooked == Set(1L, 2L, 3L, 5L, 8L), s"got $hooked")
    // the hook actually compacted (≥2 cycles at ids 1 and 3): folds exist
    // and far fewer generation dirs remain than the uncompacted run's 4
    assert(hookedGens.exists(_.startsWith("gen-compact-")), s"no fold in $hookedGens")
    assert(hookedGens.size < plainGens.size, s"$hookedGens vs $plainGens")
  }
}
