package graft.streaming

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Dedup

/** Continuous containment admission: excerpt drops within a batch,
  * across batches, and against a seeded corpus; SUPERSET arrivals
  * survive; index generations grow by survivors only and stay
  * consistent through the in-loop compaction hook.
  */
class StreamContainSpec extends SparkTestBase {
  import spark.implicits._

  import graft.TestDocs.doc

  private def excerpt(i: Int): String =
    doc(i, n = 40).split(" ").take(15).mkString(" ")

  test("excerpts drop at every distance; supersets and fresh docs survive") {
    val tmp = Files.createTempDirectory("graft_sct_").toString
    val (indexDir, outDir, ckpt) = (s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")

    // pre-seed the index with an already-landed corpus doc (id 900)
    Dedup.containmentIndexRows(
      Seq((900L, doc(900, n = 40))).toDF("doc_id", "text"), "doc_id", "text")
      .write.parquet(s"$indexDir/gen-seed")

    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    val q = StreamContain.start(
      input.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt,
      "doc_id", "text",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      input.addData(
        (1L, doc(1, n = 40)),                        // fresh — survives
        (2L, doc(2, n = 40)),                        // fresh — survives
        (3L, excerpt(1)),                            // within-batch excerpt of 1 — drop
        (4L, excerpt(900)),                          // excerpt of the seeded corpus — drop
        (5L, doc(900, n = 40) + " " + doc(505, n = 30))) // SUPERSET of seeded 900 — KEEP
      q.processAllAvailable()
      input.addData(
        (6L, doc(6, n = 40)),                        // fresh — survives
        (7L, excerpt(2)),                            // excerpt of batch-1 survivor 2 — drop
        (8L, excerpt(900)))                          // excerpt of seed, again — drop
      q.processAllAvailable()

      val landed = StreamContain.admittedDocs(spark, outDir)
        .select("doc_id").as[Long].collect().toSet
      assert(landed == Set(1L, 2L, 5L, 6L), s"got $landed")

      // the index holds exactly the seeded + admitted rows
      val idx = StreamContain.currentIndex(spark, indexDir,
        template = sys.error("index must not be empty"))
      assert(idx.select("doc_id").as[Long].collect().toSet ==
        Set(900L, 1L, 2L, 5L, 6L))
    } finally q.stop()
  }

  test("the in-loop compaction hook folds generations without changing the gate") {
    val tmp = Files.createTempDirectory("graft_sct_c_").toString
    val (indexDir, outDir, ckpt) = (s"$tmp/index", s"$tmp/out", s"$tmp/ckpt")
    val input = MemoryStream[(Long, String)](
      org.apache.spark.sql.Encoders.product[(Long, String)], spark.sqlContext)
    val q = StreamContain.start(
      input.toDF().toDF("doc_id", "text"), indexDir, outDir, ckpt,
      "doc_id", "text",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      compactEvery = 1)
    try {
      input.addData((1L, doc(1, n = 40)))
      q.processAllAvailable()
      input.addData((2L, doc(2, n = 40)))
      q.processAllAvailable()
      // a compacted generation exists, and the gate still drops against
      // rows that now live only in the compacted form
      input.addData((3L, excerpt(1)), (4L, doc(4, n = 40)))
      q.processAllAvailable()
      val landed = StreamContain.admittedDocs(spark, outDir)
        .select("doc_id").as[Long].collect().toSet
      assert(landed == Set(1L, 2L, 4L), s"got $landed")
      val dirs = new java.io.File(indexDir).listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("gen-compact-"))
      assert(dirs.nonEmpty, "compaction hook must have folded generations")
    } finally q.stop()
  }
}
