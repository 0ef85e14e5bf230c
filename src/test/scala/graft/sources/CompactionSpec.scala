package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Compaction: fewer files, identical rows, range-disjoint clustering. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def fragmented(): String = {
    val dir = java.nio.file.Files.createTempDirectory("frag_").toString
    Tables.load(spark, "/root/testdata/sf0.01", "events")
      .repartition(64) // the streaming-sink pathology: many small files
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("compact: fewer files, same rows") {
    val in = fragmented()
    val out = java.nio.file.Files.createTempDirectory("compact_").toString
    val (nIn, nOut) = Compaction.compact(spark, in, out, targetBytes = 4L << 20)
    assert(nIn == 64)
    assert(nOut < nIn, s"expected compaction, got $nIn -> $nOut")
    val a = spark.read.parquet(in).select("event_id").as[Long].collect().sorted.toSeq
    val b = spark.read.parquet(out).select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b, "compaction must preserve the row multiset")
  }

  test("compact with clusterBy: output files are range-disjoint on the key") {
    val in = fragmented()
    val out = java.nio.file.Files.createTempDirectory("compactk_").toString
    val (_, nOut) = Compaction.compact(spark, in, out,
      targetBytes = 64L << 10, clusterBy = Some("user_id"))
    assert(nOut > 1, "need several output files to check disjointness")
    val ranges = spark.read.parquet(out).inputFiles.toSeq.map { f =>
      val ids = spark.read.parquet(f).select("user_id").as[Long].collect()
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"file ranges overlap: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(in).count())
  }
}
