package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Perceptual media near-dup laws — the oracle replays the corpus
  * instantiation bit-for-bit; these pin the properties the replay can't
  * express: banded candidate generation is COMPLETE at the pigeonhole
  * τ (verified against brute-force hamming), signatures are stable
  * under small byte edits and well-formed, and contract edges (short
  * payloads, exact copies) behave. */
class PhashSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bands are 4 values, each inside 16 bits") {
    val rows = Multimodal.plantedNearMedia(spark, dir)
      .select(graft.functions.GraftFunctions.phashBands(col("payload")).as("b"))
      .as[Seq[Long]].collect()
    assert(rows.nonEmpty)
    rows.foreach { b =>
      assert(b.length == 4)
      b.foreach(v => assert(v >= 0 && v < 65536, b))
    }
  }

  test("banded pairs ≡ brute-force hamming ≤ 3 (pigeonhole completeness)") {
    val media = Multimodal.plantedNearMedia(spark, dir)
    val got = Multimodal.phashNearDupPairs(media, "media_id", "payload")
      .as[(Long, Long, Long)].collect().toSet
    val sigs = media.filter(length(col("payload")) >= 2)
      .select(col("media_id"),
        graft.functions.GraftFunctions.phashBands(col("payload")).as("b"))
      .as[(Long, Seq[Long])].collect()
    val brute = (for {
      (a, ba) <- sigs; (b, bb) <- sigs if a < b
      h = ba.zip(bb).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
      if h <= 3
    } yield (a, b, h)).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
  }

  test("an exact byte copy surfaces at hamming 0") {
    val media = Multimodal.plantedNearMedia(spark, dir)
      .unionByName(Multimodal.plantedNearMedia(spark, dir)
        .filter(col("media_id") === 3L)
        .select(lit(7000003L).as("media_id"), col("payload")))
    val got = Multimodal.phashNearDupPairs(media, "media_id", "payload")
      .as[(Long, Long, Long)].collect()
    assert(got.exists(r => r._1 == 3L && r._2 == 7000003L && r._3 == 0L),
      got.take(5).mkString(","))
  }

  test("the 9-byte planted edit stays perceptually near: most planted pairs surface") {
    val got = Multimodal.nearDupMedia(spark, dir)
      .as[(Long, Long, Long)].collect()
    val planted = got.count(r => r._2 == r._1 + 1000000L)
    val nPlanted = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0).count()
    assert(planted >= (nPlanted * 7) / 10,
      s"only $planted of $nPlanted planted copies surfaced")
  }

  test("oracle precondition: the fixture corpus is pure ASCII") {
    // mm_near_dup's oracle equates UTF-8 payload BYTES with DuckDB
    // per-CHARACTER code points (and mediaTable labels char-count
    // length(text) as n_bytes) — sound only while text is ASCII, where
    // bytes ≡ code points. A non-ASCII corpus change must fail HERE,
    // loudly, not as a silent oracle-vs-kernel divergence hunt.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val nonAscii = graft.sources.Tables.load(spark, d, "documents")
        .filter(!col("text").rlike("^[\\x00-\\x7F]*$")).count()
      assert(nonAscii == 0, s"$d holds $nonAscii non-ASCII documents — " +
        "the mm_near_dup byte/codepoint oracle equivalence no longer holds")
    }
  }

  test("landed media probe equals the from-scratch gate, with no index-side Exchange") {
    // the NearDupIndexLayoutSpec contract for media: the (band, bv)
    // bucketed layout serves the probe join exchange-free, and the
    // steady instantiation answers identically to the rebuild one
    val got = Multimodal.incrementalMediaArrivalsSteady(spark, dir)
      .as[(Long, Long)].collect().toSet
    val want = Multimodal.incrementalMediaArrivals(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
    // exchange audit on the probe join (merge hint forces the at-scale
    // shuffle-join path; broadcast would trivially pass)
    val bandsT = spark.table(Multimodal.mediaSteadyPrefix(dir) + "_bands")
    val batchIdx = Multimodal.buildMediaSigIndex(
      Multimodal.plantedNearMedia(spark, dir), "media_id", "payload")
    val probe = Multimodal.mediaBandTable(batchIdx).hint("merge")
      .join(bandsT, Seq("band", "bv"))
      .select("band", "bv")
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly the probe-side Exchange (index side bucketed):\n$plan")
  }

  test("payloads without a bigram pair with nothing") {
    val media = Seq(
      (1L, Array[Byte]('x')), (2L, Array[Byte]('x')),
      (3L, "same long payload text".getBytes), (4L, "same long payload text".getBytes))
      .toDF("media_id", "payload")
    val got = Multimodal.phashNearDupPairs(media, "media_id", "payload")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((3L, 4L, 0L)), got)
  }
}
