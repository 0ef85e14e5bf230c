package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Fractional-contamination laws the oracle replay can't isolate: the
  * inclusive threshold boundary, exact fractions on constructed window
  * counts, and the planted-fixture verdicts. */
class ContamFracSpec extends SparkTestBase {
  import spark.implicits._

  private val evalDf = Seq((900L, "qq ww ee rr tt yy uu ii"))
    .toDF("doc_id", "text") // exactly one 8-token window

  test("exact fraction at the inclusive boundary keeps; just above drops") {
    // 27 tokens → 20 windows; the eval window appears once → frac 0.05
    val pad = (1 to 19).map(i => s"tok$i").mkString(" ")
    val atBoundary = s"qq ww ee rr tt yy uu ii $pad"
    // 12 tokens → 5 windows; one eval hit → frac 0.2 > 0.05
    val above = s"qq ww ee rr tt yy uu ii x1 x2 x3 x4"
    val corpus = Seq((1L, atBoundary), (2L, above), (3L, pad))
      .toDF("doc_id", "text")
    val got = Dedup.contamFraction(corpus, evalDf, "doc_id", "text")
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 20L, 1L, 0.05, true)), got(1L))
    assert(got(2L) == ((2L, 5L, 1L, 0.2, false)), got(2L))
    assert(got(3L)._3 == 0L && got(3L)._4 == 0.0 && got(3L)._5, got(3L))
  }

  test("planted fixture: contaminated docs drop, clean docs keep, rows conserved") {
    val dir = "/root/testdata/sf0.001"
    val got = Dedup.contamFracDocs(spark, dir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    val base = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 37 =!= 0)
    assert(got.length == base.count(), "one verdict row per corpus doc")
    got.foreach { case (id, _, hits, frac, keep) =>
      if (id % 5 == 1)
        assert(hits > 0 && !keep, s"planted doc $id must drop (frac $frac)")
      else
        // non-planted docs may still overlap — the synthetic corpus
        // contains template twins of eval docs (REAL contamination the
        // monitor exists to catch); what must hold is verdict
        // consistency, not zero overlap
        assert(if (hits == 0L) keep else if (frac > 0.051) !keep else true,
          s"doc $id verdict inconsistent: hits=$hits frac=$frac keep=$keep")
    }
    // zero-overlap docs exist and keep; the planted docs all dropped
    assert(got.exists(r => r._1 % 5 != 1 && r._3 == 0L && r._5))
  }
}
