package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-mining laws on constructed geometries — the oracle checks the
  * corpus instantiation; these pin the algebra: mutual-best output is a
  * partial matching, identical twins always pair, a flat similarity
  * landscape margins to exactly 1, hubs are penalized relative to
  * exclusive partners, and zero-norm vectors pair with nothing. */
class BitextSpec extends SparkTestBase {
  import spark.implicits._

  private def embOf(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  /** One centroid → one cell: every cross-side pair competes. */
  private val oneCell: DataFrame =
    Seq((0L, Seq(1.0f, 0.0f, 0.0f))).toDF("cell_id", "c_emb")

  test("identical twins are mined as a mutual pair; output is a partial matching") {
    val emb = embOf(
      0L -> Seq(1.0f, 0.0f, 0.0f), 1L -> Seq(1.0f, 0.0f, 0.0f), // twins
      2L -> Seq(0.0f, 1.0f, 0.0f), 3L -> Seq(0.0f, 0.9f, 0.4f),
      4L -> Seq(0.0f, 0.0f, 1.0f), 5L -> Seq(0.1f, 0.1f, 0.9f))
    val mined = Bitext.mineMarginPairs(emb, oneCell).collect()
    val pairs = mined.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"twins must pair: $pairs")
    assert(mined.map(_.getLong(0)).distinct.length == mined.length, "src side must be a matching")
    assert(mined.map(_.getLong(1)).distinct.length == mined.length, "tgt side must be a matching")
    mined.foreach(r => assert(r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 1))
  }

  test("flat similarity landscape: every margin is exactly 1") {
    // all cross-side cosines equal (orthonormal-ish trick: every vector
    // identical) → cos = avg = margin = 1 for every candidate
    val emb = embOf((0L to 5L).map(i => i -> Seq(1.0f, 1.0f, 0.0f)): _*)
    val mined = Bitext.mineMarginPairs(emb, oneCell).collect()
    assert(mined.nonEmpty)
    mined.foreach(r => assert(r.getDouble(2) == 1.0, r))
  }

  test("hubs are penalized: an exclusive partner beats a globally-close hub") {
    // B side: hub 1 is fairly close to BOTH A vectors; partner 3 is very
    // close to A-vector 2 only. Raw cosine prefers the hub for src 0 and
    // ties nothing for src 2; the margin denominator (the hub's high
    // neighborhood average) must hand src 2 its exclusive partner 3.
    val emb = embOf(
      0L -> Seq(1.0f, 0.2f, 0.0f),
      2L -> Seq(1.0f, 0.0f, 0.3f),
      1L -> Seq(1.0f, 0.1f, 0.1f),  // hub: close to 0 and 2
      3L -> Seq(1.0f, 0.0f, 0.31f)) // near-twin of 2 only
    val mined = Bitext.mineMarginPairs(emb, oneCell, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mined.contains((2L, 3L)), s"exclusive partner must win: $mined")
  }

  test("zero-norm vectors pair with nothing") {
    val emb = embOf(
      0L -> Seq(0.0f, 0.0f, 0.0f), // NaN cosine everywhere
      2L -> Seq(1.0f, 0.0f, 0.0f),
      1L -> Seq(1.0f, 0.0f, 0.1f))
    val mined = Bitext.mineMarginPairs(emb, oneCell).collect()
    assert(!mined.exists(r => r.getLong(0) == 0L), mined.mkString(","))
    assert(mined.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 1L)))
  }

  test("corpus instantiation: deterministic, steady ≡ direct") {
    val dir = "/root/testdata/sf0.001"
    val a = Bitext.mineDocs(spark, dir)
    val b = Bitext.mineDocs(spark, dir)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val s = Bitext.mineSteady(spark, dir)
    // landed centroids equal the retrained ones (the landed ≡ trained
    // law other sim_* suites pin), so the mined set matches exactly
    assert(a.except(s).isEmpty && s.except(a).isEmpty)
  }
}
