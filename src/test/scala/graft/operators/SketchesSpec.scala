package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV sketch laws on segments whose exact cardinalities are known by
  * construction — the oracle checks the events instantiation; these pin
  * the estimator regimes (exact-below-k, capped), the fold laws that
  * make the sketch landable/streamable, and the pair algebra on
  * disjoint/overlapping segments the fixture's uniform audience can't
  * distinguish. */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(key: String, ids: Range): DataFrame =
    ids.map(i => (key, i.toLong)).toDF("event_type", "user_id")

  test("below k the sketch IS the distinct set: estimate exact") {
    val df = seg("a", 0 until 40) union seg("a", 0 until 40) // dups collapse
    val est = Sketches.kmvEstimates(
      Sketches.kmvSketch(df, "event_type", "user_id", k = 64)).collect()
    assert(est.length == 1)
    assert(est.head.getLong(1) == 40L, "n_kept must equal the distinct count")
    assert(est.head.getDouble(2) == 40.0, "below-k estimate must be exact")
  }

  test("capped regime: 1000 distinct at k=64 estimates within 3 sigma") {
    val df = seg("a", 0 until 1000)
    val est = Sketches.kmvEstimates(
      Sketches.kmvSketch(df, "event_type", "user_id", k = 64)).collect()
    val d = est.head.getDouble(2)
    // 3/sqrt(k-1) ~ 38% relative
    assert(d > 600 && d < 1400, s"estimate $d implausible for 1000 distinct")
  }

  test("duplication inertness: re-ingesting the same elements changes nothing") {
    val base = seg("a", 0 until 500)
    val dup = base.union(base).union(seg("a", 100 until 300))
    val s1 = Sketches.kmvSketch(base, "event_type", "user_id")
    val s2 = Sketches.kmvSketch(dup, "event_type", "user_id")
    assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
  }

  test("absorbing fold: merging two sketches = sketching the union") {
    val a = seg("a", 0 until 400)
    val b = seg("a", 300 until 700)
    val folded = Sketches.kmvFold(
      Sketches.kmvSketch(a, "event_type", "user_id")
        .unionByName(Sketches.kmvSketch(b, "event_type", "user_id")))
    val direct = Sketches.kmvSketch(a.unionByName(b), "event_type", "user_id")
    assert(folded.except(direct).isEmpty && direct.except(folded).isEmpty)
  }

  test("disjoint below-k segments: zero intersection, additive union") {
    val df = seg("a", 0 until 30) unionByName seg("b", 1000 until 1040)
    val ops = Sketches.kmvSetOps(
      Sketches.kmvSketch(df, "event_type", "user_id", k = 64)).collect()
    assert(ops.length == 1)
    val r = ops.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getDouble(2) == 70.0, "union of disjoint below-k segments is exact")
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("identical below-k segments: jaccard exactly 1") {
    val df = seg("a", 0 until 50) unionByName seg("b", 0 until 50)
    val r = Sketches.kmvSetOps(
      Sketches.kmvSketch(df, "event_type", "user_id", k = 64)).head()
    assert(r.getDouble(2) == 50.0 && r.getDouble(3) == 50.0 && r.getDouble(4) == 1.0)
  }

  test("null elements contribute nothing") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)))
      .toDF("event_type", "user_id")
    val est = Sketches.kmvEstimates(
      Sketches.kmvSketch(df, "event_type", "user_id")).head()
    assert(est.getLong(1) == 2L && est.getDouble(2) == 2.0)
  }

  test("landed steady serve ≡ direct (distinct and set ops)") {
    val dir = "/root/testdata/sf0.001"
    val d1 = Sketches.kmvDistinctEvents(spark, dir)
    val d2 = Sketches.kmvDistinctSteady(spark, dir)
    assert(d1.except(d2).isEmpty && d2.except(d1).isEmpty)
    val s1 = Sketches.kmvSetOpsEvents(spark, dir)
    val s2 = Sketches.kmvSetOpsSteady(spark, dir)
    assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
  }
}
