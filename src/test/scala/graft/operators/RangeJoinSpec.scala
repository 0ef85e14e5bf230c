package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed keyless range join: equivalence to the naive inequality join
  * (the spec), half-open boundary semantics, multi-window overlap, and
  * non-vacuity of the concrete testdata entry.
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketedIntervalJoin equals the naive inequality join, boundaries included") {
    // windows: [100, 300), [250, 450), [1000, 1010) — overlap + a narrow one
    val windows = Seq((1L, 100L, 300L), (2L, 250L, 450L), (3L, 1000L, 1010L))
      .toDF("window_id", "lo_us", "hi_us")
    // points: below-all, at lo (in), inside-two, at hi (out), inside-narrow,
    // just-past-narrow, far above
    val points = Seq(10L -> 99L, 11L -> 100L, 12L -> 260L, 13L -> 300L,
      14L -> 449L, 15L -> 1009L, 16L -> 1010L, 17L -> 5000L)
      .toDF("point_id", "ts_us")

    for (bucket <- Seq(7L, 100L, 1024L)) { // width smaller/equal/larger than windows
      val got = RangeJoin.bucketedIntervalJoin(
          points, "ts_us", windows, "lo_us", "hi_us", bucket)
        .select("point_id", "window_id").as[(Long, Long)].collect().toSet
      val want = points.as("p").join(windows.as("w"),
          col("p.ts_us") >= col("w.lo_us") && col("p.ts_us") < col("w.hi_us"))
        .select("point_id", "window_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"bucket=$bucket")
      assert(want == Set(11L -> 1L, 12L -> 1L, 12L -> 2L, 13L -> 2L, 14L -> 2L, 15L -> 3L))
    }
  }

  test("property: random intervals/buckets — bucketed join ≡ naive join") {
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val windows = (1 to 20).map { i =>
        val lo = rnd.nextLong(10000)
        (i.toLong, lo, lo + 1 + rnd.nextLong(3000))
      }.toDF("window_id", "lo_us", "hi_us")
      val points = (1 to 200)
        .map(i => (i.toLong, rnd.nextLong(14000))).toDF("point_id", "ts_us")
      val bucket = 1L + rnd.nextLong(4000)
      val got = RangeJoin.bucketedIntervalJoin(
          points, "ts_us", windows, "lo_us", "hi_us", bucket)
        .select("point_id", "window_id").as[(Long, Long)].collect().toSet
      val want = points.as("p").join(windows.as("w"),
          col("p.ts_us") >= col("w.lo_us") && col("p.ts_us") < col("w.hi_us"))
        .select("point_id", "window_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"trial $trial bucket=$bucket")
    }
  }

  test("errorsInSignupWindows: non-vacuous and verified against the naive join") {
    val dir = "/root/testdata/sf0.01"
    val got = RangeJoin.errorsInSignupWindows(spark, dir)
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "entry must produce rows at sf0.01")

    val ev = graft.sources.Tables.load(spark, dir, "events")
    val w = ev.filter(col("event_type") === "signup" && col("user_id") % 50 === 0)
      .select(col("event_id").as("window_id"), unix_micros(col("ts")).as("lo"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("t"))
    val want = e.join(w, col("t") >= col("lo") && col("t") < col("lo") + lit(21600000000L))
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }
}
