package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The range-join optimizer rule: same results as the unrewritten plan,
  * cartesian/nested-loop eliminated when enabled, and tight scope (plans
  * with a real equi key or non-range conditions are left alone).
  */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val binKey = RangeJoinRewrite.binSizeKey

  private def points = Seq(10L -> 99L, 11L -> 100L, 12L -> 260L, 13L -> 300L,
    14L -> 449L, 15L -> 1009L, 16L -> 1010L, 17L -> 5000L)
    .toDF("point_id", "ts_us")
  private def windows = Seq((1L, 100L, 300L), (2L, 250L, 450L), (3L, 1000L, 1010L))
    .toDF("window_id", "lo_us", "hi_us")

  private def naiveJoin = points.join(windows,
    col("ts_us") >= col("lo_us") && col("ts_us") < col("hi_us"))

  test("rewrite preserves results and removes the cartesian") {
    val want = naiveJoin.as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    spark.conf.set(binKey, "128")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // worst case: no BNLJ rescue
    try {
      val df = naiveJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
        s"rewritten plan must equi-join on the bucket:\n$plan")
      assert(plan.contains("graft_bucket"), s"expected bucket key in:\n$plan")
      assert(df.as[(Long, Long, Long, Long, Long)].collect().toSet == want)
      assert(df.columns.toSeq == Seq("point_id", "ts_us", "window_id", "lo_us", "hi_us"),
        "output schema must be unchanged")
    } finally {
      spark.conf.unset(binKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("inclusive upper bounds and flipped orientations still match") {
    val want = points.join(windows,
        col("lo_us") <= col("ts_us") && col("hi_us") >= col("ts_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    spark.conf.set(binKey, "64")
    try {
      val df = points.join(windows,
        col("lo_us") <= col("ts_us") && col("hi_us") >= col("ts_us"))
      assert(df.queryExecution.executedPlan.toString.contains("graft_bucket"))
      assert(df.as[(Long, Long, Long, Long, Long)].collect().toSet == want)
      // BETWEEN-style: boundary rows at hi are now included
      assert(want.exists(_._1 == 13L), "ts == hi must match the inclusive bound")
    } finally spark.conf.unset(binKey)
  }

  test("joins with an equi key, or without the conf, are left untouched") {
    val l = Seq((1L, 5L), (2L, 15L)).toDF("k", "v")
    val r = Seq((1L, 0L, 10L), (2L, 10L, 20L)).toDF("k2", "lo", "hi")
    spark.conf.set(binKey, "16")
    try {
      val keyed = l.join(r, col("k") === col("k2") && col("v") >= col("lo") && col("v") < col("hi"))
      assert(!keyed.queryExecution.executedPlan.toString.contains("graft_bucket"),
        "an existing equi key must suppress the rewrite")
      assert(keyed.as[(Long, Long, Long, Long, Long)].collect().toSet ==
        Set((1L, 5L, 1L, 0L, 10L), (2L, 15L, 2L, 10L, 20L)))

      val oneSided = l.join(r, col("v") >= col("lo")) // upper bound missing
      assert(!oneSided.queryExecution.executedPlan.toString.contains("graft_bucket"))
    } finally spark.conf.unset(binKey)

    // conf unset → inert even for a perfect range shape
    assert(!naiveJoin.queryExecution.executedPlan.toString.contains("graft_bucket"))
  }

  test("agrees with the manual bucketed operator on real data") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val w = ev.filter(col("event_type") === "signup" && col("user_id") % 50 === 0)
      .select(col("event_id").as("window_id"), unix_micros(col("ts")).as("lo_us"),
        (unix_micros(col("ts")) + lit(21600000000L)).as("hi_us"))
    val p = ev.filter(col("event_type") === "error")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val manual = graft.operators.RangeJoin
      .bucketedIntervalJoin(p, "ts_us", w, "lo_us", "hi_us", 3600L * 1000000)
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    spark.conf.set(binKey, (3600L * 1000000).toString)
    try {
      val auto = p.join(w, col("ts_us") >= col("lo_us") && col("ts_us") < col("hi_us"))
        .select("event_id", "window_id").as[(Long, Long)].collect().toSet
      assert(auto == manual)
    } finally spark.conf.unset(binKey)
  }
}
