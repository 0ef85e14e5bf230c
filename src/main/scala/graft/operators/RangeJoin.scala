package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Range (interval-containment) join without an equality key — the second
  * custom-join shape the brief's operator ladder names next to as-of
  * ([[AsOfJoin]]). "Which points fall inside which windows" has no equi
  * key, so Spark's only native plan is BroadcastNestedLoopJoin — O(|P|·|W|)
  * comparisons, a non-starter once both sides are large.
  *
  * The scalable form is bucket-decomposition (the same trick interval
  * indexes use): quantize time into fixed buckets, explode each window
  * into the buckets it covers, map each point to its single bucket, then
  * EQUI-join on the bucket and re-check the exact predicate. Candidates
  * are only same-bucket (point, window) pairs — cost is
  * |P| + Σ(window width/bucket) + |candidates|, all shuffle-partitioned
  * by bucket, and a point meets a window in exactly one bucket (the
  * point's own) so the join emits no duplicates to deduplicate.
  *
  * Bucket width tunes the trade: ≈ the typical window width means each
  * window explodes to ~2 rows while each bucket holds few windows. Skew
  * (a bucket holding many windows or points) is ordinary equi-join skew —
  * AQE's skew split applies.
  */
object RangeJoin {

  /** Generic bucketed interval join: `points` (with a microsecond `tsCol`)
    * against `windows` (with `[loCol, hiCol)` microsecond bounds).
    * Output: every point row joined to every window containing it.
    * Precondition: the two sides share no column name (project each side
    * first — the post-join containment filter needs unambiguous
    * references; violations fail fast below instead of surfacing as an
    * AnalysisException deep in the plan). */
  def bucketedIntervalJoin(
      points: DataFrame, tsCol: String,
      windows: DataFrame, loCol: String, hiCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    val shared = points.columns.toSet intersect windows.columns.toSet
    require(shared.isEmpty,
      s"points and windows must not share column names (project first): $shared")
    val bucket = "__graft_bucket"
    require(!points.columns.contains(bucket) && !windows.columns.contains(bucket),
      s"$bucket is reserved by bucketedIntervalJoin")
    // DIV (integer division), not `/`: these are epoch-micros, and a
    // double-precision divide can round a boundary into the wrong bucket.
    val wb = windows.withColumn(bucket,
      explode(sequence(expr(s"$loCol DIV $bucketUs"), expr(s"$hiCol DIV $bucketUs"))))
    val pb = points.withColumn(bucket, expr(s"$tsCol DIV $bucketUs"))
    pb.join(wb, Seq(bucket))
      .filter(col(tsCol) >= col(loCol) && col(tsCol) < col(hiCol))
      .drop(bucket)
  }

  /** Concrete entry: error events inside 6-hour incident windows anchored
    * at the signup events of every-50th user (a deterministic, data-driven
    * window set — no user key relates errors to windows, so this is a true
    * keyless range join). Bucket = 1 h: each window explodes to 7 rows. */
  def errorsInSignupWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val windows = ev
      .filter(col("event_type") === "signup" && col("user_id") % 50 === 0)
      .select(
        col("event_id").as("window_id"),
        unix_micros(col("ts")).as("lo_us"),
        (unix_micros(col("ts")) + lit(6L * 3600 * 1000000)).as("hi_us"))
    val points = ev
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    bucketedIntervalJoin(points, "ts_us", windows, "lo_us", "hi_us",
        bucketUs = 3600L * 1000000)
      .select(col("event_id"), col("user_id"), col("window_id"),
        (col("ts_us") - col("lo_us")).as("offset_us"))
  }
}
