package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join — the last §2.4 "absent from the
  * reference" streaming operator family: correlate two live streams
  * (clicks and errors here) within a bounded event-time window.
  *
  * Semantics: for every error, every click by the same user in the
  * `window` interval ending at the error. Both sides carry watermarks and
  * the join condition bounds event-time distance, which is exactly what
  * lets Spark GC join state: a buffered click older than
  * (watermark - window - lateness) can never match a future error and is
  * dropped. Without the time bound the state would grow without limit —
  * the unbounded-state trap this operator exists to demonstrate avoiding.
  *
  * Scale: state is partitioned by the equi-key (user_id) and bounded by
  * events inside the watermark horizon per key — active users, not
  * historical ones. The same code shape runs in batch (the test checks
  * stream output == the batch join of the same data).
  */
object StreamJoin {

  /** `clicks`/`errors`: streaming (or batch) DataFrames with at least
    * (event_id, user_id, ts). Output: one row per (error, matching click)
    * with the event-time gap in microseconds (0 ≤ gap ≤ window).
    *
    * `joinType` "inner" (default) emits matches as both sides arrive;
    * "left_outer" ADDITIONALLY emits (error, NULL click) once the
    * watermark proves no matching click can still arrive — the unmatched
    * row is held in state until event time passes its window + lateness,
    * which is why outer stream joins REQUIRE both the watermarks and the
    * event-time-bounded condition (Spark rejects the plan otherwise). */
  def clicksBeforeErrors(
      clicks: DataFrame, errors: DataFrame,
      window: String = "30 minutes",
      lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", lateness).alias("c")
    val e = errors.withWatermark("ts", lateness).alias("e")
    e.join(c,
        expr(s"""
          c.user_id = e.user_id AND
          c.ts <= e.ts AND
          c.ts >= e.ts - INTERVAL $window
        """),
        joinType)
      .select(
        col("e.event_id").as("error_id"),
        col("e.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        (unix_micros(col("e.ts")) - unix_micros(col("c.ts"))).as("gap_us"))
  }
}
