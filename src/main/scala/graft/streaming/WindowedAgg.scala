package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time tumbling-window aggregation — the watermarked stateful
  * operator the reference's streaming job never needed (its pipeline is a
  * stateless map, SURVEY §2.4) but any production variant of it would:
  * "events per type per window" over the same landed stream.
  *
  * One definition serves batch and streaming — Structured Streaming's core
  * contract. Batch runs it as a plain two-phase hash aggregate on the
  * window struct; a stream adds watermark-driven state eviction (append
  * mode emits a window once the watermark passes its end, late rows beyond
  * the lateness bound are dropped). StatefulStreamingSpec pins both.
  *
  * Scale: state per (window × type) is one count+sum — eviction bounds it
  * to (active windows × types), independent of row volume; the aggregate
  * is partial-merge so only per-window partials cross the shuffle.
  */
object WindowedAgg {

  /** Tumbling event-time aggregate per event_type. Windows align to the
    * epoch in session TZ (UTC here), so "1 day" == calendar UTC days —
    * the same boundaries as the DuckDB oracle's date_trunc('day', ts). */
  def byTypeTumbling(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming form: watermarked, append-mode-ready. `lateness` is the
    * reorder tolerance — rows older than (max event time − lateness) are
    * dropped, which is what lets Spark finalize and emit closed windows. */
  def streamingByType(events: DataFrame, windowLen: String, lateness: String): DataFrame =
    byTypeTumbling(events.withWatermark("ts", lateness), windowLen)

  /** Gap sessionization via the NATIVE `session_window` function — the
    * built-in counterpart to [[Sessionize]] (flatMapGroupsWithState) and
    * [[graft.operators.Sessionization]] (batch windows): one declarative
    * definition that runs as a merging-sessions aggregate in batch AND as
    * watermarked session state in a stream. A session's `end` is
    * last-event-time + gap (Spark's session contract; the custom
    * operators report last-event-time — callers pick the convention).
    *
    * Scale: partial per-partition session merge before the shuffle — only
    * per-(user, partial-session) rows cross; state in streaming is bounded
    * by ACTIVE sessions and evicted at the watermark. */
  def byUserSessionWindow(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming session windows: watermarked, append-mode-ready (a session
    * emits once the watermark passes its end). */
  def streamingByUserSession(events: DataFrame, gap: String, lateness: String): DataFrame =
    byUserSessionWindow(events.withWatermark("ts", lateness), gap)
}
