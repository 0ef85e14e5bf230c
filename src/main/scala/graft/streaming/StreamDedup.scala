package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact deduplication — the streaming face of the dedup family
  * (`graft.operators.Dedup` is the batch face). At-least-once upstreams
  * (producer retries, replayed partitions) deliver duplicate keys across
  * micro-batches; `dropDuplicatesWithinWatermark` keeps one row per key
  * with state that the event-time watermark garbage-collects, so state is
  * bounded by keys ACTIVE within the lateness window — not by stream
  * history, which is what plain `dropDuplicates` on a stream would
  * accumulate (unbounded at 100 TB/day).
  */
object StreamDedup {

  /** One row per `keys` within the watermark lateness. `df` must already
    * carry a watermark (withWatermark) on its event-time column. */
  def exactWithinWatermark(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicatesWithinWatermark(keys)
}
