package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase "salted" group-by for hot keys.
  *
  * A plain `groupBy(key)` hash-partitions by key, so one pathological key
  * (a null user_id, an empty document, a bot account) lands its entire
  * row mass on a single reducer. Salting splits each key into `salts`
  * sub-keys for the first (partial) aggregate, then merges the partials in
  * a second aggregate whose input is at most `salts` rows per key —
  * bounded, skew-free.
  *
  * Spark's own mitigations overlap but don't subsume this: map-side
  * partial aggregation already absorbs skew for algebraic aggregates
  * UNLESS the per-task key cardinality overflows the hash map (then
  * partials spill per distinct key, and the hot key still converges on one
  * reducer); AQE's skew handling only splits JOIN partitions, not
  * aggregation partitions. Salting is the standard cure when a known-hot
  * key group-by still tips over at 100 TB.
  *
  * Only algebraic aggregates decompose this way (sum/count/min/max and
  * anything built from them, e.g. avg = sum/count) — a median would not.
  */
object SaltedAgg {

  /** count + sum(valueCol) per key, salted. Output: key, n, sum. */
  def countSumByKey(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0)
    // any salt distribution is correct (it only spreads rows); this one is
    // cheap and deterministic per row position
    val salted = df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_sum"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_sum")).as("sum"))
  }
}
