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

  /** Skew-safe salted equi-join: the shuffle-join counterpart of
    * [[countSumByKey]]. A shuffle hash/merge join on a skewed key sends
    * the hot key's entire fact mass to one task; salting splits each fact
    * row across `salts` sub-partitions (deterministic hash of the fact
    * row) and replicates each DIM row once per salt, so the hot key's
    * rows spread over `salts` tasks. Result is row-identical to the plain
    * join — salt only changes the partitioning.
    *
    * When to reach for it: AQE's skew-join split already handles most
    * skew at runtime but only fires for sort-merge joins with statistics
    * in hand; a known-hot-key pipeline (bot user, null-ish default key)
    * salts deterministically and never depends on runtime detection.
    * Cost: `salts`× replication of the dim side — keep the dim side the
    * small one (it was already too big to broadcast, or a broadcast join
    * would have made skew moot). */
  def saltedEquiJoin(facts: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val saltedFacts = facts.withColumn(
      "_salt", pmod(xxhash64(facts.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)).cast("int"))
    val saltedDim = dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFacts
      .join(saltedDim, saltedFacts(factKey) === saltedDim(dimKey)
        && saltedFacts("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
