package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType
import graft.sources.Tables

/** Bloom-filter semi-join reduction — prune the FACT side of a selective
  * join scan-side, BEFORE its shuffle, with a bounded-size sketch of the
  * dimension keys.
  *
  * The 100 TB problem this solves: when the dim side is too big to
  * broadcast, the join becomes a shuffle join and the full fact table
  * crosses the network — even if only 1% of fact rows have a partner.
  * Building a bloom filter over the dim keys (one bounded sketch — numBits
  * bits regardless of row count) and filtering the fact scan with
  * `might_contain` drops ~99% of fact rows before the exchange, turning a
  * 100 TB shuffle into a 1 TB one. False positives only cost wasted
  * shuffle rows (the real join still verifies); false negatives cannot
  * occur, so the result is EXACTLY the plain join.
  *
  * This is the same rewrite Spark's own `InjectRuntimeFilter` applies
  * (spark.sql.optimizer.runtime.bloomFilter.enabled, on by default) when
  * its size/selectivity heuristics fire; the explicit operator makes the
  * reduction deterministic — a pipeline that KNOWS its dim filter is
  * selective doesn't gamble on planner heuristics. The sketch is built
  * with Spark's own `bloom_filter_agg` (partial-merge: each partition
  * builds a local bloom, merge is bitwise-OR) and shipped as a literal —
  * one bounded driver round-trip of numBits/8 bytes, the same cost shape
  * as a broadcast-threshold check, NOT a data collect.
  */
object BloomJoin {

  /** xxhash64(col) as an expression — both the agg build and the probe
    * must hash identically (BloomFilterImpl stores longs). */
  private def hashed(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    Bridge.expression(xxhash64(c))

  /** Build a bloom filter of `dim`'s join keys: one binary sketch row. */
  def buildBloom(dim: DataFrame, dimKey: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      hashed(col(dimKey)), Literal(expectedItems), Literal(numBits), 0, 0)
      .toAggregateExpression()
    dim.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** [[buildBloom]] over ALREADY-64-bit keys (e.g. shingle hashes): the
    * sketch stores the longs directly — no re-hash — so the probe side
    * must also feed the raw long ([[mightContainLong]]). */
  def buildBloomLongs(keys: DataFrame, keyCol: String,
      expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(col(keyCol)), Literal(expectedItems), Literal(numBits), 0, 0)
      .toAggregateExpression()
    keys.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** Scan-side membership probe against a [[buildBloomLongs]] sketch. */
  def mightContainLong(bf: Array[Byte], key: Column): Column =
    Bridge.column(
      BloomFilterMightContain(Literal(bf, BinaryType), Bridge.expression(key)))

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side pre-pruned by
    * a bloom filter of the dim keys. Row-identical to the plain inner
    * join for ANY bloom parameters (no false negatives; false positives
    * are removed by the join itself). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 4000000L, numBits: Long = 33554432L): DataFrame = {
    val bf = buildBloom(dim, dimKey, expectedItems, numBits)
    // a null sketch (empty dim) keeps might_contain null → filter drops
    // every fact row, which IS the empty join
    val keep = Bridge.column(
      BloomFilterMightContain(Literal(bf, BinaryType), hashed(fact(factKey))))
    fact.filter(keep).join(dim, col(factKey) === col(dimKey))
  }

  /** CORRECTNESS instantiation: events joined to the (selective, ~9%)
    * negative-balance customers. The oracle is the PLAIN SQL join — the
    * bloom path must reproduce it bit-for-bit. */
  def negBalanceActivity(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = Tables.load(spark, dir, "customer")
      .filter(col("c_acctbal") < 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    bloomPrunedJoin(events, dim, "user_id", "c_custkey")
      .select(col("event_id"), col("user_id"), col("c_name"), col("c_acctbal"),
        col("value"))
  }
}
