package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType
import graft.sources.Tables

/** One-pass table profiling — the "what is in this table" primitive a
  * 100 TB ingest needs before any pipeline decision (null-rate gates,
  * key-cardinality sanity, range checks). Generalizes the reference's
  * hand-written integrity queries (row count, null scan, duplicate scan —
  * docs/athena-integrity-check.md:47-61) into one operator.
  *
  * Per column: total rows, null count, distinct count, numeric min/max
  * (NULL for non-numeric columns — no cross-engine string/number cast
  * semantics in play). All columns profile in a SINGLE aggregate job: one
  * scan, map-side partials, then `stack` unpivots the 1-row result —
  * the row explosion is 1 → |cols|, driver-free.
  *
  * Distinct counting: the default is `approx_count_distinct` (HLL++,
  * one pass, mergeable sketches — the only sane shape at 100 TB). The
  * `exact = true` variant uses `count(DISTINCT …)`, which Catalyst plans
  * via an Expand ×|cols| of the input before partial aggregation — a
  * |cols|-times-heavier shuffle: reserve it for oracle gates and small
  * slices (the CORRECTNESS entry runs it to stay hash-comparable).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSet
    def minMax(c: String): Seq[Column] =
      if (numeric(c)) Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))
      else Seq(lit(null).cast("double").as(s"mn_$c"),
        lit(null).cast("double").as(s"mx_$c"))
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"nd_$c")) ++ minMax(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', n_rows, n_rows - nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    row.selectExpr(s"stack(${cols.length}, $stacked) AS " +
      "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num)")
  }

  /** CORRECTNESS-entry instantiation: exact profile of the non-timestamp
    * events columns. */
  def eventsProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.load(spark, dir, "events"),
      Seq("event_id", "user_id", "event_type", "value", "props"), exact = true)

  /** Declarative data-quality expectations — the Deequ-style (public:
    * Schelter et al., "Automating Large-Scale Data Quality Verification",
    * VLDB'18) constraint gate a production pipeline runs before
    * publishing a landed table. Each check reports (check, metric,
    * passed) where `metric` is the VIOLATION count — a failing gate tells
    * you how bad, not just that.
    *
    * Scale shape: every row-local constraint folds into ONE aggregate
    * over one scan (violations are `count(CASE)` columns — map-side
    * partials, a 1-row result, `stack` to rows); the referential check is
    * the only one that joins, and it is a left-anti count against the
    * (broadcastable) key side. No constraint ever materializes violating
    * rows unless asked — at 100 TB you gate on counts, then fetch
    * examples with a filter. */
  def checkExpectations(df: DataFrame,
      rowChecks: Seq[(String, Column)],
      uniqueKey: Option[String] = None): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKey.nonEmpty, "no expectations given")
    // aggregate under POSITIONAL aliases and carry the caller's check
    // names only as lit() values — interpolating them into a selectExpr
    // string would break on quotes/spaces and admit expression injection
    val aggs: Seq[Column] =
      rowChecks.map { case (_, pred) =>
        count(when(!coalesce(pred, lit(false)), 1))
      } ++ uniqueKey.map(k => count(col(k)) - countDistinct(col(k))).toSeq
    val names = rowChecks.map(_._1) ++ uniqueKey.map(k => s"${k}_unique").toSeq
    val row = df.agg(
      aggs.head.as("v_0"),
      aggs.tail.zipWithIndex.map { case (a, i) => a.as(s"v_${i + 1}") }: _*)
    val entries = names.zipWithIndex.map { case (n, i) =>
      struct(lit(n).as("check"), col(s"v_$i").as("violations"),
        (col(s"v_$i") === 0).as("passed"))
    }
    row.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** The row checks of [[checkExpectations]] attached IN-FLIGHT via
    * Spark's `Observation` API: the counters ride the job that already
    * scans the data (a land/write/aggregate), so the gate costs ZERO
    * extra scans — at 100 TB the difference between "QC the publish" and
    * "read the table twice". `CollectMetricsExec` accumulates per task
    * and merges on the driver, exactly a piggy-backed two-phase
    * aggregate.
    *
    * Usage: `val (gated, obs) = observeExpectations(df, checks)`; run any
    * action on `gated` (e.g. the parquet write), then `obs.get` yields
    * `v_<name>` violation counts to gate the publish on. */
  def observeExpectations(df: DataFrame,
      rowChecks: Seq[(String, Column)]): (DataFrame, Observation) = {
    require(rowChecks.nonEmpty, "no expectations given")
    val obs = Observation()
    val aggs = rowChecks.map { case (name, pred) =>
      count(when(!coalesce(pred, lit(false)), 1)).as(s"v_$name")
    }
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Referential-integrity expectation: rows of `df` whose `fkCol` has no
    * partner in `dim.pkCol` (NULL fk counts as a violation — an FK that
    * allows NULLs belongs in a row check). One left-anti join, returned in
    * the same (check, violations, passed) shape for unioning. */
  def checkReferential(df: DataFrame, fkCol: String,
      dim: DataFrame, pkCol: String, name: String): DataFrame =
    df.join(dim.select(col(pkCol).as(fkCol)), Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"),
        (col("violations") === 0).as("passed"))

  /** CORRECTNESS-entry instantiation: the events table's publish gate —
    * row checks (non-null key/time, value in a plausible range, a closed
    * event-type vocabulary), key uniqueness, and user_id ⊆ customers. */
  def eventsExpectations(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    checkExpectations(ev,
      Seq(
        "event_id_not_null" -> col("event_id").isNotNull,
        "ts_not_null"       -> col("ts").isNotNull,
        "value_in_range"    -> col("value").between(-1e6, 1e6),
        "known_event_type"  -> col("event_type")
          .isin("click", "view", "purchase", "signup", "error")),
      uniqueKey = Some("event_id"))
      .unionByName(checkReferential(ev, "user_id",
        Tables.load(spark, dir, "customer")
          .select(col("c_custkey")), "c_custkey", "user_fk_in_customer"))
  }
}
