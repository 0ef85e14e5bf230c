package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
}
