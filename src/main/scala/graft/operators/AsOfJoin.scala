package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of join — "for each left row, the most recent right row at or before
  * it" — the time-series operator Spark lacks natively (the brief's
  * custom-operator ladder names it; DuckDB ships it as ASOF JOIN, which is
  * exactly what the oracle uses).
  *
  * Implementation is the scalable union + carry-forward form, NOT the
  * naive range join: joining left×right on `key AND r.ts <= l.ts` explodes
  * to every (row, earlier-row) pair before aggregation — quadratic per
  * key. Instead both sides are unioned with a side tag, sorted once per
  * key by (ts, side, id), and the right side's id is carried forward with
  * `last(_, ignoreNulls)` — ONE shuffle on the key, one sort, linear rows.
  * Catalyst plans the two window functions over the same (key, order) as a
  * single Window exec.
  */
object AsOfJoin {

  /** For every `leftType` event, the nearest `rightType` event of the same
    * user at-or-before it (ties: right side wins at equal ts, then larger
    * event_id — deterministic). Output keeps the left event and the
    * matched right id + the gap in microseconds (NULL when no prior). */
  def nearestPrior(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("event_type"),
        // right rows order BEFORE left rows at the same ts → "at or before"
        when(col("event_type") === rightType, lit(0)).otherwise(lit(1)).as("side"))
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("side").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightId = when(col("side") === 0, col("event_id"))
    val rightTs = when(col("side") === 0, unix_micros(col("ts")))
    tagged
      .withColumn("prior_id", last(rightId, ignoreNulls = true).over(byTime))
      .withColumn("prior_us", last(rightTs, ignoreNulls = true).over(byTime))
      .filter(col("side") === 1)
      .select(
        col("event_id"), col("user_id"),
        col("prior_id"),
        (unix_micros(col("ts")) - col("prior_us")).as("gap_us"))
  }

  def errorsAfterClicks(spark: SparkSession, dir: String): DataFrame =
    nearestPrior(Tables.load(spark, dir, "events"), leftType = "error", rightType = "click")
}
