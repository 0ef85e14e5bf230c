package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch sessionization: the classic lag + cumulative-sum window-function
  * form of the gap rule — same output contract as the streaming
  * [[graft.streaming.Sessionize]] operator, but expressible as two window
  * passes over the sorted user partition, which makes it DuckDB-oracle-
  * checkable (the CORRECTNESS entry `sess_30min`).
  *
  * Scale: one shuffle on user_id, one sort per partition, both window
  * functions share the same (partition, ordering) so Catalyst plans a
  * single Window exec — then a partial-merge aggregate. Per-user row
  * counts are small (events/user), so the sort is cheap and skew-safe;
  * a pathological power-user key would be AQE's problem, not a plan flaw.
  */
object Sessionization {

  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events"))

  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUserTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tUs = unix_micros(col("ts"))
    val prevUs = lag(tUs, 1).over(byUserTime)
    val isNew = when(prevUs.isNull || tUs - prevUs > gapMinutes * 60L * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("session_id",
        sum(isNew).over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
  }
}
