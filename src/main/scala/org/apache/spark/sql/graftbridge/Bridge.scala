package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** The one deliberate reach into Spark's `private[sql]` surface.
  *
  * Spark 4 backs `Column` by ColumnNode, and the supported conversions
  * (`ExpressionUtils.column` / `.expression`) are `private[sql]`, so a
  * library that defines native Catalyst expressions needs a bridge compiled
  * inside the `org.apache.spark.sql` package tree to lift them into
  * `Column`s; likewise a library that defines its own `LogicalPlan`
  * operator (graft.plans.TopKPerKey) needs `Dataset.ofRows` to hand the
  * plan back as a DataFrame. This file contains only these three
  * forwarders — no behavior. Everything else in the engine lives under
  * `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode→Expression conversion. `expression` above wraps the
    * node in a LAZY `ColumnNodeExpression` that only the classic API
    * paths unwrap during analysis — inside a custom LogicalPlan operator
    * the wrapper would survive to execution (and its internal nodes are
    * not serializable). This converts up front, e.g. `col.desc` to a real
    * catalyst `SortOrder`. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
