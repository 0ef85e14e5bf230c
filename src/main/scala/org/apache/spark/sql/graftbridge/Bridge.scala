package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one deliberate reach into Spark's `private[sql]` surface.
  *
  * Spark 4 backs `Column` by ColumnNode, and the supported conversions
  * (`ExpressionUtils.column` / `.expression`) are `private[sql]`, so a
  * library that defines native Catalyst expressions needs a bridge compiled
  * inside the `org.apache.spark.sql` package tree to lift them into
  * `Column`s. This file contains only these two forwarders — no behavior.
  * Everything else in the engine lives under `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
