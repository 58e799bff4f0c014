package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ catalyst-Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4's
  * columnNodeSupport). Lives under org.apache.spark.sql solely to
  * satisfy the access modifier — the standard extension-library shim.
  *
  * Why graft needs it: kernels that close over per-query state
  * (centroid matrices, PQ codebooks/LUTs) must NOT go through the
  * session-global function registry — concurrent query construction on
  * one SparkSession (graft.Verify's thread pool) lets one query's
  * register() swap another's state between ITS register() and ITS
  * DataFrame construction. Building the Column directly from the
  * expression bakes the state in with no shared mutable step. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
