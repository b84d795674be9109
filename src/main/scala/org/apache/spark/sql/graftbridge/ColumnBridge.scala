package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4's `Column` wraps a ColumnNode and the converters
  * (`classic.ExpressionUtils`) are `private[sql]`, so a library registering
  * native expressions needs this one-file shim inside the
  * `org.apache.spark.sql` namespace — the established pattern for Spark
  * extension libraries. No Spark internals are copied; these are direct
  * delegations. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
