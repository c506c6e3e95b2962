package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's private[sql] Column <-> Expression converters, so the
  * graft library can expose native Catalyst expressions as Columns. Lives in
  * an org.apache.spark.sql subpackage purely for access; no Spark internals
  * are modified.
  */
object ColumnBridge {
  def wrap(e: Expression): Column = ExpressionUtils.column(e)
  def unwrap(c: Column): Expression = ExpressionUtils.expression(c)
}
