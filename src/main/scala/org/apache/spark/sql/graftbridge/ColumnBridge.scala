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

  /** Eagerly converts the Column's node tree to a catalyst Expression
    * (function Columns become catalyst UnresolvedFunctions the analyzer can
    * resolve). The lazy `ExpressionUtils.expression` wrapper only resolves
    * inside Dataset operations — a tree handed to the function registry
    * must already be catalyst, or codegen meets an unresolvable
    * ColumnNodeExpression. */
  def unwrap(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
