package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 moved the classic `new Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. Ecosystem libraries that ship custom expressions
  * (Sedona, Spark-NLP, …) bridge this with a one-object shim living in
  * an `org.apache.spark.sql` subpackage; this is that shim, and the
  * only file in the project outside the `graft` namespace.
  */
object Shims {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
