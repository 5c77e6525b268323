package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4.x moved `Column` to a ColumnNode representation; wrapping a
  * custom Catalyst `Expression` into a `Column` (and back) goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`
  * — hence this one-file shim living inside the org.apache.spark.sql
  * package. Nothing else in the engine touches Spark internals this way.
  */
object Shim {
  def col(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
