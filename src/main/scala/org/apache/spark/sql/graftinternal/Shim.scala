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

  /** True iff no Dataset is cached in the session — Bench/Verify assert
    * this between queries so one query's leaked persist cannot skew the
    * next query's timing (the round-2 q35 leak depressed the five
    * queries benched after it). `CacheManager` is `private[sql]`. */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty

  /** Register a native SQL function on an already-built session — the
    * post-hoc path of [[graft.GraftExtensions]]. Lives here with the
    * other internal-surface touches: the FunctionRegistry is Spark
    * session state, not public API (the build-time
    * `spark.sql.extensions` path needs no internals at all). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(name, info, builder)
}
