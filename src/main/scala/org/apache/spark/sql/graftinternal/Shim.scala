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

  /** Rebuild a persisted Dataset as a frame whose logical plan IS its
    * `InMemoryRelation` leaf — lineage truncation for iterative loops
    * without IO and without an RDD scan node (`localCheckpoint`'s
    * `ExistingRDD` violates the no-RDD-in-plans contract; a parquet
    * round-trip pays a write per iteration). A loop that builds
    * iteration k's plan on iteration k-1's full plan grows the tree
    * every round — analysis/optimization cost compounds even when every
    * action hits cache (measured in GraphOps.hostRank: 1.2 s → 16.5 s
    * per iteration by iteration 10 at SMOKE scale). The caller must have
    * persisted `df` (the relation is registered at persist time;
    * materialization is not required for the lookup, only for the
    * blocks). Correctness under eviction: the IMR keeps its child plan
    * and recomputes lost blocks from it, same recovery contract as any
    * cached frame. */
  def fromCache(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rel = spark.sharedState.cacheManager
      .lookupCachedData(spark, df.queryExecution.normalized)
      .getOrElse(throw new IllegalStateException(
        "fromCache: frame is not persisted")).cachedRepresentation
    org.apache.spark.sql.classic.Dataset.ofRows(spark, rel)
  }

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
