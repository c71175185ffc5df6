package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shim into Spark's private[sql] Expression<->Column bridges, needed to
  * expose custom Catalyst expressions as user-facing Columns on Spark 4's
  * ColumnNode API (the public `new Column(expr)` constructor of Spark 3 is
  * gone). Kept to two one-liners so the private-API surface is minimal. */
package object graftx {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Convert a COMPOSED Column (function-call ColumnNodes, lambdas, …)
    * into the Catalyst expression tree the analyzer resolves —
    * [[toExpression]] only unwraps Columns that already hold a raw
    * expression and returns an Unevaluable ColumnNodeExpression for
    * anything composed, which blows up if returned from an
    * injectFunction builder. This is the same converter Dataset itself
    * runs at the Column -> LogicalPlan boundary. */
  def toAnalyzableExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** True when the session-shared Dataset cache has no entries — the
    * observable for "this operator does not leak persisted frames"
    * (CacheManager entries are strongly held until an explicit unpersist,
    * unlike checkpoint blocks, which the ContextCleaner releases on GC). */
  def datasetCacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Build a DataFrame from a custom logical plan (Dataset.ofRows is
    * private[sql]; needed to surface custom operators like the as-of
    * join's logical node through the public Dataset API). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
