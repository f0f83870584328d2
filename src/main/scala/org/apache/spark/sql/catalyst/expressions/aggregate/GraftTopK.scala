package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for Spark's `private[aggregate]` [[CollectTopK]] — the
  * bounded-priority-queue top-k aggregate (a [[Collect]] subclass, so
  * it has real partial aggregation: each map partition keeps at most k
  * elements per group and merge combines queues). Same one-file-shim
  * pattern as [[org.apache.spark.sql.GraftBridge]]: the expression is
  * stable engine machinery (it backs the pandas-on-Spark
  * nlargest/nsmallest path) but not exposed through the public
  * functions API, and re-implementing a typed bounded-heap aggregate
  * would duplicate tested Spark code.
  */
object GraftTopK {
  /** `reverse = false` keeps the k LARGEST elements under the child
    * type's natural ordering and emits them largest-first;
    * `reverse = true` keeps the k smallest, smallest-first. */
  def collectTopK(child: Expression, k: Int, reverse: Boolean): Expression =
    CollectTopK(child, k, reverse).toAggregateExpression()
}
