package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]`; extension libraries that
  * define custom `Expression`s host a thin forwarder inside the sql
  * package — the same access pattern Spark's own connectors use.
  */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an arbitrary logical plan (`Dataset.ofRows` is
    * `private[sql]` in Spark 4) — used by PlanSpec to materialize and
    * count the INPUT subtree of a plan node under audit.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
