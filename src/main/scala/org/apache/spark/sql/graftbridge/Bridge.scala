package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private-API bridge: `Dataset.ofRows` is `private[sql]`, and it
  * is the one supported way to wrap a custom [[LogicalPlan]] (here
  * [[graft.plans.TopKPerKey]]) into a DataFrame. Living in an
  * `org.apache.spark.sql` subpackage is the standard extension-library
  * technique for reaching it; nothing else from the private surface is
  * touched.
  */
object Bridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** `Column` → fully-converted catalyst `Expression` via the session's
    * ColumnNode converter. NOT `ExpressionUtils.expression` — that wraps
    * the internal node lazily (`ColumnNodeExpression`), which neither the
    * analyzer nor the serializer can see through in a custom operator.
    */
  def expr(spark: org.apache.spark.sql.SparkSession,
      c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[SparkSession].expression(c)

  /** Flatten an EXECUTED physical plan across AQE boundaries: the
    * adaptive tree wraps finished stages in [[adaptive.QueryStageExec]]
    * leaves (and reuses exchanges) that `SparkPlan.collect` cannot
    * descend through, which is why the round-11 plan pins ran with AQE
    * disabled. Walking `AdaptiveSparkPlanExec`'s current (post-execution:
    * final) plan plus every stage's inner plan lets PlanSpec assert the
    * same shapes in the default AQE-on regime (VERDICT r11 #6). These
    * accessors are `private[sql]`/internal, hence this bridge.
    */
  def deepNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val inner: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: inner.flatMap(deepNodes)
  }
}
