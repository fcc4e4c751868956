package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column <-> Expression converters so
  * graft's native Catalyst expressions (e.g.
  * graft.functions.CosineSimilarity) get a Column front door. This is
  * the conventional shim for libraries shipping custom expressions
  * without a FunctionRegistry round-trip.
  */
object GraftColumn {
  def apply(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a hand-built logical plan (runs the analyzer) —
    * needed to place custom LogicalPlan nodes like TopKPerGroup.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
