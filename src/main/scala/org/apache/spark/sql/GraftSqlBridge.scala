package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so graft can
  * wrap a custom LogicalPlan ([[graft.plans.TopKPerKey]]) as a DataFrame.
  * Lives in org.apache.spark.sql purely for access; no Spark internals are
  * modified — the same pattern third-party Spark extensions use. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
