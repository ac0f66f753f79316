package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge from a raw Catalyst [[LogicalPlan]] to a public [[DataFrame]] —
  * the plan-level sibling of [[GraftColumn]]. `Dataset.ofRows` is
  * `private[sql]`, so this one-liner sits in the sql package.
  */
object GraftDataset {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
