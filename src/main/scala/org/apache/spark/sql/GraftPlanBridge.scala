package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** In-package bridge: build a DataFrame from a custom LogicalPlan.
  * Dataset.ofRows is private[sql], so custom-plan libraries expose it via a
  * shim in this package (the standard pattern across Spark extension
  * projects). This is the only file outside the graft namespace.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
