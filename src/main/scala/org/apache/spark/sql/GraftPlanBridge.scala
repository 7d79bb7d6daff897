package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-file shim every Spark extension library ships: `Dataset.ofRows`
  * is `private[sql]`, so wrapping a custom [[LogicalPlan]] node into a
  * user-facing DataFrame needs a forwarder living in this package. No
  * other private API is touched.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
