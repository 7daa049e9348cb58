package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset.ofRows — the standard technique
  * public Spark extension libraries use to materialize a custom
  * LogicalPlan as a DataFrame (a one-line shim placed inside the sql
  * package namespace). Used by graft.plans.AsofJoinNative. */
object GraftShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
