package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's package-private Dataset
  * constructor: building a DataFrame from a CUSTOM LogicalPlan (the
  * documented extension path for whole-operator semantics — custom
  * logical node + injected planner Strategy + custom SparkPlan — has no
  * public "plan → DataFrame" entry, so every engine that ships custom
  * operators carries exactly this bridge). Nothing else in the repo
  * reaches into org.apache.spark.sql internals.
  */
object GraftDatasetBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
