package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` plan→DataFrame constructor so graft's
  * custom logical operators (graft.plans) can surface as ordinary
  * DataFrames. Lives in `org.apache.spark.sql` solely for access; the
  * one call it wraps — `classic.Dataset.ofRows` — is the same entry
  * every DataFrame construction inside Spark goes through, so this adds
  * no behavior of its own. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Test-only peek at the strategies an extensions object would
    * install (`buildPlannerStrategies` is `private[sql]`). */
  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession) =
    ext.buildPlannerStrategies(spark)
}
