package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Minimal `private[sql]` bridge: building a DataFrame from a custom
 * LogicalPlan ([[graft.plans.AsOfJoin]]) requires `Dataset.ofRows`, which
 * Spark scopes to its own package tree. This is the standard
 * extension-library pattern (Sedona, Delta and Iceberg runtimes all ship
 * one); nothing else in the engine lives outside the `graft` namespace.
 */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
