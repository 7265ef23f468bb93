package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-time access shim for `private[sql]` entry points — the
  * standard pattern every Spark extension library that builds custom
  * [[LogicalPlan]] nodes uses. This file is the ONLY code outside the
  * `graft` namespace, and it contains exactly two delegations:
  *
  *  - `Dataset.ofRows` (a DataFrame can only be created from a
  *    logical plan here);
  *  - `cloneSession` (an isolated child that INHERITS the caller's
  *    runtime conf at call time — `newSession()` starts from
  *    SparkConf defaults, silently dropping harness conf like
  *    shuffle-partition or cache-mode overrides).
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
