package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-time access shim for the `private[sql]` plan-construction
  * entry point — the standard pattern every Spark extension library
  * that builds custom [[LogicalPlan]] nodes uses (a DataFrame can
  * only be created from a logical plan via `Dataset.ofRows`, which is
  * sql-private). This file is the ONLY code outside the `graft`
  * namespace, and it contains exactly one delegation.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
