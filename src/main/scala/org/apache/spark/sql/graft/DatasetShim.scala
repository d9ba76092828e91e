package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway a DataFrame-level custom operator needs:
  * turning a hand-built [[LogicalPlan]] back into a user-facing DataFrame.
  * Every extension library that adds whole logical operators (rather than
  * expressions or rules) ships exactly this shim in an
  * `org.apache.spark.sql.*` package; it contains no logic of its own.
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
