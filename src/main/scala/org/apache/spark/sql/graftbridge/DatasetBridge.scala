package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** LogicalPlan → DataFrame bridge.
  *
  * `Dataset.ofRows` is `private[sql]` in Spark 4, so a library that builds
  * its own logical operators (see `graft.plans.GroupedTopKNode`) needs this
  * one-line delegation inside the `org.apache.spark.sql` namespace — the
  * same established extension-library pattern as [[ColumnBridge]]. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
