package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Spark 4 keeps `Dataset.ofRows` (LogicalPlan → DataFrame) `private[sql]`;
 * custom logical operators constructed by a library need it to hand their
 * plan back to the session. Same escape-hatch convention as
 * [[ColumnBridge]].
 */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
