package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to two `private[sql]` seams the SQL row-level-DML surface needs
  * (the same shim every serious Spark storage extension ships): running an
  * already-analyzed LogicalPlan as a DataFrame (a MERGE's USING source is
  * an arbitrary resolved query — re-parsing its SQL text would be both
  * lossy and unsound), and wrapping a catalyst Expression back into a
  * user-level Column. Lives in a subpackage of org.apache.spark.sql solely
  * for access; nothing in Spark is modified or overridden. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Re-wrap a streaming micro-batch over its materialized rows: a v1
    * Sink's `addBatch` DataFrame is backed by an IncrementalExecution and
    * cannot be fed to batch writers directly — the standard v1-sink
    * re-wrap (the same move Spark's own v1 sinks make). */
  def asBatchDataFrame(spark: SparkSession, data: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        data.queryExecution.toRdd, data.schema, isStreaming = false)
}
