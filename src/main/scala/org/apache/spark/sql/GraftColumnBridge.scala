package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] classic Column<->Expression conversion
  * (Spark 4 hides Column.expr behind the Connect-compatible API). This is
  * the supported in-JVM path used by Spark's own classic module. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (classic Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** DataFrame over an already-planned RDD[InternalRow] (LogicalRDD is
    * private[sql]) — lets a physical operator hand a child's executed
    * output back to the DataFrame API without a driver collect. */
  def ofInternalRows(spark: SparkSession,
      output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]): DataFrame =
    ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(output, rdd)(
      spark.asInstanceOf[classic.SparkSession]))
}
