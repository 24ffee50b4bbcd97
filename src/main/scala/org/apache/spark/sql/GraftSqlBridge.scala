package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into spark-sql's package-private Column <-> Expression converters.
  * Lives in the org.apache.spark.sql package purely to satisfy the access
  * modifier; the graft function registry uses it to register Presto-named
  * functions whose bodies are built with the public Column DSL.
  *
  * Column → Expression must go through the *session's* converter
  * (classic.SparkSession.expression) so the ColumnNode tree is materialized
  * into catalyst expressions the analyzer can resolve — the static
  * ExpressionUtils.expression wraps lazily and the wrapper would survive
  * (unresolved) into codegen.
  */
object GraftSqlBridge {
  def toCol(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpr(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a batch DataFrame's physical plan as an isStreaming=true frame
    * — what a v1 streaming Source's getBatch must return (the
    * incremental planner asserts it). The RDD is the batch plan's own
    * lazy toRdd, so nothing materializes until the micro-batch runs. */
  def streamingDataFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
