package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal bridge into `private[sql]` Dataset construction and Column ↔
  * Expression conversion — the standard mechanism for Spark extensions
  * that add their own logical operators. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** Eagerly convert a Column to a Catalyst Expression via the session's
    * converter (ExpressionUtils.expression returns a lazy placeholder that
    * only resolves during analysis). */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[CSparkSession].expression(c)

  /** Lazy Column → Expression (resolves during analysis) — for embedding
    * user columns inside custom expressions. */
  def lazyExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Wrap a Catalyst Expression back into a Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Explicitly free the block-manager storage behind a
    * `localCheckpoint()`ed Dataset (iterative algorithms otherwise
    * accumulate one checkpoint's blocks per round until GC-driven cleanup
    * catches up). No-op unless `df` IS the checkpoint (a bare RDD scan) —
    * never unpersists a checkpoint referenced through other operators. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case r: execution.LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
