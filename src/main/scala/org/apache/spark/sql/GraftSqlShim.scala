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

  /** Clone a session: same SparkContext, shared state and extensions,
    * plus a COPY of the current runtime conf — conf changes on the clone
    * are invisible to the original (unlike `newSession()`, which also
    * resets runtime conf to initial values). For scoping planner-visible
    * conf flips (e.g. momentarily disabling AQE) away from concurrent
    * queries on the caller's session. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[CSparkSession].cloneSession()

  /** Re-home a Dataset's (analyzed) plan onto another session — used to
    * hand results built on a [[cloneSession]] back to the caller's
    * session so downstream composition stays single-session. */
  def rehome(spark: SparkSession, df: Dataset[_]): DataFrame =
    ofRows(spark, df.queryExecution.analyzed)

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
