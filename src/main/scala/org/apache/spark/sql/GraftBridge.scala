package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression => CatalystExpression}

/** Minimal bridge into `private[sql]` surfaces needed to register native
  * Catalyst expressions from library code (graft.functions.expressions):
  * Column <-> Expression conversion and the AbstractDataType bound on
  * ExpectsInputTypes.inputTypes. Lives in the org.apache.spark.sql
  * namespace solely for visibility; no Spark internals are modified.
  */
object GraftBridge {
  type AbstractDT = org.apache.spark.sql.types.AbstractDataType

  def column(e: CatalystExpression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): CatalystExpression =
    classic.ExpressionUtils.expression(c)

  /** Drain the listener bus (private[spark] surface) — bench telemetry
    * reads task metrics from a SparkListener, and without a drain the
    * tail of one query's async task-end events would be attributed to
    * the next query. Returns false on timeout.
    */
  def drainListenerBus(spark: SparkSession, timeoutMillis: Long): Boolean =
    try { spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
