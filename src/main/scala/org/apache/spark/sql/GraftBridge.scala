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
}
