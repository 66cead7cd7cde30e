package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made `Column` implementation-agnostic (ColumnNode); the
  * classic Expression bridge is package-private. This shim exposes the
  * two conversions our custom Catalyst expressions need. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` at the Scala level; our custom
    * expressions need it to declare `inputTypes` (ImplicitCastInputTypes
    * — analysis-time type checking instead of runtime ClassCastException
    * or silently-misread array slots). Public alias through this
    * in-package shim. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Block until the listener bus has delivered all posted events (it is
    * asynchronous; `private[spark]`) — the bench's per-sample task
    * accounting reads listener-accumulated metrics right after a job. */
  def drainListeners(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
