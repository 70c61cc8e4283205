package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge into Spark's `private[sql]` surface, required to
  * expose custom Catalyst expressions as `Column`s from library code (the
  * same pattern every Spark extension library uses — a subpackage of
  * `org.apache.spark.sql` so `private[sql]` members resolve). Kept to the
  * absolute minimum: expr↔Column conversion plus the `AbstractDataType`
  * alias needed to override `ExpectsInputTypes.inputTypes`.
  */
object SparkBridge {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
