package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` constructor; the supported
  * conversion lives in `private[sql]` ExpressionUtils. This bridge (in a
  * package under org.apache.spark.sql, the standard extension technique)
  * exposes it to graft's custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `ExpectsInputTypes.inputTypes` is typed with the `private[sql]`
  * AbstractDataType, so an expression OUTSIDE org.apache.spark.sql cannot
  * override it directly; this trait pins (DOUBLE, BIGINT) inputs with
  * implicit casts for graft's (score, id) aggregates — misuse (e.g. a
  * STRING id) fails at analysis instead of executor-side.
  */
trait ScoreIdInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType,
      org.apache.spark.sql.types.LongType)
}
