package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge between the public `Column` API and Catalyst
  * [[Expression]]s, needed to expose graft's custom codegen expressions
  * (e.g. `graft.plans.CosineSimilarity`) as ordinary `Column`s.
  *
  * Lives under `org.apache.spark.sql` because the converter utilities are
  * `private[sql]`; this is the standard extension-library pattern (same
  * approach Spark connectors use) and touches no session-private state.
  */
object Shims {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
