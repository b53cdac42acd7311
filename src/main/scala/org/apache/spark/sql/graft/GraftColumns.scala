package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * standard extension-library escape hatch (public Spark extensions such
  * as Qbeast and Pathling ship the same package-placed factory) for
  * wiring a custom Catalyst `Expression` into the Column API without a
  * SQL-registration round-trip. Used by graft ops whose expressions
  * carry plan-time payloads (e.g. `NearestCells`' centroid matrix) that
  * have no literal SQL spelling. */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
