package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4's `Column` wraps a `ColumnNode`, and the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]` —
  * this sub-package of `org.apache.spark.sql` is the sanctioned-in-
  * practice way for a library to lift a custom `Expression` into the
  * public Column API without a session extension round-trip.
  */
package object graftglue {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
