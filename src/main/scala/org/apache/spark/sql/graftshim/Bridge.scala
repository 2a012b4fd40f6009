package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * Spark 4 split `Column` from Catalyst (`sql-api` vs `classic`); the
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * `private[sql]`. This shim (in the sql package, the standard extension
  * pattern used by connectors) is the ONE place graft touches a
  * non-public API; everything else is public DataFrame/Catalyst surface.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
