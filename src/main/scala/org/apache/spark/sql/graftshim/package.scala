package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column <-> Expression
  * converters (Spark 4 moved Column construction behind ColumnNode).
  * Lives in Spark's namespace for access; contains no logic.
  */
package object graftshim {

  def columnOf(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expressionOf(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
