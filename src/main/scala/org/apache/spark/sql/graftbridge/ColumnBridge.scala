package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column↔Expression conversions `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Custom native
  * expressions still need them to surface as `Column`s, so this bridge
  * re-exports the two conversions from inside the sql package — the
  * standard pattern for libraries shipping Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
