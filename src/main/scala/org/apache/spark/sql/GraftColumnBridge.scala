package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters (Spark 4 moved
  * the Column(expr) constructor behind `classic.ExpressionUtils`, which is
  * private[sql]). Lives in the org.apache.spark.sql package solely to
  * satisfy that access modifier — the standard extension-point technique
  * for libraries that register custom Catalyst expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
