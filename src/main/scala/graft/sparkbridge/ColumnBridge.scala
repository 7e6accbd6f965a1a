// Lives in a subpackage of org.apache.spark.sql so it can reach the
// private[sql] Column <-> catalyst Expression converters that Spark 4
// moved behind org.apache.spark.sql.classic.ExpressionUtils. This is
// the standard technique for Spark extension libraries that register
// custom Expressions.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
