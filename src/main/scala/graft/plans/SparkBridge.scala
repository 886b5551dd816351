package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 moved these conversions behind
  * `private[sql] ExpressionUtils`; declaring this object inside an
  * `org.apache.spark.sql` subpackage is the standard pattern libraries use
  * to plug custom Catalyst expressions into the public Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
