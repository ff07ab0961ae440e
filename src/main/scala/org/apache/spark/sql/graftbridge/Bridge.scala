package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Columns are backed by ColumnNodes, resolved per
  * session); extension libraries that define native Catalyst
  * expressions need this one seam into the classic converter. Kept to
  * exactly two forwarders — everything else in graft uses the public
  * API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
