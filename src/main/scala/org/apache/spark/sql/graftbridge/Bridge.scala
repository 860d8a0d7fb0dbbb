package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression <-> Column bridge. Spark 4 made the Catalyst constructor of
  * `Column` private[sql] (columns now wrap `ColumnNode`s); extension
  * libraries that define native Catalyst expressions bridge through the
  * classic converter, which requires living under the org.apache.spark.sql
  * package — the established pattern for Spark-native extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
