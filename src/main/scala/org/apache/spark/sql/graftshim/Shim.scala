package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made these conversions
  * `private[sql]`, so custom-Expression libraries expose them through a
  * shim living in an `org.apache.spark.sql` subpackage (the documented
  * pattern for third-party Catalyst extensions). Nothing else from Spark
  * internals is touched. */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
