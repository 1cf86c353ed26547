package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split Column from catalyst Expression (sql-api); the converters
  * are `private[sql]`. This bridge — compiled inside the org.apache.spark.sql
  * package like every Spark-extension library does — re-exposes them to
  * graft for its custom Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
