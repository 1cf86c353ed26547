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

  /** Eagerly convert a Column to a catalyst expression via the active
    * session's ColumnNode converter. Required when the expression embeds
    * into an already-running analysis (e.g. a FunctionRegistry builder):
    * the lazy ColumnNodeExpression from [[expression]] would never get
    * converted there and fails at execution with INTERNAL_ERROR.
    */
  def analyzedExpression(c: Column): Expression =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)
      case None => ExpressionUtils.expression(c)
    }

  /** Register a SQL function on a live session (sessionState is
    * `private[sql]`); same registry path SparkSessionExtensions uses at
    * build time. Idempotent — re-registration overwrites.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.GraftExtensions", name),
      builder)
  }

  /** Drain the async Spark listener bus (`private[spark]`): tests that
    * assert on listener-observed state (e.g. "plan construction launched
    * zero jobs") must wait for in-flight events instead of sleeping a
    * fixed interval — a loaded box can deliver a late job-start event
    * after a sleep-based assert and false-pass.
    */
  def waitListenerBusEmpty(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** A one-row-one-column DataFrame as a catalyst scalar subquery — the
    * form expressions like `might_contain` require their Bloom-filter
    * argument in ("a constant value or a scalar subquery expression");
    * Spark's own runtime-filter rewrite injects the same node. The
    * subquery executes once and its result broadcasts with the plan.
    */
  def scalarSubquery(df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Column =
    column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .logicalPlan))
}
