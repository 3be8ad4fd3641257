package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned bridge between graft's native Catalyst
  * expressions and the public Column API. Spark 4 made the
  * Expression⇄Column converters `private[sql]`
  * (`classic.ExpressionUtils`), so — like every Spark-extension
  * library — we expose them through a package-nested shim. Nothing
  * else in the repo reaches into Spark internals.
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native-Expression SQL function on a LIVE session (the
    * `spark.sql.extensions` config route only applies at session
    * construction; the registry itself is `private[sql]`). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
           org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
           Seq[Expression] => Expression)): Unit =
    spark.sessionState.functionRegistry.registerFunction(fn._1, fn._2, fn._3)
}
