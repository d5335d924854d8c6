package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor (the Column
  * API is connect-unified); the supported conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. This bridge object lives under `org.apache.spark.sql`
  * solely to re-export the two conversions for graft's custom Catalyst
  * expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder in the session's FunctionRegistry (also
    * `private[sql]`), making an expression callable from `spark.sql`.
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
