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

  /** Clone a session: a full copy of the caller's SQLConf / temp state
    * over the SAME SparkContext, shared-state, and cache manager.
    * `cloneSession()` is `private[sql]`; it is exactly what an
    * operator that needs loop-local conf overrides (fixpoint shuffle
    * width, AQE off) should mutate instead of the caller's session —
    * concurrent queries on the caller's session then keep planning
    * under their own settings.
    */
  def cloneSession(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Re-root a DataFrame's logical plan in another session of the same
    * SparkContext (`Dataset.ofRows` is `private[sql]`). Cached plans
    * resolve through the shared CacheManager, so a frame persisted
    * under the source session stays a cache hit after re-rooting.
    */
  def inSession(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)

  /** Build a DataFrame from a raw logical plan (`Dataset.ofRows` is
    * `private[sql]`) — for probes that perform plan surgery, e.g. the
    * r19 sort-resampling A/B (inject a repartition under a global Sort).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Deterministically drain the async SparkListener bus
    * (`listenerBus.waitUntilEmpty` is `private[spark]`). Specs that
    * assert on listener-observed counters need this instead of a sleep:
    * a fixed sleep undercounts on a loaded machine and the assertion
    * passes (or fails) vacuously.
    */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession,
      timeoutMillis: Long = 30000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis)
}
