package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's package-private Column <-> Expression
  * conversion (Spark 4 moved classic Column construction behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Lives under the
  * org.apache.spark.sql package solely for access; no Spark internals are
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion via the session's converter.
    * `expression` above wraps the Column's node lazily
    * (`ColumnNodeExpression`), which only materializes when a Dataset
    * operation analyzes it — returned from a FunctionRegistry builder it
    * stays opaque (VOID type) and analysis fails. This converts the whole
    * node tree to real catalyst expressions up front, so DSL-built
    * Columns can back SQL function registrations.
    */
  def expressionEager(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)
}

/** Bridge for constructing a DataFrame from a hand-built LogicalPlan
  * (custom operator nodes) and for idempotently registering extra planner
  * strategies on a live session — `Dataset.ofRows` is `private[sql]` in
  * Spark 4's classic module.
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def addStrategy(spark: org.apache.spark.sql.SparkSession,
                  strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  def addOptimization(spark: org.apache.spark.sql.SparkSession,
                      rule: org.apache.spark.sql.catalyst.rules.Rule[
                        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }
}
