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
}
