package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for `private[sql]` Column ↔ catalyst Expression conversion
  * (Spark 4 moved this behind `classic.ExpressionUtils`). Lives in the
  * `org.apache.spark.sql` package solely to satisfy the access
  * modifier; no Spark internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
