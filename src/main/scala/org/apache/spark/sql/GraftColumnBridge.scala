package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters so the
  * engine can expose custom Catalyst expressions as `Column`s (Spark 4
  * moved the public `new Column(expr)` constructor behind
  * `classic.ExpressionUtils`). Lives in the `org.apache.spark.sql`
  * package solely to satisfy the access qualifier; no Spark internals
  * are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
