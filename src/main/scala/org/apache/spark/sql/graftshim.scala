package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The one sanctioned crossing between graft's native Catalyst expressions
  * and the public Column API. Spark 4 moved Column construction behind
  * `ColumnNode`, leaving `classic.ExpressionUtils.column`/`expression` as
  * the conversion — public bytecode, `private[sql]` in Scala — so this shim
  * lives in `org.apache.spark.sql` to reach it. Everything else in the repo
  * stays in package graft; keep this file free of logic.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
