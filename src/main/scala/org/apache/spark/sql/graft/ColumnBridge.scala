package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters so
  * graft's native Catalyst expressions (e.g.
  * `graft.expressions.SimHash64`) can be exposed as plain `Column`s
  * without registering session extensions. The underlying converters
  * are stable public bytecode (`classic/columnNodeSupport.scala`);
  * only the Scala access modifier requires living under this package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
