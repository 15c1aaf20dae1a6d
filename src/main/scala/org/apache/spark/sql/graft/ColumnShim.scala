package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 moved `Column` onto the backend-agnostic `ColumnNode`
  * representation; the classic-backend converters live behind
  * `private[sql]`, so library code that defines its own Catalyst
  * expressions needs this one-file shim inside the `org.apache.spark.sql`
  * package tree (the same approach used by Delta/Frameworks that extend
  * Catalyst).
  */
object ColumnShim {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression behind a (classic-backend) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
