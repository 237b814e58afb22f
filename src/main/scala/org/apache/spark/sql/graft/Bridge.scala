package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's classic converters (`ExpressionUtils.column/expression`) are
  * `private[sql]`; third-party Catalyst extensions conventionally reach
  * them from a shim object inside the `org.apache.spark.sql` namespace.
  * This is the only file outside the `graft` package, and it contains no
  * logic — just visibility plumbing.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
