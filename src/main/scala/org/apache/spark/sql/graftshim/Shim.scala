package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression conversions
  * (Spark 4 moved these behind the Connect-compatible API). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy the access
  * qualifier; everything else of graft stays in its own namespace.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
