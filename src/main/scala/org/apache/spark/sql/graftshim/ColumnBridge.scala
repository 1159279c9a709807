package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column <-> Expression plumbing
  * (`org.apache.spark.sql.classic.ExpressionUtils`, columnNodeSupport
  * .scala). Spark 4 detached the public Column API from Catalyst for
  * Spark Connect; a classic-mode library registering its own Catalyst
  * expressions (graft.functions.*) needs exactly these two calls, so
  * this shim lives under the sql package tree to satisfy the
  * private[sql] scope — the standard extension-library technique.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
