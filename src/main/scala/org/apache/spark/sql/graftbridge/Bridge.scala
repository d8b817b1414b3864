package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 keeps these converters
  * `private[sql]`, so third-party engines host a shim inside the sql
  * package — the established pattern for libraries that ship native
  * expressions (cf. SNIPPETS.md [1][3]).
  */
object Bridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
