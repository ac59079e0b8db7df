package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal visibility bridge: Column ⇄ Expression conversion lives behind
  * `private[sql]` in Spark 4 (`classic.ExpressionUtils`); this re-export is
  * the supported-shape workaround for libraries registering native
  * expressions through the DataFrame API. No Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
