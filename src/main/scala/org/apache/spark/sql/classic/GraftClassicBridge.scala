package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** classic-package half of [[org.apache.spark.sql.GraftBridge]]:
  * ColumnNodeExpression is private[classic], so the eager unwrap lives
  * here. See GraftBridge.expressionTree for the why. */
object GraftClassicBridge {
  def expressionTree(c: Column): Expression =
    ExpressionUtils.expression(c) match {
      case cne: ColumnNodeExpression => ColumnNodeToExpressionConverter(cne.node)
      case e => e
    }
}
