/* Bridge into Spark's private[sql] Column <-> Expression conversion —
 * the standard pattern for libraries shipping native Catalyst
 * expressions (the public Column API intentionally hides expression
 * internals since Spark 4's sql-api split). */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
