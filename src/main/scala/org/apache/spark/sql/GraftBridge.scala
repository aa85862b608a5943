package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters, so the
  * engine can compose its custom codegen expressions (graft.expressions.*)
  * in ordinary Column pipelines. The standard pattern for libraries that
  * ship Catalyst expressions without a SparkSessionExtensions requirement.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
