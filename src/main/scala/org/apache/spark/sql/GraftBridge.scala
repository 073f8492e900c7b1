package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface: converting between
  * `Column` and Catalyst `Expression` for the engine's custom
  * expressions (Spark offers no public constructor for this in 4.x;
  * placing the two forwarders inside the sql package is the standard
  * extension-library technique).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
