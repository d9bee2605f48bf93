package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 split `Column` from Catalyst `Expression`; the converters live
  * in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. Extension libraries conventionally reach them from a
  * subpackage of `org.apache.spark.sql` — this object is the single place
  * graft does so.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
