package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge.
  *
  * `classic.ExpressionUtils` is `private[sql]`; hosting this one-file
  * bridge inside the `org.apache.spark.sql` package namespace is the
  * established pattern for Spark extension libraries that construct
  * custom Catalyst expressions (the same approach public projects like
  * Qbeast use for package-private Dataset/Column factories). Everything
  * else in graft stays in its own namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
