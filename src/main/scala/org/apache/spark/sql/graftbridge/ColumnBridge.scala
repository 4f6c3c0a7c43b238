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

  /** The name a Column was `.as(...)`-aliased to, if any (the node tree
    * is inspectable before analysis; the catalyst Expression is not). */
  def aliasName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.Alias => a.name.headOption
    case _ => None
  }

  /** DataFrame over a raw logical plan (`classic.Dataset.ofRows` is
    * `private[sql]`) — how custom [[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]]
    * operators enter the DataFrame API. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
