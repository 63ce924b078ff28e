package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4's classic helpers
 * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so
 * libraries that define native Catalyst expressions need a shim inside the
 * `org.apache.spark.sql` package tree to lift them into the public Column
 * API. This is the standard extension-point technique — no Spark internals
 * are modified or copied.
 */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
