package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Runtime function registration into an EXISTING session's FunctionRegistry.
 *
 * `SparkSessionExtensions.injectFunction` only applies at session build
 * time; a session created without `.withExtensions(new GraftExtensions)`
 * (the common case for a host app that owns session construction) could
 * otherwise never reach graft's native SQL functions. `sessionState` is
 * `private[sql]`, hence this one-method shim living under the sql package —
 * the standard pattern for libraries exposing Catalyst expressions to SQL
 * post-construction. Registration is idempotent: `registerFunction`
 * replaces an existing entry with the same identifier.
 */
object RegistryShim {
  def register(spark: SparkSession, ident: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark match {
      case c: org.apache.spark.sql.classic.SparkSession =>
        c.sessionState.functionRegistry.registerFunction(ident, info, builder)
      case other => throw new IllegalStateException(
        s"cannot register SQL functions on session type ${other.getClass.getName}; " +
          "use .withExtensions(new graft.plans.GraftExtensions) at build time")
    }
}
