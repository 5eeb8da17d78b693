package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression converters for graft's native
  * expressions ([[graft.functions.CanonicalUrl]],
  * [[graft.functions.ResolveHref]]).
  *
  * Spark 4 moved these to `org.apache.spark.sql.classic.ExpressionUtils`
  * and scoped them `private[sql]`, so library code that wants a Column
  * API for a custom expression WITHOUT forcing session-level function
  * registration (graft.clean.UrlFns.canonicalUrl is called from
  * session-less Column-helper contexts) needs this one-file subpackage
  * bridge — the established pattern for Spark extension libraries.
  * Nothing else may live in this package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
