package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column⇄Expression converters (private[sql] in
  * Spark 4): lets graft wrap a native Catalyst Expression into a Column
  * directly — e.g. [[graft.plans.PslSuffixLenExpr]] inside a pure
  * Column-level function where no SparkSession is in scope to resolve a
  * registered function name. Same mechanism `call_function` uses after
  * analysis; this just skips the registry round-trip.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
