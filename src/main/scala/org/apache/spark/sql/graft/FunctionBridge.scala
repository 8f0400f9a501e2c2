package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the session FunctionRegistry (private[sql] surface): lets the
  * library register its native Catalyst expressions as temp SQL functions on
  * an EXISTING session — the complement of [[graft.GraftExtensions]], which
  * covers sessions built with `spark.sql.extensions`. Same package-scope
  * pattern as [[ColumnBridge]]; no logic beyond the one call.
  */
object FunctionBridge {
  def registerTemp(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
