package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column ↔ Catalyst Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala). Spark 4 moved `Column` to the ColumnNode-backed
  * sql-api module, so libraries that define native Catalyst expressions need
  * this one-hop bridge — the same pattern extension projects (Sedona, Deequ)
  * use: a tiny object inside the `org.apache.spark.sql` package scope.
  *
  * Keep this file free of any logic: everything interesting lives in
  * `graft.*`; this only re-exports two conversions.
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression behind a Column (classic sessions). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
