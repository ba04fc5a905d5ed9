package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst `Expression` bridge.
  *
  * Spark 4 made the converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so engine code
  * that must build an expression NODE directly — bypassing
  * name-based `FunctionRegistry` resolution, e.g.
  * [[graft.criteria.Criteria.withPartitionColumns]]'s registry-immune
  * `DateFormatClass` — reaches it through this subpackage object.
  * No Spark internals are reimplemented here; this is visibility
  * plumbing only.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
