package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge for wrapping custom Catalyst expressions as Columns.
  *
  * `ExpressionUtils.column/expression` are `private[sql]` in Spark 4, so
  * extension libraries shipping native expressions (the same pattern
  * Delta/Iceberg/frameless use) declare a shim inside the
  * `org.apache.spark.sql` package tree. This is the ONLY private-API
  * touchpoint in the library; everything else is public DataFrame API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
