package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow bridge into Spark's `private[sql]` classic API — the same
  * doorway extension libraries (Delta, Iceberg's Spark module, …) use:
  * a file under `org.apache.spark.sql` so `private[sql]` members are
  * reachable, exposing exactly the two constructors the graft MERGE
  * command needs and nothing else.
  */
object PlanBridge {

  /** A DataFrame over an arbitrary (possibly unresolved) logical plan;
    * analysis runs through the session's full rule stack, including
    * graft's own resolution rules. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A user-facing Column over a raw Catalyst expression. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** A detached twin of `spark` — same shared state, a COPY of the
    * session state (confs included), so a caller can raise session
    * confs for ONE job without mutating (or locking) the user
    * session. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
