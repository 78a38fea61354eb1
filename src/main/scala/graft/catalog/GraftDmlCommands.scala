package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge

/** Standalone row-level `UPDATE` / `DELETE FROM` — the other two
  * statements of Iceberg's DML trio beside MERGE
  * (the reference's storage layer supports all three;
  * `/root/reference/jobs/merge_orders_silver.py:135-147` exercises only
  * MERGE). Verbatim through `spark.sql`, same contract as
  * [[GraftMergeCommand]]: expressions stay unresolved until `run`,
  * where they resolve as `Column`s against the registered target; the
  * result replaces the registration (eager `localCheckpoint` — a DML
  * statement's effect must not lazily recompute).
  *
  * Scale shape: both are single-pass projections/filters over the
  * target — no join, no shuffle; the condition pushes down to the scan
  * like any filter. SQL three-valued logic: a NULL condition neither
  * deletes nor updates the row.
  */
private[catalog] object GraftDml {

  /** Target resolution shared by UPDATE and DELETE — the registered
    * table named by the statement (3-part graft prefix or bare
    * 2-part), plus the alias the condition may reference. */
  def resolveTarget(spark: SparkSession, plan: LogicalPlan,
                    statement: String): (Seq[String], String, DataFrame) = {
    val (aliasOpt, parts) = plan match {
      case SubqueryAlias(id, u: UnresolvedRelation) =>
        (Some(id.name), u.multipartIdentifier)
      case u: UnresolvedRelation => (None, u.multipartIdentifier)
      case other => throw new IllegalArgumentException(
        s"unsupported $statement target plan: ${other.nodeName}")
    }
    val norm = parts.map(_.toLowerCase(java.util.Locale.ROOT))
    val key = norm match {
      case Seq(cat, ns, t) if GraftCatalogs.isGraft(cat) => Seq(ns, t)
      case Seq(_, _)                                     => norm
      case _ => throw new IllegalArgumentException(
        s"$statement target must be a registered <ns>.<table>: " +
          parts.mkString("."))
    }
    val df = TableStore.registry(spark).getOrElse(key,
      throw new java.util.NoSuchElementException(
        s"$statement target not registered: ${parts.mkString(".")}"))
    (key, aliasOpt.getOrElse(parts.last), df)
  }

  /** Replace the registration with the statement's materialized
    * effect — the same commit tail as [[GraftMergeCommand]]. */
  def commit(spark: SparkSession, key: Seq[String],
             next: DataFrame): Unit = {
    val result = next.localCheckpoint()
    TableStore.registry(spark).put(key, result)
    result.createOrReplaceTempView(s"${key.head}_${key(1)}")
  }

  def nameOf(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case n: org.apache.spark.sql.catalyst.expressions.NamedExpression =>
      n.name
    case other => other.sql
  }
}

/** `DELETE FROM <t> [WHERE cond]` — keeps the rows where the condition
  * is not TRUE (NULL keeps, per SQL DELETE semantics). */
case class GraftDeleteCommand(delete: DeleteFromTable)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val (key, alias, df) =
      GraftDml.resolveTarget(spark, delete.table, "DELETE")
    val cond = coalesce(PlanBridge.column(delete.condition), lit(false))
    GraftDml.commit(spark, key, df.as(alias).filter(!cond))
    Seq.empty
  }
}

/** `UPDATE <t> SET c = v, … [WHERE cond]` — per-column conditional
  * projection; assignment values are cast to the target column type
  * (same hardening as MERGE's assignment path). Unknown assignment
  * columns raise. */
case class GraftUpdateCommand(update: UpdateTable)
    extends LeafRunnableCommand {
  private def assignments: Seq[Assignment] = update.assignments
  private def condition: Option[Expression] = update.condition
  override def run(spark: SparkSession): Seq[Row] = {
    val (key, alias, df) =
      GraftDml.resolveTarget(spark, update.table, "UPDATE")
    val schema = df.schema
    assignments.foreach { a =>
      val c = GraftDml.nameOf(a.key)
      if (!df.columns.exists(_.equalsIgnoreCase(c)))
        throw new IllegalArgumentException(
          s"UPDATE assigns unknown column: $c")
    }
    val cond = condition.map(c => coalesce(PlanBridge.column(c),
      lit(false))).getOrElse(lit(true))
    def outCol(c: String): Column =
      assignments.find(a => GraftDml.nameOf(a.key).equalsIgnoreCase(c))
        .map(a => when(cond, PlanBridge.column(a.value))
          .otherwise(col(s"$alias.$c"))
          .cast(schema(c).dataType))
        .getOrElse(col(s"$alias.$c"))
        .as(c)
    GraftDml.commit(spark, key,
      df.as(alias).select(df.columns.toSeq.map(outCol): _*))
    Seq.empty
  }
}
