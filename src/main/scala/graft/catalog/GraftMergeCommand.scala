package graft.catalog

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge

/** Executes SQL `MERGE INTO` against a [[TableStore]]-registered table —
  * the reference's core write statement
  * (`/root/reference/jobs/merge_orders_silver.py:135-147`,`:156-165`)
  * running verbatim through `spark.sql` without a lakehouse catalog.
  *
  * [[GraftSqlParser]] swaps every parsed `MergeIntoTable` for this
  * command (plain Spark has no executable MERGE target here anyway, so
  * nothing is shadowed). All clause expressions stay UNRESOLVED until
  * `run`, where they resolve as `Column`s against a full-outer join of
  * target × source — the same join + per-row-resolution shape
  * [[graft.cdc.Merge.mergeCdc]] uses, generalized to arbitrary clause
  * lists: first-match-wins `when` chains over MATCHED / NOT MATCHED /
  * NOT MATCHED BY SOURCE actions, star actions expanded from the target
  * schema, assignment values cast to the target column type.
  *
  * The result replaces the registered table (eager `localCheckpoint` —
  * MERGE is a statement, its effect must not lazily recompute). On a
  * cluster this is where the copy-on-write table swap
  * ([[graft.pipeline.Snapshot]]) would write; scale shape is the single
  * key shuffle of the underlying join.
  */
case class GraftMergeCommand(merge: MergeIntoTable)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val (aliasOpt, parts) = targetNameParts(merge.targetTable)
    val norm = parts.map(_.toLowerCase(java.util.Locale.ROOT))
    val key = norm match {
      case Seq(cat, ns, t) if GraftCatalogs.isGraft(cat) => Seq(ns, t)
      case Seq(_, _)                                     => norm
      case _ => throw new IllegalArgumentException(
        s"MERGE target must be a registered <ns>.<table>: ${parts.mkString(".")}")
    }
    // registry first; snapshot-backed targets read LIVE and commit a
    // new version (row-level MERGE on a versioned table — Iceberg's
    // behavior, shared with UPDATE/DELETE via GraftDml.commit)
    val targetDf0 = TableStore.registry(spark).getOrElse(key,
      new TableStore(spark).snapshotPath(key.head, key(1))
        .map(p => GraftDml.snapshotRead(spark, p))
        .getOrElse(throw new java.util.NoSuchElementException(
          s"MERGE target not registered: ${parts.mkString(".")}")))
    val tq = aliasOpt.getOrElse(parts.last)
    lazy val sq = sourceAlias(merge.sourceTable).getOrElse(
      throw new IllegalArgumentException(
        "star action needs an aliased/named MERGE source"))

    val srcPlain = PlanBridge.ofRows(spark, merge.sourceTable)

    // MERGE SCHEMA EVOLUTION (Iceberg's merge-schema): with the target
    // property 'write.merge-schema'='true' (or the session conf
    // spark.graft.merge.mergeSchema), source-only columns are ADDED to
    // the target schema before the clauses resolve — the star actions
    // then write them, and pre-existing target rows read NULL, exactly
    // Iceberg's add-column semantics (a metadata-only widen composed
    // with S7' ALTER ADD COLUMNS; nothing old is rewritten). Gated on
    // a star action: an explicit-assignment MERGE cannot name the new
    // columns anyway, and widening a schema the statement never asked
    // for would surprise. Without the flag, extra source columns are
    // ignored (the star expands from the TARGET schema), today's
    // contract.
    val mergeSchemaOn =
      spark.conf.getOption("spark.graft.merge.mergeSchema")
        .map(_.toBoolean).getOrElse(
          // fail-closed like the other property gates: only "no such
          // table" means "no properties"
          (try Some(new TableStore(spark).properties(key.head, key(1)))
           catch { case _: NoSuchElementException => None })
            .flatMap(_.get("write.merge-schema")).exists(_.toBoolean))
    val hasStar =
      (merge.matchedActions ++ merge.notMatchedActions).exists {
        case _: InsertStarAction | _: UpdateStarAction => true
        case _ => false
      }
    val extraCols = srcPlain.schema.fields.toSeq.filterNot(f =>
      targetDf0.columns.exists(_.equalsIgnoreCase(f.name)))
    val targetDf =
      if (mergeSchemaOn && hasStar && extraCols.nonEmpty)
        extraCols.foldLeft(targetDf0)((df, f) =>
          df.withColumn(f.name, lit(null).cast(f.dataType)))
      else targetDf0

    val target = targetDf.as(tq).select(col("*"), lit(true).as("__t"),
      monotonically_increasing_id().as("__tid"))
    val source = srcPlain
      .select(col("*"), lit(true).as("__s"),
        monotonically_increasing_id().as("__sid"))
    val raw = target.join(source,
      PlanBridge.column(merge.mergeCondition), "full_outer")

    // Iceberg raises when one target row matches several source rows;
    // same contract here, ON by default (set
    // spark.graft.merge.checkCardinality=false to opt out when the
    // source is known pre-deduped and the guard's per-target-row
    // window shuffle is worth skipping). The window key gives every
    // UNMATCHED source row its own partition ((false, __sid)) — keying
    // on __tid alone would put all NOT-MATCHED rows in the single
    // __tid=null partition, a one-reducer skew bomb on insert-heavy
    // merges at scale.
    val joined =
      if (!spark.conf.getOption("spark.graft.merge.checkCardinality")
          .map(_.toBoolean).getOrElse(true)) raw
      else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(
          col("__t").isNotNull, coalesce(col("__tid"), col("__sid")))
        raw.withColumn("__m",
            sum(when(col("__s").isNotNull, 1).otherwise(0)).over(w))
          .withColumn("__g", when(col("__t").isNotNull && col("__m") > 1,
            raise_error(lit("MERGE cardinality violation: a target row " +
              "matches multiple source rows"))).otherwise(lit(null)))
          .filter(col("__g").isNull).drop("__m", "__g")
      }

    val schema = targetDf.schema
    def tCol(c: String) = col(s"$tq.$c")
    def nullOf(c: String): Column = lit(null).cast(schema(c).dataType)
    def condCol(c: Option[Expression]): Column =
      c.map(PlanBridge.column).getOrElse(lit(true))
    def assigned(assigns: Seq[Assignment], c: String,
                 default: Column): Column =
      assigns.find(a => nameOf(a.key).equalsIgnoreCase(c))
        .map(a => PlanBridge.column(a.value)).getOrElse(default)

    // First-match-wins chains, built back-to-front so the first SQL
    // clause ends up outermost.
    def keepChain(actions: Seq[MergeAction], default: Column): Column =
      actions.reverse.foldLeft(default) { (acc, a) =>
        val keeps = !a.isInstanceOf[DeleteAction]
        when(condCol(a.condition), lit(keeps)).otherwise(acc)
      }
    def valueChain(actions: Seq[MergeAction], c: String,
                   default: Column): Column =
      actions.reverse.foldLeft(default) {
        case (acc, UpdateAction(cond, assigns, _)) =>
          when(condCol(cond), assigned(assigns, c, tCol(c))).otherwise(acc)
        case (acc, UpdateStarAction(cond)) =>
          when(condCol(cond), col(s"$sq.$c")).otherwise(acc)
        case (acc, InsertAction(cond, assigns)) =>
          when(condCol(cond), assigned(assigns, c, nullOf(c))).otherwise(acc)
        case (acc, InsertStarAction(cond)) =>
          when(condCol(cond), col(s"$sq.$c")).otherwise(acc)
        case (acc, _: DeleteAction) => acc // dropped via keep flag
      }

    val tE = coalesce(col("__t"), lit(false))
    val sE = coalesce(col("__s"), lit(false))
    val keep =
      when(tE && sE, keepChain(merge.matchedActions, lit(true)))
        .when(!tE && sE, keepChain(merge.notMatchedActions, lit(false)))
        .otherwise(keepChain(merge.notMatchedBySourceActions, lit(true)))
    def outCol(c: String): Column =
      when(tE && sE, valueChain(merge.matchedActions, c, tCol(c)))
        .when(!tE && sE, valueChain(merge.notMatchedActions, c, nullOf(c)))
        .otherwise(valueChain(merge.notMatchedBySourceActions, c, tCol(c)))
        .cast(schema(c).dataType).as(c)

    // MERGE-ON-READ arm (write.merge.mode=merge-on-read): commit only
    // the DELTA as equality-delete + append sidecars. A target row is
    // "touched" when MATCHED (conservatively — its action may rewrite
    // it unchanged) or when a NOT MATCHED BY SOURCE action's condition
    // fires; untouched rows — the overwhelming majority of a CDC merge
    // — are never read back or rewritten. One pass over the join
    // produces both the old rows (deletes) and the surviving outputs
    // (appends), materialized at O(delta), not O(table). Schema-
    // widening merges fall back to copy-on-write: a sidecar cannot
    // carry columns the base files lack.
    val morPath = GraftDml.morPath(spark, key, "merge")
      .filterNot(_ => mergeSchemaOn && hasStar && extraCols.nonEmpty)

    morPath match {
      case Some(p) =>
        val bySourceTouched = merge.notMatchedBySourceActions
          .map(a => condCol(a.condition)).reduceOption(_ || _)
          .getOrElse(lit(false))
        val touched =
          when(tE && sE, lit(true)).when(!tE && sE, lit(false))
            .otherwise(bySourceTouched)
        val cols = targetDf.columns.toSeq
        val delta = joined
          .filter((tE && touched) || (!tE && sE && keep))
          .select(cols.map(outCol) ++
            cols.map(c => tCol(c).as(s"__old_$c")) :+
            keep.as("__keep") :+ (tE && touched).as("__was"): _*)
          .localCheckpoint()
        val appends = delta.filter(col("__keep"))
          .select(cols.map(col): _*)
        val checked = GraftDml.checkConstraints(spark, key, appends)
        graft.pipeline.Snapshot.morCommit(spark, p,
          deletes = Some(GraftDml.equalityDeletes(spark, key,
            delta.filter(col("__was"))
              .select(cols.map(c => col(s"__old_$c").as(c)): _*))),
          appends = Some(checked),
          operation = "merge")
        GraftDml.maybeAutoCompact(spark, key, p)
        GraftDml.maybeRefreshStats(spark, key, p)
        GraftDml.maybeRefreshRollups(spark, p)
      case None =>
        val next = joined
          .select(targetDf.columns.toSeq.map(outCol) :+
            keep.as("__keep"): _*)
          .filter(col("__keep")).drop("__keep")
        // (the __t/__s/__tid markers are projected away by the select)
        GraftDml.commit(spark, key, next)
    }
    Seq.empty
  }

  private def targetNameParts(plan: LogicalPlan)
      : (Option[String], Seq[String]) = plan match {
    case SubqueryAlias(id, u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation) =>
      (Some(id.name), u.multipartIdentifier)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      (None, u.multipartIdentifier)
    case other => throw new IllegalArgumentException(
      s"unsupported MERGE target plan: ${other.nodeName}")
  }

  private def sourceAlias(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(id, _) => Some(id.name)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      Some(u.multipartIdentifier.last)
    case _ => None
  }

  private def nameOf(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case n: org.apache.spark.sql.catalyst.expressions.NamedExpression => n.name
    case other => other.sql
  }
}
