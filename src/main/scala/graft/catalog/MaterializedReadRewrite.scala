package graft.catalog

import graft.pipeline.{MaterializedTable, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.PlanBridge

/** Read path of the REBUILD-ONLY materialized views
  * ([[GraftCreateMaterializedTableCommand]]): a query subtree that is
  * `sameResult`-identical to a registered MV's defining plan is
  * replaced by a read of its materialized store — but ONLY while
  * every source snapshot the store pinned still sits at its pinned
  * version. A stale store never serves (the plan is left alone and
  * the late-bound view re-runs the defining query against the live
  * tables) — Trino's fresh-read surface with this engine's stronger
  * never-stale contract. Whole-plan matching is the honest tool for
  * this MV class: its defining queries are exactly the shapes the
  * aggregate-level rollup rewrite ([[RollupRewrite]]) cannot reason
  * about, so the unit of proof is the entire plan, compared through
  * Catalyst's canonicalizer (exprIds, aliases and subquery-alias
  * wrappers normalized away).
  *
  * Error-isolated and always-on like RollupRewrite; disable with
  * `spark.graft.rollup.rewrite.enabled = false` (one switch for both
  * MV read paths). */
case class MaterializedReadRewrite(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (session.conf.get("spark.graft.rollup.rewrite.enabled", "true")
          != "true") return plan
    // analyzing a defining plan below re-enters this rule — the
    // guard keeps the cached plan the DEFINING plan, not its own
    // rewrite into the store it is meant to recognize
    if (MaterializedReadRewrite.resolving.get()) return plan
    if (plan.isInstanceOf[Command]) return plan
    val targets = new TableStore(session)
      .tablesWithProperty("graft.mv.rebuild-only")
    if (targets.isEmpty) return plan
    val resolver = session.sessionState.analyzer.resolver
    val cands: Seq[(LogicalPlan, String)] = targets.flatMap { t =>
      // error isolation: a half-dropped MV or unparseable stored view
      // costs THIS target its rewrite, never the query's analysis
      try {
        val dir = t("graft.rollup.dir")
        if (!MaterializedTable.isFresh(dir)) None
        else definingPlanOf(t("graft.mv"), dir).map((_, dir))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    if (cands.isEmpty) return plan
    plan.transformUp {
      case p =>
        cands.collectFirst {
          case (d, dir) if p.sameResult(d) =>
            serveFromStore(p, dir)
        }.flatten.getOrElse(p)
    }
  }

  /** The store read, projected onto the matched subtree's OUTPUT
    * attributes (same names, exprIds, types — the rewrite must be
    * invisible to parent operators). None when the store's columns
    * no longer line up (schema drift: never serve). */
  private def serveFromStore(matched: LogicalPlan,
                             dir: String): Option[LogicalPlan] = {
    val resolver = session.sessionState.analyzer.resolver
    val store = Snapshot.read(session, MaterializedTable.tableDir(dir))
      .queryExecution.analyzed
    val projections = matched.output.map { a =>
      val sa = store.output.find(o => resolver(o.name, a.name))
        .getOrElse(return None)
      if (sa.dataType != a.dataType) return None
      Alias(sa, a.name)(exprId = a.exprId, qualifier = a.qualifier)
    }
    Some(Project(projections, store))
  }

  /** The ANALYZED defining plan of MV `qualified` — cached per
    * (store dir, source-version signature): a source commit changes
    * how its relations resolve (new sidecars), so the entry rebuilds
    * exactly when freshness flips anyway. */
  private def definingPlanOf(qualified: String,
                             dir: String): Option[LogicalPlan] = {
    val Array(ns, name) = qualified.split("\\.", 2)
    val m = MaterializedTable.meta(dir).getOrElse(return None)
    val sig = m.sources.map { case (p, v) =>
      s"$v:${Snapshot.morVersions(p).size}" }.mkString(",")
    val key = (dir, sig)
    MaterializedReadRewrite.planCache.get(key).orElse {
      val parsed = new TableStore(session).viewDefinition(ns, name)
        .map(_._1).getOrElse(return None)
      MaterializedReadRewrite.resolving.set(true)
      val analyzed =
        try PlanBridge.ofRows(session, parsed).queryExecution.analyzed
        finally MaterializedReadRewrite.resolving.set(false)
      MaterializedReadRewrite.planCache
        .filterInPlace((k, _) => k._1 != dir || k == key)
      // bound the cache across long create/drop-heavy sessions: a
      // dropped MV's entry is never consulted again (targets come
      // from the live catalog) but would otherwise pin its analyzed
      // plan forever
      if (MaterializedReadRewrite.planCache.size >= 64)
        MaterializedReadRewrite.planCache.clear()
      MaterializedReadRewrite.planCache.put(key, analyzed)
      Some(analyzed)
    }
  }
}

object MaterializedReadRewrite {
  private val resolving: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)
  /** (store dir, source-version signature) → analyzed defining plan. */
  private val planCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), LogicalPlan]
}
