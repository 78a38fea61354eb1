package graft.catalog

import graft.pipeline.{MaterializedTable, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
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
  * Always-on cost discipline: the rule runs on EVERY analysis, so the
  * per-call filesystem work is one directory listing per MV source
  * ([[Snapshot.versionState]] — freshness check and plan-cache
  * signature share it) plus an mtime-validated meta-sidecar cache;
  * the catalog listing itself is an in-memory property scan. Analyzed
  * defining plans are LRU-cached per (store, signature) and evicted
  * PER ENTRY — a create/drop-heavy session must not dump hot plans
  * wholesale.
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
    val cands: Seq[(LogicalPlan, String)] = targets.flatMap { t =>
      // error isolation: a half-dropped MV or unparseable stored view
      // costs THIS target its rewrite, never the query's analysis
      try {
        val dir = t("graft.rollup.dir")
        MaterializedReadRewrite.metaCached(dir).flatMap { m =>
          // ONE listing per source, feeding both the freshness gate
          // and the cache signature (a source commit changes how its
          // relations resolve — new sidecars — so the cached plan
          // rebuilds exactly when freshness flips anyway)
          val states = m.sources.map { case (p, v) =>
            (v, Snapshot.versionState(p)) }
          val fresh = states.forall { case (v, (cur, _)) =>
            cur.contains(v) }
          if (!fresh) None
          else {
            val sig = states.map { case (v, (_, n)) => s"$v:$n" }
              .mkString(",")
            definingPlanOf(t("graft.mv"), dir, sig).map((_, dir))
          }
        }
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

  /** The ANALYZED defining plan of MV `qualified` at cache key
    * (store dir, `sig` — the caller's source-version signature). */
  private def definingPlanOf(qualified: String, dir: String,
                             sig: String): Option[LogicalPlan] = {
    val Array(ns, name) = qualified.split("\\.", 2)
    val key = (dir, sig)
    MaterializedReadRewrite.cacheGet(key).orElse {
      val parsed = new TableStore(session).viewDefinition(ns, name)
        .map(_._1).getOrElse(return None)
      MaterializedReadRewrite.resolving.set(true)
      val analyzed =
        try PlanBridge.ofRows(session, parsed).queryExecution.analyzed
        finally MaterializedReadRewrite.resolving.set(false)
      MaterializedReadRewrite.cachePut(key, analyzed)
      Some(analyzed)
    }
  }
}

object MaterializedReadRewrite {
  private val resolving: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** (store dir, source-version signature) → analyzed defining plan.
    * Access-ordered LRU, bounded at 64: eviction drops the COLDEST
    * entry, never the whole cache (a create/drop-heavy session keeps
    * its hot defining plans). Superseded signatures of the same dir
    * are dropped eagerly on insert — they can never be consulted
    * again (the signature only moves forward with commits). */
  private val planCache =
    new java.util.LinkedHashMap[(String, String), LogicalPlan](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), LogicalPlan]): Boolean =
        size() > 64
    }

  private def cacheGet(key: (String, String)): Option[LogicalPlan] =
    planCache.synchronized(Option(planCache.get(key)))

  private def cachePut(key: (String, String), p: LogicalPlan): Unit =
    planCache.synchronized {
      val it = planCache.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (k._1 == key._1 && k != key) it.remove()
      }
      planCache.put(key, p)
    }

  /** [[MaterializedTable.meta]] validated by the sidecar's
    * (mtime, size) plus a short wall-clock TTL — the always-on rule
    * re-reads the file only when a rebuild actually rewrote it. The
    * TTL bounds the coarse-timestamp edge: on a second-granularity
    * filesystem a rebuild landing in the SAME tick as the cached read
    * (with the same byte length) would otherwise serve the old pinned
    * versions forever; with the TTL it costs at most a few seconds of
    * not-serving (the freshness gate fails safe — base reads, never
    * wrong results) before the re-read picks up the new pins. */
  private val metaCache = scala.collection.concurrent.TrieMap
    .empty[String, (java.nio.file.attribute.FileTime, Long, Long,
      MaterializedTable.Meta)]

  private val MetaTtlNanos = 5L * 1000 * 1000 * 1000

  private def metaCached(dir: String): Option[MaterializedTable.Meta] = {
    val f = java.nio.file.Paths.get(dir, "_mt_meta")
    if (!java.nio.file.Files.exists(f)) { metaCache.remove(dir); None }
    else {
      val mtime = java.nio.file.Files.getLastModifiedTime(f)
      val size = java.nio.file.Files.size(f)
      val now = System.nanoTime()
      metaCache.get(dir) match {
        case Some((t, sz, at, m))
            if t == mtime && sz == size && now - at < MetaTtlNanos =>
          Some(m)
        case _ =>
          val m = MaterializedTable.meta(dir)
          m.foreach(v => metaCache.put(dir, (mtime, size, now, v)))
          m
      }
    }
  }
}
