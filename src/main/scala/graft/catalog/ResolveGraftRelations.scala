package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer rule resolving namespace-qualified relations against the
  * session's [[TableStore]] registry, so reference SQL like
  * `SELECT ... FROM silver.orders_current_priv`
  * (`/root/reference/README.md:121`) runs verbatim through `spark.sql`.
  *
  * Resolution contract:
  *  - `ns.table` (2-part) resolves iff registered;
  *  - `iceberg.ns.table` (3-part, the reference's catalog prefix)
  *    resolves to the same entry — a user porting reference SQL keeps
  *    the `iceberg.` prefix and it still works;
  *  - anything else is left untouched for Spark's own resolvers
  *    (temp views, in-memory session catalog, file sources).
  *
  * Runs as an `extendedResolutionRule`, i.e. inside the analyzer's
  * Resolution fixed-point AFTER the built-in `ResolveRelations` — Spark
  * leaves an unknown `UnresolvedRelation` in place rather than failing
  * (failure is deferred to CheckAnalysis), which is exactly the hook
  * point lakehouse catalog extensions use. The registered entry is the
  * DataFrame's ANALYZED plan: like the reference's Trino view
  * (`README.md:106-116`) the masking projection re-evaluates at query
  * time, nothing is materialized by registration.
  */
case class ResolveGraftRelations(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      // Iceberg's time-travel SQL verbatim: `FROM ns.t VERSION AS OF n`
      // over a snapshot-backed registration (TableStore.registerSnapshot)
      // reads the retained versioned snapshot dir. RelationTimeTravel is
      // a LEAF — the inner UnresolvedRelation is a field, not a child —
      // so it is matched here before the bare-relation case can see it.
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        (tt.relation, tt.version) match {
          case (u: UnresolvedRelation, Some(v)) =>
            // numeric → version id; non-numeric string → ref: TAG
            // first, then staged BRANCH (`VERSION AS OF 'nightly'` /
            // the audit read of a WAP branch) — Iceberg's ref travel
            snapshotKey(u.multipartIdentifier).map { path =>
              val df = v.toLongOption match {
                case Some(ver) =>
                  graft.pipeline.Snapshot.readAsOf(session, path, ver)
                case None if graft.pipeline.Snapshot.tags(path)
                    .contains(v) =>
                  graft.pipeline.Snapshot.readAsOfTag(session, path, v)
                case None if graft.pipeline.Snapshot.branches(path)
                    .contains(v) =>
                  graft.pipeline.Snapshot.readBranch(session, path, v)
                case None =>
                  throw new java.util.NoSuchElementException(
                    s"no such ref (tag or branch): '$v' at $path (" +
                      s"tags=${graft.pipeline.Snapshot.tags(path)
                        .keys.toSeq.sorted.mkString(",")}; " +
                      s"branches=${graft.pipeline.Snapshot
                        .branches(path).mkString(",")})")
              }
              SubqueryAlias(u.multipartIdentifier.last,
                df.queryExecution.analyzed): LogicalPlan
            }.getOrElse(tt)
          // `FOR TIMESTAMP AS OF '<ts>'` — Iceberg's second travel
          // form: the snapshot CURRENT at that instant. The expression
          // is folded through a Cast to TimestampType (string literals
          // and timestamp expressions both land here; session TZ
          // applies, matching Spark's own time-travel evaluation).
          case (u: UnresolvedRelation, None)
              if tt.timestamp.exists(e => e.resolved && e.foldable) =>
            snapshotKey(u.multipartIdentifier).map { path =>
              import org.apache.spark.sql.catalyst.expressions.Cast
              import org.apache.spark.sql.types.TimestampType
              val cast = Cast(tt.timestamp.get, TimestampType,
                Some(session.sessionState.conf.sessionLocalTimeZone))
              val micros = cast.eval(null)
              if (micros == null)
                throw new IllegalArgumentException(
                  s"invalid TIMESTAMP AS OF value: ${tt.timestamp.get.sql}")
              SubqueryAlias(u.multipartIdentifier.last,
                graft.pipeline.Snapshot.readAsOfTimestamp(session, path,
                  micros.asInstanceOf[Long])
                  .queryExecution.analyzed): LogicalPlan
            }.getOrElse(tt)
          case _ => tt
        }
      case u: UnresolvedRelation =>
        lookup(u.multipartIdentifier).getOrElse(u)
    }

  private def normKey(parts: Seq[String]): Option[Seq[String]] = {
    val norm = parts.map(_.toLowerCase(java.util.Locale.ROOT))
    norm match {
      case Seq("iceberg", ns, t) => Some(Seq(ns, t))
      case Seq("demo", ns, t)    => Some(Seq(ns, t))
      case Seq(_, _) => Some(norm)
      case _ => None
    }
  }

  /** Live snapshot dir for a snapshot-backed name. */
  private def snapshotKey(parts: Seq[String]): Option[String] =
    normKey(parts)
      .flatMap(TableStore.state(session).snapshotPaths.get)

  private def lookup(parts: Seq[String]): Option[LogicalPlan] = {
    val st = TableStore.state(session)
    normKey(parts).flatMap { k =>
      // SQL-created views are LATE-BINDING: inline the stored
      // unresolved view query and let this same fixed-point resolve its
      // base relations against the registry's CURRENT state — a MERGE
      // that replaced the base table is visible through the view, like
      // the reference's Trino view (a stored query, not a snapshot).
      st.viewPlans.get(k)
        .map(p => SubqueryAlias(parts.last, p): LogicalPlan)
        .orElse(st.registry.get(k)
          .map(df => SubqueryAlias(parts.last, df.queryExecution.analyzed)))
        // snapshot-backed tables also read LIVE by bare name (the
        // latest version, re-read at each query) — or the staged WAP
        // branch when the session pins one (spark.wap.branch) and it
        // has staged state, Iceberg's write-audit-publish read mode.
        // A LIVE read additionally carries any CURRENT ANALYZE stats
        // on its base scan (GraftStats.attach) so size estimates —
        // and hence broadcast decisions — follow the measured table,
        // not the raw file bytes.
        .orElse(st.snapshotPaths.get(k)
          .map { path =>
            val plan = GraftDml.snapshotRead(session, path)
              .queryExecution.analyzed
            // attach resolves the serving scope itself: live stats on
            // live reads, BRANCH-scoped stats (token-gated) on staged
            // WAP-branch reads — never crossed
            val withStats =
              GraftStats.attach(session, k.head, k(1), path, plan)
            SubqueryAlias(parts.last, withStats)
          })
    }
  }
}
