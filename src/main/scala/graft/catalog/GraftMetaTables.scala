package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}

/** Iceberg-style METADATA TABLES over a snapshot-backed registration —
  * the read half of the maintenance surface ([[GraftCallCommand]] is
  * the write half). Iceberg spells these exactly this way
  * (`SELECT * FROM db.t.history`):
  *
  *  - `ns.t.history` — one row per retained version:
  *    (version, is_current)
  *  - `ns.t.snapshots` — adds record_count, as a LAZY per-version
  *    count plan unioned over the retained versions (bounded by the
  *    retention limit), not a driver-side action
  *
  * The `iceberg.`/`demo.` prefix works too (4-part). Resolution happens
  * at PARSE time ([[GraftSqlParser]]) for the same reason the catalog
  * prefix is stripped there: Spark's built-in relation resolver throws
  * `REQUIRES_SINGLE_PART_NAMESPACE` on an unknown 3-part name before
  * any analyzer extension could claim it. A `spark.sql` statement is
  * parsed immediately before it runs, so the snapshot state read here
  * is current (same currency argument as bare-name SHOW TABLES). */
object GraftMetaTables {

  def lookup(session: SparkSession,
             parts: Seq[String]): Option[LogicalPlan] = {
    import org.apache.spark.sql.functions._
    val norm = parts.map(_.toLowerCase(java.util.Locale.ROOT))
    val target = norm match {
      case Seq(cat, ns, t, m) if GraftCatalogs.isGraft(cat) =>
        Some((Seq(ns, t), m))
      case Seq(ns, t, m) => Some((Seq(ns, t), m))
      case _ => None
    }
    target.filter(t => t._2 == "history" || t._2 == "snapshots")
      .flatMap { case (key, meta) =>
        TableStore.state(session).snapshotPaths.get(key).map { path =>
          val live = graft.pipeline.Snapshot.currentVersion(path)
          val versions =
            (graft.pipeline.Snapshot.historicalVersions(path) ++ live)
              .sorted
          val rows = versions.map { v =>
            val base = if (meta == "history")
              session.range(1).select()
            else graft.pipeline.Snapshot.readAsOf(session, path, v)
              .agg(count(lit(1)).as("record_count"))
            base.select(
              Seq(lit(v).as("version"),
                lit(live.contains(v)).as("is_current")) ++
                (if (meta == "history") Nil
                 else Seq(col("record_count"))): _*)
          }
          SubqueryAlias(parts.last,
            rows.reduce(_ unionAll _).queryExecution.analyzed)
        }
      }
  }
}
