package graft.catalog

import graft.pipeline.Rollup
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.LongType

/** `CREATE / REFRESH / DROP MATERIALIZED VIEW` — the SQL surface over
  * the maintained-rollup + automatic-rewrite machinery
  * ([[graft.pipeline.Rollup]], [[RollupRewrite]]), shaped after
  * Trino/Iceberg materialized views (the reference fabric's MV
  * feature; the reference itself rebuilds derived tables from scratch,
  * `/root/reference/jobs/build_orders_silver.py`):
  *
  *  - CREATE parses the defining aggregate into a rollup spec, builds
  *    the gold store once, registers it as the hidden
  *    `<name>__storage` table (carrying the `graft.rollup.*` linkage
  *    the rewrite rule discovers), and binds `<name>` itself as a
  *    LATE-BOUND VIEW of the defining query. Reading the MV therefore
  *    re-plans the original aggregate — which the rewrite serves from
  *    the gold store while it is FRESH and from the base table when
  *    stale. Unlike Trino (which serves stale MV data until the next
  *    refresh), a stale MV here is never wrong, only slower.
  *  - REFRESH applies the source's commit window at O(delta)
  *    ([[Rollup.refresh]]) and returns the touched-group count.
  *  - DROP removes the view, the storage registration, and the rollup
  *    directory (the store is derived data owned by the MV).
  *
  * CREATE validates derivability END-TO-END: after the build it plans
  * the defining query and requires the optimizer to have re-targeted
  * the gold store — a query with a non-derivable aggregate (e.g. a raw
  * `sum(double)`, order-dependent) fails CREATE with guidance instead
  * of silently registering an MV that every read would bypass.
  */
case class GraftCreateMaterializedViewCommand(
    ns: String, name: String, srcNs: String, srcTable: String,
    groupBy: Seq[String], measures: Seq[String], minMax: Seq[String],
    ndv: Seq[String], where: Option[String], query: LogicalPlan,
    queryText: String, replace: Boolean, ifNotExists: Boolean,
    joins: Seq[(String, String, Seq[(String, String)])] = Nil,
    exprCols: Seq[(String, String)] = Nil)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  private def storageName = s"${name}__storage"

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    // the MV name is a view (registry) and its storage a snapshot
    // table (snapshotPaths) — existence must probe both stores
    val exists = store.tableExists(ns, name) ||
      store.snapshotPath(ns, name).isDefined
    val isMv = store.snapshotPath(ns, storageName).isDefined &&
      store.properties(ns, storageName).contains("graft.mv")
    if (exists && ifNotExists && !replace) return Seq.empty
    if (exists && !replace)
      throw new IllegalStateException(
        s"materialized view (or table) already exists: $ns.$name")
    if (exists && replace && !isMv)
      throw new UnsupportedOperationException(
        s"$ns.$name exists and is not a materialized view — " +
          "CREATE OR REPLACE MATERIALIZED VIEW only replaces its own")
    val srcPath = store.snapshotPath(srcNs, srcTable).getOrElse(
      throw new IllegalArgumentException(
        s"materialized views maintain over snapshot tables; " +
          s"$srcNs.$srcTable is not one"))
    // OR REPLACE parks the old MV instead of destroying it: a failed
    // replacement (e.g. the new defining query flunks the
    // derivability gate AND the rebuild-only fallback) must leave
    // the PREVIOUS MV serving — the old store moves aside (one
    // rename), the old catalog entries are captured, and the catch
    // below restores both
    var parked: Option[(String, String)] = None // (oldRuDir, parkDir)
    var restore: Option[() => Unit] = None
    if (exists && replace) {
      val (pk, rs) = MaterializedViews.parkForReplace(
        spark, store, ns, name, storageName)
      parked = pk; restore = Some(rs)
    }
    // each JOINed dimension resolves to its snapshot path, and the
    // raw `ON a = b` pairs ORIENT against the actual schemas (the
    // parser cannot know which side of the equality is the fact —
    // the left side grows as dims chain, the DataFrame-join shape)
    var leftCols = graft.pipeline.Snapshot.read(spark, srcPath)
      .columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val dims = joins.map { case (dns, dt, rawKeys) =>
      val dimPath = store.snapshotPath(dns, dt).getOrElse(
        throw new IllegalArgumentException(
          s"materialized views join snapshot tables; $dns.$dt is " +
            "not one"))
      val dimCols = graft.pipeline.Snapshot.read(spark, dimPath)
        .columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val keys = rawKeys.map { case (a, b) =>
        val (al, bl) = (a.toLowerCase(java.util.Locale.ROOT),
          b.toLowerCase(java.util.Locale.ROOT))
        if (leftCols.contains(al) && dimCols.contains(bl)) (a, b)
        else if (leftCols.contains(bl) && dimCols.contains(al)) (b, a)
        else throw new IllegalArgumentException(
          s"join condition $a = $b does not pair a fact-side column " +
            s"with a $dns.$dt column")
      }
      leftCols ++= dimCols
      Rollup.DimSpec(dimPath, keys)
    }
    // the rollup dir is NAMESPACE-scoped: two same-named MVs in
    // different namespaces over one source must not share (and
    // destroy) each other's store. Each part percent-escapes '-'
    // (and '%') so the joining '-' never collides with one inside an
    // identifier: a bare `mv-$ns-$name` maps ns "a-b"/name "c" and
    // ns "a"/name "b-c" to the SAME dir and the second CREATE
    // destroys the first's store
    val ruDir = s"$srcPath.mv-${MaterializedViews.encodePart(ns)}-" +
      MaterializedViews.encodePart(name)
    MaterializedViews.deleteDir(ruDir) // a dead MV's leftovers
    try {
      // INSIDE the try: a failing build (e.g. a nonexistent measure
      // column surfacing as an analysis error) must run the same
      // cleanup-and-restore as a failing gate — OR REPLACE parked
      // the old MV above and a bare throw would strand it
      Rollup.build(spark, srcPath, ruDir, groupBy, measures, minMax,
        ndv, filter = where, dims = dims, exprCols = exprCols)
      store.registerSnapshot(ns, storageName, Rollup.tableDir(ruDir))
      store.setProperties(ns, storageName, Map(
        "graft.rollup.dir" -> ruDir,
        "graft.rollup.source" -> srcPath,
        "graft.mv" -> s"$ns.$name"))
      // derivability gate: the freshly-built store must serve the
      // defining query via the rewrite, or the MV is an expensive no-op
      val planned = PlanBridge.ofRows(spark, query)
        .queryExecution.optimizedPlan
      val servesGold = planned.collectLeaves().exists {
        case l: LogicalRelation => l.relation match {
          case f: HadoopFsRelation =>
            f.location.rootPaths.map(_.toUri.getPath).exists(p =>
              p == ruDir || p.startsWith(s"$ruDir/"))
          case _ => false
        }
        case _ => false
      }
      if (!servesGold) {
        // Trino parity: a defining query that parses into the rollup
        // shape but is not EXACTLY derivable (e.g. a raw sum(double)
        // — order-dependent) still materializes, as a clearly-marked
        // REBUILD-ONLY MV: tear down the incremental store and
        // delegate; REFRESH will fully recompute (Trino's own
        // semantics), reads stay fresh-serves-store / stale-falls-back
        store.dropTable(ns, storageName)
        MaterializedViews.deleteDir(ruDir)
        GraftCreateMaterializedTableCommand(ns, name, query, queryText,
          replace = false, ifNotExists = false).run(spark)
        parked.foreach { case (_, park) =>
          MaterializedViews.deleteDir(park) }
        return Seq.empty
      }
      GraftCreateViewCommand(ns, name, query,
        allowExisting = false, replace = false,
        originalText = Some(queryText)).run(spark)
      // the replacement is live — discard the parked predecessor
      parked.foreach { case (_, park) =>
        MaterializedViews.deleteDir(park) }
    } catch {
      case t: Throwable =>
        store.dropTable(ns, storageName)
        MaterializedViews.deleteDir(ruDir)
        try restore.foreach(_())
        catch { case scala.util.control.NonFatal(_) => () }
        throw t
    }
    Seq.empty
  }
}

/** REBUILD-ONLY materialized view — the Trino-parity fallback for
  * defining queries the rollup machinery cannot maintain (HAVING,
  * DISTINCT, outer joins, window functions, raw double sums, …;
  * Trino accepts any defining query, `docker-compose.yml:114`).
  * CREATE materializes the result ONCE with every source snapshot
  * version pinned ([[graft.pipeline.MaterializedTable]]); REFRESH
  * fully recomputes (Trino's own semantics — there is no exact
  * incremental path for this class, that is what MAKES it this
  * class); reads serve the store only while every pin matches the
  * live version ([[MaterializedReadRewrite]]) and fall back to the
  * base plan otherwise — never stale-served. */
case class GraftCreateMaterializedTableCommand(
    ns: String, name: String, query: LogicalPlan, queryText: String,
    replace: Boolean, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  private def storageName = s"${name}__storage"

  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    val exists = store.tableExists(ns, name) ||
      store.snapshotPath(ns, name).isDefined
    val isMv = store.snapshotPath(ns, storageName).isDefined &&
      store.properties(ns, storageName).contains("graft.mv")
    if (exists && ifNotExists && !replace) return Seq.empty
    if (exists && !replace)
      throw new IllegalStateException(
        s"materialized view (or table) already exists: $ns.$name")
    if (exists && replace && !isMv)
      throw new UnsupportedOperationException(
        s"$ns.$name exists and is not a materialized view — " +
          "CREATE OR REPLACE MATERIALIZED VIEW only replaces its own")
    var parked: Option[(String, String)] = None
    var restore: Option[() => Unit] = None
    if (exists && replace) {
      val (pk, rs) = MaterializedViews.parkForReplace(
        spark, store, ns, name, storageName)
      parked = pk; restore = Some(rs)
    }
    val srcPaths = MaterializedViews.sourcePaths(spark, query, ns, name)
    val dir = s"${srcPaths.head}.mv-" +
      s"${MaterializedViews.encodePart(ns)}-" +
      MaterializedViews.encodePart(name)
    MaterializedViews.deleteDir(dir)
    try {
      graft.pipeline.MaterializedTable.materialize(spark, dir,
        PlanBridge.ofRows(spark, query).toDF(), srcPaths)
      store.registerSnapshot(ns, storageName,
        graft.pipeline.MaterializedTable.tableDir(dir))
      store.setProperties(ns, storageName, Map(
        "graft.rollup.dir" -> dir,
        "graft.rollup.source" -> srcPaths.head,
        "graft.mv.rebuild-only" -> "true",
        "graft.mv" -> s"$ns.$name"))
      GraftCreateViewCommand(ns, name, query,
        allowExisting = false, replace = false,
        originalText = Some(queryText)).run(spark)
      parked.foreach { case (_, park) =>
        MaterializedViews.deleteDir(park) }
    } catch {
      case t: Throwable =>
        store.dropTable(ns, storageName)
        MaterializedViews.deleteDir(dir)
        try restore.foreach(_())
        catch { case scala.util.control.NonFatal(_) => () }
        throw t
    }
    Seq.empty
  }
}

case class GraftRefreshMaterializedViewCommand(ns: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("touched_groups", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (ruDir, srcPath) = MaterializedViews.linkage(spark, ns, name)
    // a REBUILD-ONLY MV has no incremental path by definition —
    // REFRESH is the full recompute of its stored defining query
    // (skipped when every source pin still matches the live version)
    val MT = graft.pipeline.MaterializedTable
    if (MT.meta(ruDir).isDefined) {
      if (MT.isFresh(ruDir)) return Seq(Row(0L))
      val store = new TableStore(spark)
      val plan = store.viewDefinition(ns, name).map(_._1).getOrElse(
        throw new IllegalStateException(
          s"rebuild-only MV $ns.$name lost its view definition — " +
            "DROP and re-CREATE it"))
      val n0 = MT.materialize(spark, ruDir,
        PlanBridge.ofRows(spark, plan).toDF(),
        MaterializedViews.sourcePaths(spark, plan, ns, name))
      return Seq(Row(n0))
    }
    val n =
      try Rollup.refresh(spark, srcPath, ruDir)
      catch {
        // a window the incremental maintenance cannot price exactly
        // (equality deletes without identifier coverage, copy-on-write
        // rebases, pruned as-of versions). REFRESH means "bring the MV
        // current", so fall back to the full recompute — Trino's
        // REFRESH is always this full rebuild; ours only when the
        // O(delta) path is impossible. Typed dispatch: every
        // window-pricing path throws UnpriceableWindowException.
        case e: graft.pipeline.UnpriceableWindowException =>
          val m = Rollup.meta(ruDir).getOrElse(throw e)
          // a JOIN MV with an unpriceable DIM window (equality
          // deletes, rebase, pruned as-of version) lands here too —
          // the rebuild re-pins every dim at its NEW live version
          Rollup.build(spark, srcPath, ruDir, m.groupCols,
            m.measures, m.minMax, m.ndv, m.ndvK, m.filter, m.dims,
            m.exprCols)
      }
    Seq(Row(n))
  }
}

case class GraftDropMaterializedViewCommand(ns: String, name: String,
                                            ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    if (store.snapshotPath(ns, s"${name}__storage").isEmpty ||
        !store.properties(ns, s"${name}__storage").contains("graft.mv")) {
      if (ifExists) return Seq.empty
      throw new java.util.NoSuchElementException(
        s"no such materialized view: $ns.$name")
    }
    val (ruDir, _) = MaterializedViews.linkage(spark, ns, name)
    store.dropView(ns, name)
    store.dropTable(ns, s"${name}__storage")
    MaterializedViews.deleteDir(ruDir)
    Seq.empty
  }
}

/** `SHOW MATERIALIZED VIEWS [IN <ns>]` — one row per MV with its
  * source table and freshness (is the store current with the live
  * source version — i.e. will reads serve from gold right now). */
case class GraftShowMaterializedViewsCommand(nsFilter: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", org.apache.spark.sql.types.StringType)(),
    AttributeReference("name", org.apache.spark.sql.types.StringType)(),
    AttributeReference("source", org.apache.spark.sql.types.StringType)(),
    AttributeReference("is_fresh", org.apache.spark.sql.types.BooleanType)())

  override def run(spark: SparkSession): Seq[Row] = {
    new TableStore(spark).tablesWithProperty("graft.mv")
      .map(_( "graft.mv"))
      .distinct.sorted
      .map { qualified =>
        val Array(ns, name) = qualified.split("\\.", 2)
        (ns, name)
      }
      .filter { case (ns, _) => nsFilter.forall(_ == ns) }
      .map { case (ns, name) =>
        val (ruDir, srcPath) = MaterializedViews.linkage(spark, ns, name)
        val fresh =
          if (graft.pipeline.MaterializedTable.meta(ruDir).isDefined)
            graft.pipeline.MaterializedTable.isFresh(ruDir)
          else Rollup.isFresh(ruDir, srcPath)
        Row(ns, name, srcPath, fresh)
      }
  }
}

private[catalog] object MaterializedViews {
  /** OR REPLACE's park step, shared by both MV kinds: capture the
    * old catalog entries, drop them, move the old store dir aside
    * (one rename), and return (parked dirs, restore thunk). The
    * restore re-registers WHICHEVER kind was parked — the storage
    * path is re-derived from the parked dir's own layout (both kinds
    * store their snapshot under `<dir>/table`). */
  def parkForReplace(spark: SparkSession, store: TableStore,
                     ns: String, name: String, storageName: String)
      : (Option[(String, String)], () => Unit) = {
    val oldProps = store.properties(ns, storageName)
    val oldView = store.viewDefinition(ns, name)
    store.dropView(ns, name)
    store.dropTable(ns, storageName)
    var parked: Option[(String, String)] = None
    oldProps.get("graft.rollup.dir").foreach { oldRuDir =>
      val park = s"$oldRuDir.replaced"
      deleteDir(park)
      val op = java.nio.file.Paths.get(oldRuDir)
      if (java.nio.file.Files.exists(op)) {
        java.nio.file.Files.move(op, java.nio.file.Paths.get(park))
        parked = Some((oldRuDir, park))
      }
    }
    val restore = () => {
      parked.foreach { case (oldRuDir, park) =>
        deleteDir(oldRuDir)
        java.nio.file.Files.move(java.nio.file.Paths.get(park),
          java.nio.file.Paths.get(oldRuDir))
        store.registerSnapshot(ns, storageName, s"$oldRuDir/table")
        store.setProperties(ns, storageName, oldProps)
      }
      // the view alone still serves (late-bound: reads fall back
      // to the base table when no fresh store exists)
      oldView.foreach { case (p, text) =>
        GraftCreateViewCommand(ns, name, p, allowExisting = false,
          replace = false, originalText = text).run(spark)
      }
    }
    (parked, restore)
  }

  /** Every snapshot-table path a defining query reads (subqueries
    * included) — the freshness pins of a rebuild-only MV. Raises
    * when a relation is not a registered snapshot table: without a
    * versioned source there is no freshness gate, and serving
    * possibly-stale data would break the engine's never-wrong read
    * contract. */
  def sourcePaths(spark: SparkSession, query: LogicalPlan,
                  ns: String, name: String): Seq[String] = {
    val store = new TableStore(spark)
    val rels = (query +: query.subqueriesAll).flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        u.multipartIdentifier
    })
    if (rels.isEmpty) throw new UnsupportedOperationException(
      s"CREATE MATERIALIZED VIEW $ns.$name: the defining query reads " +
        "no table — nothing to pin a freshness gate to")
    rels.map { parts =>
      val (rns, rt) = parts.map(_.toLowerCase(java.util.Locale.ROOT)) match {
        case Seq(cat, n, t) if GraftCatalogs.isGraft(cat) => (n, t)
        case Seq(n, t) => (n, t)
        case other => throw new UnsupportedOperationException(
          s"CREATE MATERIALIZED VIEW $ns.$name: qualify every table " +
            s"as <ns>.<table> (got: ${other.mkString(".")})")
      }
      store.snapshotPath(rns, rt).getOrElse(
        throw new UnsupportedOperationException(
          s"CREATE MATERIALIZED VIEW $ns.$name: rebuild-only " +
            s"materialized views need versioned snapshot sources " +
            s"for the freshness gate; $rns.$rt is not one"))
    }.distinct
  }

  /** Injective dir-name encoding of one identifier part: '%' and '-'
    * percent-escape, so the encoded part never contains a bare '-'
    * and the `mv-<ns>-<name>` separators are unambiguous. Existing
    * MVs are untouched — the dir is resolved through the recorded
    * `graft.rollup.dir` property, never re-derived. */
  def encodePart(s: String): String =
    s.replace("%", "%25").replace("-", "%2D")

  /** The (rollup dir, source path) an MV's storage table records. */
  def linkage(spark: SparkSession, ns: String,
              name: String): (String, String) = {
    val store = new TableStore(spark)
    val props =
      if (store.snapshotPath(ns, s"${name}__storage").isDefined)
        store.properties(ns, s"${name}__storage")
      else Map.empty[String, String]
    if (!props.contains("graft.mv"))
      throw new java.util.NoSuchElementException(
        s"no such materialized view: $ns.$name")
    (props("graft.rollup.dir"), props("graft.rollup.source"))
  }

  def deleteDir(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      val paths =
        try walk.iterator().asScala.toSeq
        finally walk.close()
      paths.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
