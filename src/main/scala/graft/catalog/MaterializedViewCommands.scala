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
    // derivability gate) must leave the PREVIOUS MV serving — the
    // old store moves aside (one rename), the old catalog entries
    // are captured, and the catch below restores both
    var parked: Option[(String, String)] = None // (oldRuDir, parkDir)
    var restore: Option[() => Unit] = None
    if (exists && replace) {
      val oldProps = store.properties(ns, storageName)
      val oldView = store.viewDefinition(ns, name)
      store.dropView(ns, name)
      store.dropTable(ns, storageName)
      oldProps.get("graft.rollup.dir").foreach { oldRuDir =>
        val park = s"$oldRuDir.replaced"
        MaterializedViews.deleteDir(park)
        val op = java.nio.file.Paths.get(oldRuDir)
        if (java.nio.file.Files.exists(op)) {
          java.nio.file.Files.move(op, java.nio.file.Paths.get(park))
          parked = Some((oldRuDir, park))
        }
      }
      restore = Some(() => {
        parked.foreach { case (oldRuDir, park) =>
          MaterializedViews.deleteDir(oldRuDir)
          java.nio.file.Files.move(java.nio.file.Paths.get(park),
            java.nio.file.Paths.get(oldRuDir))
          store.registerSnapshot(ns, storageName,
            Rollup.tableDir(oldRuDir))
          store.setProperties(ns, storageName, oldProps)
        }
        // the view alone still serves (late-bound: reads fall back
        // to the base table when no fresh store exists)
        oldView.foreach { case (p, text) =>
          GraftCreateViewCommand(ns, name, p, allowExisting = false,
            replace = false, originalText = text).run(spark)
        }
      })
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
    // destroy) each other's store
    val ruDir = s"$srcPath.mv-$ns-$name"
    MaterializedViews.deleteDir(ruDir) // a dead MV's leftovers
    Rollup.build(spark, srcPath, ruDir, groupBy, measures, minMax, ndv,
      filter = where, dims = dims, exprCols = exprCols)
    try {
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
      if (!servesGold)
        throw new UnsupportedOperationException(
          s"the defining query of $ns.$name is not derivable from " +
            "the maintained store (reads would always fall back to " +
            "the base table). Derivable aggregates: count(*), " +
            "count(m), sum/avg over integral or ≤DECIMAL(27,6) " +
            "measures, the CAST(sum(CAST(m AS DECIMAL(27,6))) AS " +
            "DOUBLE) idiom, min/max — a raw sum(double)/avg(double) " +
            "is order-dependent and never rewritten")
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

case class GraftRefreshMaterializedViewCommand(ns: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("touched_groups", LongType)())

  override def run(spark: SparkSession): Seq[Row] = {
    val (ruDir, srcPath) = MaterializedViews.linkage(spark, ns, name)
    val n =
      try Rollup.refresh(spark, srcPath, ruDir)
      catch {
        // a window the incremental maintenance cannot price exactly
        // (equality deletes, copy-on-write rebases). REFRESH means
        // "bring the MV current", so fall back to the full recompute
        // — Trino's REFRESH is always this full rebuild; ours only
        // when the O(delta) path is impossible.
        case e: IllegalStateException
            if e.getMessage.contains("rebuild") ||
              e.getMessage.contains("position") =>
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
        Row(ns, name, srcPath, Rollup.isFresh(ruDir, srcPath))
      }
  }
}

private[catalog] object MaterializedViews {
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
