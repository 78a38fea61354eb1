package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** `ANALYZE TABLE <t> COMPUTE STATISTICS [NOSCAN | FOR COLUMNS c, … |
  * FOR ALL COLUMNS]` — verbatim for graft targets, the statement an
  * Iceberg/Spark operator runs before big joins. Persists:
  *
  *  - `graft.stats.rowCount` — exact live row count (skipped by
  *    NOSCAN, Spark's own contract)
  *  - `graft.stats.sizeInBytes` — the LIVE data footprint. On a
  *    sidecar-laden merge-on-read table the raw file bytes OVERSTATE
  *    the live state (deleted rows still sit in the base files), so
  *    the byte total is scaled by liveRows/fileRows — this is exactly
  *    the case where Spark's default file-size estimate gets the
  *    broadcast decision wrong (AnalyzeSpec pins it)
  *  - `graft.stats.snapshotVersion` — the version the stats describe;
  *    reads attach them ONLY while that version is live (stale stats
  *    never steer a plan)
  *  - `graft.stats.col.<c>.{nulls,ndv,min,max,avgLen}` — X6b's
  *    column statistics ([[graft.quality.Metrics.columnStats]]: one
  *    scan-side stack + one KMV pass, engine-recomputable)
  *
  * [[GraftStats.attach]] folds the persisted stats into the resolved
  * plan as [[CatalogStatistics]] on the base scan's
  * [[LogicalRelation]] — the same slot a metastore table's ANALYZE
  * output occupies — so `sizeInBytes` feeds join-size decisions
  * unconditionally and the column stats feed CBO when
  * `spark.sql.cbo.enabled` is on. `DESCRIBE EXTENDED` surfaces a
  * `Statistics` row (Spark's own shape).
  */
case class GraftAnalyzeCommand(ns: String, name: String,
                               columns: Seq[String], allColumns: Boolean,
                               noScan: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val store = new TableStore(spark)
    // registry-first, the DML-gate resolution order
    val frame = TableStore.registry(spark).get(Seq(ns, name))
      .orElse(store.snapshotPath(ns, name)
        .map(p => GraftDml.snapshotRead(spark, p)))
      .getOrElse(store.table(ns, name))
    val snapPath =
      if (TableStore.registry(spark).contains(Seq(ns, name))) None
      else store.snapshotPath(ns, name)
    // a WAP session pins reads to the staged branch — ANALYZE there
    // records BRANCH-SCOPED stats (rows, bytes, column stats, all
    // measured against the staged dir and gated on its staging token),
    // so branch reads get steered while live reads keep serving the
    // live stats; fast_forward PROMOTES the branch stats with the
    // publish (the content becomes live verbatim). When nothing is
    // staged yet, reads are live and this is a plain live ANALYZE.
    val wapScope = GraftDml.wapBranch(spark).flatMap { b =>
      snapPath.filter(p =>
        graft.pipeline.Snapshot.branches(p).contains(b)).map(p => (b, p))
    }
    wapScope.foreach { case (b, p) =>
      return runBranchScoped(spark, store, frame, b, p)
    }
    val cols = resolveCols(frame)
    val props = scala.collection.mutable.LinkedHashMap[String, String]()
    // capture the version BEFORE any measurement job: a commit landing
    // mid-ANALYZE would otherwise get the OLD measurements stamped
    // with the NEW version — stale stats served as current, the exact
    // mode the version gate exists to prevent. Stamped with the
    // pre-measure version, such a race self-resolves: the gate sees
    // recorded ≠ live and serves nothing.
    val liveVersion = snapPath
      .flatMap(graft.pipeline.Snapshot.currentVersion).map(_.toString)
    val fileStats = snapPath.map(graft.pipeline.Snapshot.dataFileStats)
    if (noScan) {
      // NOSCAN records size only (Spark's contract) — raw file bytes,
      // no job runs
      fileStats.foreach { case (bytes, _) =>
        props += GraftStats.SizeKey -> bytes.toString }
    } else {
      val rowCount = frame.count()
      props += GraftStats.RowsKey -> rowCount.toString
      val size = (fileStats, snapPath) match {
        case (Some((bytes, fileRows)), _) if fileRows > 0 =>
          // live fraction of the on-disk bytes (MOR-aware; equals the
          // raw bytes on a clean copy-on-write table)
          math.max(1L,
            math.round(bytes.toDouble * rowCount / fileRows))
        case (Some((bytes, _)), _) => bytes
        case (None, _) =>
          // in-memory registration: the plan's own estimate
          frame.queryExecution.optimizedPlan.stats.sizeInBytes
            .min(BigInt(Long.MaxValue)).toLong
      }
      props += GraftStats.SizeKey -> size.toString
    }
    liveVersion.foreach(v => props += GraftStats.VersionKey -> v)
    if (cols.nonEmpty && !noScan)
      putColumnStats(frame, cols, props, identity)
    // REPLACE-don't-merge when the existing live stats describe an
    // OLDER version: setProperties merges, and a narrower re-ANALYZE
    // (fewer columns, or NOSCAN) would otherwise re-stamp the old
    // rows/column stats with the NEW version — stale stats served as
    // current, the exact mode the version gate exists to prevent.
    // When the recorded version IS still live the old stats remain
    // valid, so merging keeps Spark's incremental column-analyze
    // behavior (ANALYZE FOR COLUMNS a, then b → both served) — and a
    // VERSION-LESS table (registry frame, plain catalog table) has no
    // staleness signal at all, so it keeps Spark's merge semantics
    // unconditionally rather than destroying the accumulation on
    // every statement.
    val existing =
      try store.properties(ns, name)
      catch { case _: NoSuchElementException => Map.empty[String, String] }
    if (liveVersion.isDefined &&
        existing.get(GraftStats.VersionKey) != liveVersion) {
      val stale = GraftStats.liveStatsKeys(existing)
      if (stale.nonEmpty)
        store.unsetProperties(ns, name, stale, ifExists = true)
    }
    store.setProperties(ns, name, props.toMap)
    Seq.empty
  }

  private def resolveCols(frame: org.apache.spark.sql.DataFrame)
      : Seq[String] =
    if (allColumns) frame.columns.toSeq
    else columns.map(c => frame.columns.find(_.equalsIgnoreCase(c))
      .getOrElse(throw new IllegalArgumentException(
        s"ANALYZE: no such column $c in $ns.$name " +
          s"(columns: ${frame.columns.mkString(", ")})")))

  /** One collection pass for nulls/min/max/avgLen AND the KMV sketch
    * ([[graft.quality.Metrics.columnStatsWithKmv]]); ndv derives from
    * the sketch driver-side — the same estimator the incremental
    * refresh applies after merging a delta sketch
    * (GraftDml.maybeRefreshStats), so the two never disagree. `key`
    * maps plain stat keys to their scope (identity for live,
    * branch-prefixing under WAP). */
  private def putColumnStats(
      frame: org.apache.spark.sql.DataFrame, cols: Seq[String],
      props: scala.collection.mutable.LinkedHashMap[String, String],
      key: String => String): Unit =
    graft.quality.Metrics
      .columnStatsWithKmv(frame, cols, GraftStats.KmvK)
      .collect().foreach { r =>
        val c = r.getString(0)
        def put(suffix: String, v: Any): Unit =
          if (v != null) props +=
            key(s"${GraftStats.ColPrefix}$c.$suffix") -> v.toString
        put("nulls", r.get(1))
        put("min", r.get(2))
        put("max", r.get(3))
        put("avgLen", r.get(4))
        if (!r.isNullAt(5)) {
          val hashes = r.getSeq[Long](5)
          put("ndv", graft.ext.Sketches.kmvEstimate(hashes,
            GraftStats.KmvK))
          put("kmv", hashes.mkString(","))
        }
      }

  /** ANALYZE under `spark.wap.branch`: the same statistics, measured
    * against the STAGED branch (rows from the branch read, bytes from
    * the branch dir's footers) and persisted under the branch-scoped
    * key prefix with the staging token — never touching the live
    * stats. NOSCAN keeps its size-only contract. */
  private def runBranchScoped(spark: SparkSession, store: TableStore,
                              frame: org.apache.spark.sql.DataFrame,
                              branch: String, path: String): Seq[Row] = {
    val S = graft.pipeline.Snapshot
    val cols = resolveCols(frame)
    val pre = GraftStats.branchPrefix(branch)
    def key(liveKey: String): String =
      pre + liveKey.stripPrefix(GraftStats.KeyRoot)
    val props = scala.collection.mutable.LinkedHashMap[String, String]()
    // token captured BEFORE measuring (the live path's pre-capture
    // discipline): a branch restaged mid-ANALYZE gets old numbers
    // stamped with the OLD token, which the gate then refuses
    val token = S.branchStatsToken(path, branch)
    val (bytes, fileRows) = S.branchDataFileStats(path, branch)
    if (noScan) props += key(GraftStats.SizeKey) -> bytes.toString
    else {
      val rowCount = frame.count()
      props += key(GraftStats.RowsKey) -> rowCount.toString
      val size =
        if (fileRows > 0)
          math.max(1L, math.round(bytes.toDouble * rowCount / fileRows))
        else bytes
      props += key(GraftStats.SizeKey) -> size.toString
    }
    token.foreach(t =>
      props += pre + GraftStats.BranchTokenSuffix -> t)
    if (cols.nonEmpty && !noScan)
      putColumnStats(frame, cols, props, key)
    // the live path's REPLACE-don't-merge discipline, token-gated:
    // branch stats recorded against an older staging must not survive
    // a narrower re-ANALYZE re-stamped with the new token
    val existing =
      try store.properties(ns, name)
      catch { case _: NoSuchElementException => Map.empty[String, String] }
    if (token.isEmpty ||
        existing.get(pre + GraftStats.BranchTokenSuffix) != token) {
      val stale = existing.keys.filter(_.startsWith(pre)).toSeq
      if (stale.nonEmpty)
        store.unsetProperties(ns, name, stale, ifExists = true)
    }
    store.setProperties(ns, name, props.toMap)
    Seq.empty
  }
}

object GraftStats {
  val RowsKey = "graft.stats.rowCount"
  val SizeKey = "graft.stats.sizeInBytes"
  val VersionKey = "graft.stats.snapshotVersion"
  val ColPrefix = "graft.stats.col."

  /** KMV sketch size for incremental column stats (≈ 1/√k ≈ 6%
    * relative NDV error; 256 longs per analyzed column). */
  val KmvK = 256

  /** Common root of every stats key — branch scoping re-prefixes the
    * part after it. */
  val KeyRoot = "graft.stats."

  /** Branch-scoped key prefix: an ANALYZE under `spark.wap.branch b`
    * stores `graft.stats.branch.<b>.rowCount` etc., gated on the
    * staging token instead of the live version. */
  def branchPrefix(branch: String): String = s"${KeyRoot}branch.$branch."

  /** Key suffix carrying the staging token a branch's stats were
    * measured against (see [[graft.pipeline.Snapshot
    * .branchStatsToken]]). */
  val BranchTokenSuffix = "branchToken"

  /** The LIVE-scoped measurement keys among `props` — what a
    * replace-don't-merge clear may drop. Deliberately NOT a prefix
    * match on [[KeyRoot]]: `graft.stats.auto-refresh` is a config
    * toggle sharing the prefix (clearing it would silently turn the
    * feature off), and branch-scoped keys have their own lifecycle. */
  def liveStatsKeys(props: Map[String, String]): Seq[String] =
    props.keys.filter(k =>
      k == RowsKey || k == SizeKey || k == VersionKey ||
        k.startsWith(ColPrefix)).toSeq

  /** The persisted ANALYZE stats of `ns.name`, if current: the
    * recorded snapshot version must still be live (a table whose
    * content moved since ANALYZE serves NO stats rather than stale
    * ones — a wrong broadcast at 100 TB is an executor OOM). Under a
    * `spark.wap.branch` session with staged state, the BRANCH-SCOPED
    * stats serve instead — re-mapped to the plain keys and gated on
    * the branch's staging token (a re-staged branch stops serving
    * them), while live readers keep the live stats untouched. */
  def currentStats(spark: SparkSession, ns: String, name: String,
                   path: String): Option[Map[String, String]] =
    statsAndScanDir(spark, ns, name, path).map(_._1)

  /** [[currentStats]] plus the directory the stats-bearing scan roots
    * at (the branch dir under a staged WAP session, the live dir
    * otherwise) — one property fetch and one branch listing for both
    * answers, since [[attach]] sits on every read resolution. */
  private def statsAndScanDir(spark: SparkSession, ns: String,
                              name: String, path: String)
      : Option[(Map[String, String], String)] = {
    val props =
      try new TableStore(spark).properties(ns, name)
      catch { case _: NoSuchElementException => return None }
    GraftDml.wapBranch(spark)
      .filter(graft.pipeline.Snapshot.branches(path).contains) match {
      case Some(b) =>
        // the same payload fast_forward promotes — one token gate
        branchStatsFrom(props, path, b)
          .map((_, graft.pipeline.Snapshot.branchDirPath(path, b)))
      case None =>
        if (!props.contains(SizeKey)) None
        else if (!props.get(VersionKey).exists(v =>
            graft.pipeline.Snapshot.currentVersion(path)
              .map(_.toString).contains(v))) None
        else Some((props, path))
    }
  }

  /** The branch-scoped stats of `branch`, IF their token matches its
    * current staging — the promotion payload `fast_forward` re-keys
    * as live stats when it publishes the branch verbatim. Returned in
    * PLAIN key form (no branch prefix, no token). */
  def branchStatsIfCurrent(spark: SparkSession, ns: String,
                           name: String, path: String,
                           branch: String): Option[Map[String, String]] = {
    val props =
      try new TableStore(spark).properties(ns, name)
      catch { case _: NoSuchElementException => return None }
    branchStatsFrom(props, path, branch)
  }

  private def branchStatsFrom(props: Map[String, String], path: String,
                              branch: String)
      : Option[Map[String, String]] = {
    val pre = branchPrefix(branch)
    val scoped = props.collect {
      case (k, v) if k.startsWith(pre) => k.stripPrefix(pre) -> v
    }
    if (!scoped.contains(SizeKey.stripPrefix(KeyRoot))) None
    else if (!scoped.get(BranchTokenSuffix).exists(t =>
        graft.pipeline.Snapshot.branchStatsToken(path, branch)
          .contains(t))) None
    else Some(scoped.collect {
      case (k, v) if k != BranchTokenSuffix => (KeyRoot + k) -> v
    })
  }

  /** Drop every branch-scoped stats key of `branch` (branch consumed
    * or its delta-applied publish invalidated them). */
  /** Promote branch-scoped ANALYZE stats to LIVE with a publish —
    * the payload [[branchStatsIfCurrent]] captured BEFORE the publish
    * consumed the branch dir, re-stamped with the published version.
    * Lives beside its inverse operations so the promotion protocol
    * stays consistent with the live path's replace-don't-merge
    * discipline: the OLD live stats keys clear first (setProperties
    * merges, and a branch ANALYZE that measured fewer columns — or
    * none — than the pre-publish live one would otherwise leave
    * pre-publish column stats stamped with the NEW version). */
  def promoteBranchStats(spark: SparkSession, ns: String, name: String,
                         stats: Option[Map[String, String]],
                         publishedVersion: Long): Unit =
    stats.foreach { s =>
      val store = new TableStore(spark)
      val stale = liveStatsKeys(
        try store.properties(ns, name)
        catch { case _: NoSuchElementException =>
          Map.empty[String, String] })
      if (stale.nonEmpty)
        store.unsetProperties(ns, name, stale, ifExists = true)
      store.setProperties(ns, name,
        s + (VersionKey -> publishedVersion.toString))
    }

  def dropBranchStats(spark: SparkSession, ns: String, name: String,
                      branch: String): Unit = {
    val store = new TableStore(spark)
    val props =
      try store.properties(ns, name)
      catch { case _: NoSuchElementException => return }
    val keys = props.keys.filter(_.startsWith(branchPrefix(branch))).toSeq
    if (keys.nonEmpty)
      store.unsetProperties(ns, name, keys, ifExists = true)
  }

  /** Fold the persisted stats into a resolved snapshot-read plan:
    * the base scan's [[LogicalRelation]] (root path == the table dir;
    * sidecar scans live under `_mor/` and are skipped) gains a
    * [[CatalogTable]] carrying [[CatalogStatistics]] — the exact slot
    * `LogicalRelation.computeStats` consults before falling back to
    * file sizes, so the whole read subtree's size estimate follows
    * the ANALYZE numbers. */
  def attach(spark: SparkSession, ns: String, name: String,
             path: String, plan: LogicalPlan): LogicalPlan =
    statsAndScanDir(spark, ns, name, path) match {
      case None => plan
      case Some((props, scanDir)) =>
        // under a staged WAP branch the scan's root IS the branch dir
        val abs = java.nio.file.Paths.get(scanDir)
          .toAbsolutePath.normalize.toString
        plan.transform {
          case lr @ LogicalRelation(hfs: HadoopFsRelation, _, None, _, _)
              if hfs.location.rootPaths.map(_.toUri.getPath)
                .forall(_ == abs) && hfs.location.rootPaths.nonEmpty =>
            lr.copy(catalogTable =
              Some(catalogTable(ns, name, lr.schema, props)))
        }
    }

  private def catalogTable(ns: String, name: String, schema: StructType,
                           props: Map[String, String]): CatalogTable =
    CatalogTable(
      identifier = TableIdentifier(name, Some(ns)),
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty,
      schema = schema,
      provider = Some("parquet"),
      stats = Some(CatalogStatistics(
        sizeInBytes = BigInt(props(SizeKey)),
        rowCount = props.get(RowsKey).map(BigInt(_)),
        colStats = columnStatsOf(schema, props))))

  /** Per-column [[CatalogColumnStat]]s from the persisted properties.
    * min/max are re-serialized in the column type's EXTERNAL string
    * form (CatalogColumnStat.fromExternalString parses by data type —
    * a double-form "1.0" under a BIGINT column would throw at plan
    * time); non-numeric columns carry counts only. */
  private def columnStatsOf(schema: StructType,
                            props: Map[String, String])
      : Map[String, CatalogColumnStat] =
    schema.fields.flatMap { f =>
      val p = s"$ColPrefix${f.name}."
      def g(s: String) = props.get(p + s)
      if (!props.keys.exists(_.startsWith(p))) None
      else {
        def bound(v: String): Option[String] = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            Some(math.round(v.toDouble).toString)
          case DoubleType | FloatType => Some(v)
          case _: DecimalType => Some(v)
          case _ => None // string/etc: numeric min/max not applicable
        }
        Some(f.name -> CatalogColumnStat(
          distinctCount =
            g("ndv").map(v => BigInt(math.round(v.toDouble))),
          min = g("min").flatMap(bound),
          max = g("max").flatMap(bound),
          nullCount = g("nulls").map(BigInt(_)),
          avgLen = g("avgLen").map(v => math.round(v.toDouble)),
          maxLen = None))
      }
    }.toMap

  /** The `DESCRIBE EXTENDED` Statistics row, when stats exist (shape
    * matches Spark's: "N bytes, M rows"). */
  def describeRows(props: Map[String, String]): Seq[Row] =
    props.get(SizeKey).toSeq.map { size =>
      Row("Statistics",
        size + " bytes" +
          props.get(RowsKey).map(r => s", $r rows").getOrElse(""),
        null)
    }
}
