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
    // a WAP session pins reads to the staged branch — ANALYZE there
    // would record BRANCH row counts against the LIVE version and
    // file bytes, a silently inconsistent mix; refuse loudly
    if (GraftDml.wapBranch(spark).nonEmpty)
      throw new UnsupportedOperationException(
        "ANALYZE TABLE under spark.wap.branch would mix staged-branch " +
          "rows with live file statistics — publish the branch first")
    // registry-first, the DML-gate resolution order
    val frame = TableStore.registry(spark).get(Seq(ns, name))
      .orElse(store.snapshotPath(ns, name)
        .map(p => GraftDml.snapshotRead(spark, p)))
      .getOrElse(store.table(ns, name))
    val snapPath =
      if (TableStore.registry(spark).contains(Seq(ns, name))) None
      else store.snapshotPath(ns, name)
    val cols: Seq[String] =
      if (allColumns) frame.columns.toSeq
      else columns.map(c => frame.columns.find(_.equalsIgnoreCase(c))
        .getOrElse(throw new IllegalArgumentException(
          s"ANALYZE: no such column $c in $ns.$name " +
            s"(columns: ${frame.columns.mkString(", ")})")))
    val props = scala.collection.mutable.LinkedHashMap[String, String]()
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
    snapPath.flatMap(graft.pipeline.Snapshot.currentVersion)
      .foreach(v => props += GraftStats.VersionKey -> v.toString)
    if (cols.nonEmpty && !noScan) {
      graft.quality.Metrics.columnStats(frame, cols).collect()
        .foreach { r =>
          val c = r.getString(0)
          def put(suffix: String, v: Any): Unit =
            if (v != null) props +=
              s"${GraftStats.ColPrefix}$c.$suffix" -> v.toString
          put("nulls", r.get(1))
          put("ndv", r.get(2))
          put("min", r.get(3))
          put("max", r.get(4))
          put("avgLen", r.get(5))
        }
      // the per-column KMV sketch (k smallest distinct hashes)
      // persists BESIDE the stats: a later commit's auto-refresh
      // merges a delta sketch against it instead of rescanning —
      // see GraftDml.maybeRefreshStats
      graft.quality.Metrics.columnKmv(frame, cols, GraftStats.KmvK)
        .collect().foreach { r =>
          props += s"${GraftStats.ColPrefix}${r.getString(0)}.kmv" ->
            r.getSeq[Long](1).mkString(",")
        }
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

  /** The persisted ANALYZE stats of `ns.name`, if current: the
    * recorded snapshot version must still be live (a table whose
    * content moved since ANALYZE serves NO stats rather than stale
    * ones — a wrong broadcast at 100 TB is an executor OOM). */
  def currentStats(spark: SparkSession, ns: String, name: String,
                   path: String): Option[Map[String, String]] = {
    val props =
      try new TableStore(spark).properties(ns, name)
      catch { case _: NoSuchElementException => return None }
    if (!props.contains(SizeKey)) None
    else if (!props.get(VersionKey).exists(v =>
        graft.pipeline.Snapshot.currentVersion(path)
          .map(_.toString).contains(v))) None
    else Some(props)
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
    currentStats(spark, ns, name, path) match {
      case None => plan
      case Some(props) =>
        val abs = java.nio.file.Paths.get(path)
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
