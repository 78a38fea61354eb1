package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** INCREMENTAL AGGREGATE MAINTENANCE — the gold-layer twin of the
  * persisted-index lifecycle: materialize `GROUP BY groupCols →
  * (count(*), sum(measure)…)` over a snapshot table once, then keep
  * it exact under appends, deletes, and updates by consuming the
  * source's COMMIT WINDOW instead of recomputing — the reference
  * rebuilds its derived tables from scratch every run
  * (`/root/reference/jobs/build_orders_silver.py:95`); at 100 TB the
  * rebuild is the bill, and count/sum are the self-maintainable
  * aggregate class (Gupta & Mumick, incremental view maintenance), so
  * the delta IS the update:
  *
  * ```
  * <rollupDir>/table         (groupCols…, cnt, sum_<m>…)  snapshot
  * <rollupDir>/_rollup_meta  src version + spec (atomic)
  * ```
  *
  * Sums accumulate in DECIMAL(27,6) (exact, order-free — additions
  * and subtractions commute bit-identically, so the maintained value
  * equals a full recompute EXACTLY, not approximately; the
  * [[read]]-side casts back to double). `avg` is derivable as
  * `sum/cnt`; min/max are NOT self-maintainable under deletes and are
  * deliberately out of scope (their incremental form needs per-group
  * recomputation of affected groups).
  *
  * Lifecycle contract (the persisted-index discipline):
  *  - [[build]] aggregates the live source and stamps its version.
  *  - [[refresh]] prices the window with [[Snapshot.windowRowDelta]]
  *    — O(window sidecar rows + position-referenced files), never a
  *    source scan. Appends add; POSITION deletes subtract exactly
  *    (per-instance); an equality-delete window raises (the sidecar
  *    cannot price how many identical instances died — set
  *    `write.mor.deletes = position` on sources feeding a rollup); a
  *    copy-on-write rebase raises (per-commit deltas are gone —
  *    rebuild). Touched groups upsert through ONE MOR commit on the
  *    rollup table: a key-scoped equality delete drops their old
  *    rows, the re-summed rows append; groups whose count reaches 0
  *    disappear; a count below 0 raises (corruption guard).
  *  - Crash replay: each refresh commit carries the window's END
  *    version in its operation marker (`rollup-to-v<N>`), so a replay
  *    after a crash between the rollup commit and the meta write
  *    re-reads the marker, skips the already-applied prefix, and
  *    applies only the remainder — never double-counting (morCommit
  *    is atomic: a window is applied entirely or not at all).
  */
object Rollup {

  final case class Meta(srcVersion: Long, rollupVersion: Long,
                        groupCols: Seq[String], measures: Seq[String],
                        minMax: Seq[String])

  def tableDir(rollupDir: String): String = s"$rollupDir/table"
  private def metaFile(rollupDir: String) =
    Paths.get(rollupDir, "_rollup_meta")

  def meta(rollupDir: String): Option[Meta] = {
    val f = metaFile(rollupDir)
    if (!Files.exists(f)) None
    else {
      val lines = new String(Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8).trim
        .split("\n").toSeq
      if (lines.length != 5) throw new IllegalStateException(
        s"rollup meta at $rollupDir has ${lines.length} lines (this " +
          "version writes 5) — persisted by an older format; rebuild")
      Some(Meta(lines.head.toLong, lines(1).toLong,
        lines(2).split("\t").toSeq, lines(3).split("\t").toSeq,
        lines(4).stripPrefix("mm:").split("\t").toSeq
          .filter(_.nonEmpty)))
    }
  }

  private def writeMeta(rollupDir: String, m: Meta): Unit = {
    Files.createDirectories(Paths.get(rollupDir))
    val tmp = Paths.get(rollupDir, "_rollup_meta.tmp")
    Files.write(tmp,
      (s"${m.srcVersion}\n${m.rollupVersion}\n" +
        s"${m.groupCols.mkString("\t")}\n${m.measures.mkString("\t")}\n" +
        s"mm:${m.minMax.mkString("\t")}\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, metaFile(rollupDir),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def srcVersionOf(srcPath: String): Long =
    Snapshot.currentVersion(srcPath).getOrElse(
      throw new IllegalStateException(
        s"rollup requires a versioned snapshot source at $srcPath — " +
          "the staleness contract pins rollup to source version"))

  /** One group's maintained columns: exact decimal sums + count.
    * Sums pin to DECIMAL(27,6) (Spark widens sum(decimal) results —
    * the STORED type must stay fixed across build and every refresh
    * or the MOR union would coerce). */
  private def aggExprs(measures: Seq[String],
                       minMax: Seq[String]): Seq[Column] =
    count(lit(1)).as("cnt") +:
      (measures.map(m =>
        sum(col(m).cast(DecimalType(27, 6)))
          .cast(DecimalType(27, 6)).as(s"sum_$m")) ++
        minMax.flatMap(mm => Seq(
          min(col(mm)).as(s"min_$mm"),
          max(col(mm)).as(s"max_$mm"))))

  private def aggOf(df: DataFrame, groupCols: Seq[String],
                    measures: Seq[String],
                    minMax: Seq[String]): DataFrame = {
    val es = aggExprs(measures, minMax)
    df.groupBy(groupCols.map(col): _*).agg(es.head, es.tail: _*)
  }

  /** Build (or rebuild): one full aggregation pass over the live
    * source, stamped with its version. @return group rows */
  def build(spark: SparkSession, srcPath: String, rollupDir: String,
            groupCols: Seq[String], measures: Seq[String],
            minMax: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty, "rollup needs at least one group column")
    val version = srcVersionOf(srcPath)
    Snapshot.createOrReplace(
      aggOf(Snapshot.read(spark, srcPath), groupCols, measures, minMax),
      tableDir(rollupDir), keepVersions = 1)
    writeMeta(rollupDir, Meta(version,
      Snapshot.currentVersion(tableDir(rollupDir)).getOrElse(0L),
      groupCols, measures, minMax))
    Snapshot.read(spark, tableDir(rollupDir)).count()
  }

  /** The source version a marker `rollup-to-v<N>` commit recorded —
    * the replay detector: commits on the rollup table past the meta's
    * `rollupVersion` that carry one were applied by a refresh that
    * died before its meta write. */
  private def appliedThrough(rollupDir: String, m: Meta): Long =
    Snapshot.morVersions(tableDir(rollupDir))
      .filter(_ > m.rollupVersion)
      .flatMap(v => Snapshot.operationOf(tableDir(rollupDir), v))
      .collect { case op if op.startsWith("rollup-to-v") =>
        op.stripPrefix("rollup-to-v").toLong }
      .foldLeft(m.srcVersion)(math.max)

  /** Apply the source commits since the rollup last saw it — cost
    * O(window delta), never a source scan (see the object doc for the
    * exactness contract).
    *
    * READ-TAX BOUND: each refresh stacks one delete+append sidecar on
    * the rollup table; a per-batch maintenance loop (ST10) would grow
    * the read's merge cost without bound. When the stacked commit
    * count reaches `compactAfterCommits` the table auto-compacts
    * (best-effort, AFTER the meta stamp — the applied-window markers
    * it erases are only needed for crashes that predate the stamp),
    * the `write.mor.compact-after-commits` sawtooth contract.
    * @return touched group count */
  def refresh(spark: SparkSession, srcPath: String,
              rollupDir: String, compactAfterCommits: Int = 64): Long = {
    val m = meta(rollupDir).getOrElse(throw new IllegalStateException(
      s"no rollup at $rollupDir (build first)"))
    val version = srcVersionOf(srcPath)
    if (version == m.srcVersion) return 0L
    // a crashed refresh's commit carries its window end in the
    // operation marker — resume AFTER it, never re-applying
    val since = appliedThrough(rollupDir, m)
    if (since >= version) {
      writeMeta(rollupDir, m.copy(srcVersion = since,
        rollupVersion = Snapshot
          .currentVersion(tableDir(rollupDir)).getOrElse(0L)))
      return 0L
    }
    Snapshot.commitsSince(srcPath, since, Some(version)) match {
      case Snapshot.CommitWindow.Rebased(base) =>
        throw new IllegalStateException(
          s"rollup over $srcPath cannot refresh: a copy-on-write " +
            s"commit re-based the source (base v$base) and the " +
            "per-commit deltas are gone — rebuild the rollup")
      case _ => ()
    }
    val (plus, minus0) = Snapshot.windowRowDelta(spark, srcPath,
      since, version, "rollup")
    val minus = minus0.localCheckpoint()
    val key = m.groupCols
    val sumCols = m.measures.map(mm => s"sum_$mm")
    // signed partial aggregates: appends count +1, deletes −1; the
    // merged group is old ⊎ (+delta) ⊎ (−delta) summed per column —
    // decimal addition/subtraction is exact and order-free. Min/max
    // are NOT subtractable: the minus side contributes nulls here,
    // and every group the window removed rows from recomputes its
    // min/max below.
    def signed(df: DataFrame, sign: Int): DataFrame = {
      var a = aggOf(df, key, m.measures, m.minMax)
      if (sign < 0) {
        a = a.withColumn("cnt", -col("cnt"))
        sumCols.foreach(c => a = a.withColumn(c, -col(c)))
        m.minMax.foreach { mm =>
          a = a.withColumn(s"min_$mm",
            lit(null).cast(a.schema(s"min_$mm").dataType))
          a = a.withColumn(s"max_$mm",
            lit(null).cast(a.schema(s"max_$mm").dataType))
        }
      }
      a
    }
    val dexprs = sum("cnt").as("cnt") +:
      (sumCols.map(c => sum(c).cast(DecimalType(27, 6)).as(c)) ++
        m.minMax.flatMap(mm => Seq(
          min(col(s"min_$mm")).as(s"min_$mm"),
          max(col(s"max_$mm")).as(s"max_$mm"))))
    val delta = signed(plus, 1).unionByName(signed(minus, -1))
      .groupBy(key.map(col): _*)
      .agg(dexprs.head, dexprs.tail: _*)
      .localCheckpoint()
    val touched = delta.select(key.map(col): _*).localCheckpoint()
    val n = touched.count()
    if (n > 0) {
      val old = Snapshot.read(spark, tableDir(rollupDir))
        .join(broadcast(touched), key, "left_semi")
      val mexprs = sum("cnt").cast("long").as("cnt") +:
        (sumCols.map(c =>
          sum(col(c)).cast(DecimalType(27, 6)).as(c)) ++
          m.minMax.flatMap(mm => Seq(
            min(col(s"min_$mm")).as(s"min_$mm"),
            max(col(s"max_$mm")).as(s"max_$mm"))))
      var merged = old.unionByName(delta)
        .groupBy(key.map(col): _*)
        .agg(mexprs.head, mexprs.tail: _*)
      // affected-group min/max recompute: a deleted row may have BEEN
      // the group's extremum, so every group the window removed rows
      // from re-derives min/max from the source AS OF the window end,
      // restricted to those groups — O(affected groups' rows) with
      // the filter pushed to the scan (the classic bound for
      // non-subtractable aggregates under deletes)
      if (m.minMax.nonEmpty) {
        val minusG = minus.select(key.map(col): _*).distinct()
          .localCheckpoint()
        if (minusG.limit(1).count() > 0) {
          val rexprs = m.minMax.flatMap(mm => Seq(
            min(col(mm)).as(s"_r_min_$mm"),
            max(col(mm)).as(s"_r_max_$mm")))
          val rec = Snapshot.readAsOf(spark, srcPath, version)
            .join(broadcast(minusG), key, "left_semi")
            .groupBy(key.map(col): _*)
            .agg(rexprs.head, rexprs.tail: _*)
          merged = merged.join(rec, key, "left")
          m.minMax.foreach { mm =>
            merged = merged
              .withColumn(s"min_$mm",
                coalesce(col(s"_r_min_$mm"), col(s"min_$mm")))
              .withColumn(s"max_$mm",
                coalesce(col(s"_r_max_$mm"), col(s"max_$mm")))
          }
          merged = merged.drop(m.minMax.flatMap(mm =>
            Seq(s"_r_min_$mm", s"_r_max_$mm")): _*)
        }
      }
      merged = merged.localCheckpoint()
      if (merged.filter(col("cnt") < 0).limit(1).count() > 0)
        throw new IllegalStateException(
          s"rollup at $rollupDir went NEGATIVE on a group count — " +
            "the window subtracted rows the rollup never saw " +
            "(source history rewritten under the rollup?); rebuild")
      Snapshot.morCommit(spark, tableDir(rollupDir),
        deletes = Some(touched),
        appends = Some(merged.filter(col("cnt") > 0)),
        operation = s"rollup-to-v$version")
    }
    writeMeta(rollupDir, m.copy(srcVersion = version,
      rollupVersion =
        Snapshot.currentVersion(tableDir(rollupDir)).getOrElse(0L)))
    if (compactAfterCommits > 0 &&
        Snapshot.morVersions(tableDir(rollupDir)).size
          >= compactAfterCommits) {
      try {
        Snapshot.rewritePositionDeletes(spark, tableDir(rollupDir))
        writeMeta(rollupDir, meta(rollupDir).get.copy(rollupVersion =
          Snapshot.currentVersion(tableDir(rollupDir)).getOrElse(0L)))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    n
  }

  /** The maintained rollup, sums cast back to double (the storage is
    * exact DECIMAL so maintenance commutes; the read surface matches
    * the `CAST(SUM(CAST(… AS DECIMAL)) AS DOUBLE)` oracle idiom).
    * Raises when the source moved past the maintained version — the
    * stats-serve-no-stale-plans discipline every derived artifact in
    * this engine follows. */
  def read(spark: SparkSession, srcPath: String,
           rollupDir: String): DataFrame = {
    val m = meta(rollupDir).getOrElse(throw new IllegalStateException(
      s"no rollup at $rollupDir (build first)"))
    val version = srcVersionOf(srcPath)
    if (version != m.srcVersion)
      throw new IllegalStateException(
        s"rollup at $rollupDir is STALE: it aggregates source version " +
          s"${m.srcVersion} but the live source is v$version — run " +
          "Rollup.refresh or rebuild")
    m.measures.foldLeft(Snapshot.read(spark, tableDir(rollupDir))) {
      (df, mm) =>
        df.withColumn(s"sum_$mm", col(s"sum_$mm").cast(DoubleType))
    }
  }
}
