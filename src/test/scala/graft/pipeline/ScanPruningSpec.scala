package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Stats-based scan planning: file pruning by parquet footer min/max,
  * superset guarantee, MOR composition, and the sorted-layout payoff. */
class ScanPruningSpec extends SparkSpec {
  import spark.implicits._
  import ScanPruning.ColumnRange

  private def tmpTable(tag: String): String =
    Files.createTempDirectory(tag).toString + "/t"

  private val rows =
    (0 until 800).map(i => (i.toLong, i.toDouble / 10.0, f"s$i%04d"))

  test("sorted layout: a narrow key range keeps a small file subset, " +
    "the pruned read equals the plain filter, empty range keeps none") {
    val dir = tmpTable("prune1")
    Snapshot.createOrReplace(rows.toDF("k", "v", "s"), dir)
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("k")))
    val ranges = Seq(ColumnRange("k", Some(100L), Some(199L)))
    val plan = ScanPruning.pruneDir(spark, dir, ranges)
    assert(plan.total == 8, s"expected 8 files, got ${plan.total}")
    assert(plan.kept.size <= 2,
      s"sorted files are disjoint ranges; kept ${plan.kept.size} of 8")
    val pruned = Snapshot.prunedRead(spark, dir, ranges)
      .as[(Long, Double, String)].collect().sortBy(_._1)
    val full = Snapshot.read(spark, dir)
      .filter(col("k") >= 100L && col("k") <= 199L)
      .as[(Long, Double, String)].collect().sortBy(_._1)
    assert(pruned.toSeq == full.toSeq && pruned.length == 100)
    // a range beyond the data prunes EVERY file and still answers
    val none = Seq(ColumnRange("k", Some(10000L), None))
    assert(ScanPruning.pruneDir(spark, dir, none).kept.isEmpty)
    assert(Snapshot.prunedRead(spark, dir, none).count() == 0)
  }

  test("double and string ranges prune on their own stats; a column " +
    "with no footer stats is never pruned") {
    val dir = tmpTable("prune2")
    Snapshot.createOrReplace(rows.toDF("k", "v", "s"), dir)
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("v")))
    val dr = Seq(ColumnRange("v", Some(20.0), Some(29.9)))
    assert(ScanPruning.pruneDir(spark, dir, dr).kept.size <= 2)
    assert(Snapshot.prunedRead(spark, dir, dr).count() ==
      Snapshot.read(spark, dir)
        .filter(col("v").between(20.0, 29.9)).count())
    // string clustering prunes string ranges
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("s")))
    val sr = Seq(ColumnRange("s", Some("s0100"), Some("s0199")))
    assert(ScanPruning.pruneDir(spark, dir, sr).kept.size <= 2)
    assert(Snapshot.prunedRead(spark, dir, sr).count() == 100)
    // a column absent from the files keeps everything (conservative)
    val missing = Seq(ColumnRange("nope", Some(1L), Some(2L)))
    assert(ScanPruning.pruneDir(spark, dir, missing).kept.size == 8)
  }

  test("unsorted layout cannot prune much but stays exact; conjunctive " +
    "ranges intersect the kept sets") {
    val dir = tmpTable("prune3")
    // round-robin layout: every file spans nearly the whole key range
    Snapshot.createOrReplace(rows.toDF("k", "v", "s").repartition(8), dir)
    val ranges = Seq(ColumnRange("k", Some(100L), Some(199L)))
    val pruned = Snapshot.prunedRead(spark, dir, ranges).count()
    assert(pruned == 100, s"unsorted pruned read returned $pruned")
    // conjunction: k-range keeps ~1 file on a k-sorted rewrite, and an
    // impossible v-range on top kills the rest
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("k")))
    val conj = Seq(
      ColumnRange("k", Some(100L), Some(199L)),
      ColumnRange("v", Some(1e9), None))
    assert(ScanPruning.pruneDir(spark, dir, conj).kept.isEmpty)
    assert(Snapshot.prunedRead(spark, dir, conj).count() == 0)
  }

  test("the stats manifest sidecar plans identically to the footer " +
    "walk, survives only while the file set matches, and regenerates") {
    val dir = tmpTable("prune6")
    Snapshot.createOrReplace(rows.toDF("k", "v", "s"), dir)
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("k")))
    val manifest = java.nio.file.Paths.get(dir, "_scan_manifest.tsv")
    assert(java.nio.file.Files.exists(manifest),
      "rewriteSorted must publish the scan manifest")
    val ranges = Seq(ColumnRange("k", Some(100L), Some(199L)))
    val viaManifest = ScanPruning.pruneDir(spark, dir, ranges)
    // delete the sidecar → footer walk → identical plan
    java.nio.file.Files.delete(manifest)
    val viaFooters = ScanPruning.pruneDir(spark, dir, ranges)
    assert(viaManifest.kept == viaFooters.kept &&
      viaManifest.total == viaFooters.total)
    // a manifest naming the WRONG files is ignored (validation), so a
    // stale sidecar can never mis-prune
    java.nio.file.Files.write(manifest,
      "v1\nno-such-file.parquet\tk\tlong\t0\t1\n".getBytes("UTF-8"))
    assert(ScanPruning.pruneDir(spark, dir, ranges).kept ==
      viaFooters.kept)
    // explicit regeneration restores the manifest plan
    ScanPruning.writeStatsManifest(spark, dir, Seq("k", "s"))
    assert(ScanPruning.pruneDir(spark, dir, ranges).kept ==
      viaFooters.kept)
    // string ranges plan from the same regenerated manifest
    assert(ScanPruning.pruneDir(spark, dir,
      Seq(ColumnRange("s", Some("s0100"), Some("s0199")))).kept.size <= 8)
  }

  test("the SQL read path skips files through the manifest index: a " +
    "plain filter over Snapshot.read scans O(matching) files") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpTable("prune8")
    Snapshot.createOrReplace(rows.toDF("k", "v", "s"), dir)
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("k")))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    }
    // no filter → all 8 files
    assert(scannedFiles(Snapshot.read(spark, dir)) == 8)
    // pushed range filter → the index skips non-matching files at
    // plan time, results equal the unpruned filter
    val filtered = Snapshot.read(spark, dir)
      .filter(col("k").between(100L, 199L))
    assert(scannedFiles(filtered) <= 2,
      "manifest index must prune the SQL-path scan")
    assert(filtered.count() == 100)
    // equality literal prunes too; disjoint range scans zero files
    assert(scannedFiles(Snapshot.read(spark, dir)
      .filter(col("k") === 150L)) <= 2)
    assert(Snapshot.read(spark, dir)
      .filter(col("k") > 5000L).count() == 0)
    // a registered table through spark.sql takes the same path
    val store = new graft.catalog.TableStore(spark)
    store.registerSnapshot("prune", "sorted", dir)
    val viaSql = spark.sql(
      "SELECT * FROM prune.sorted WHERE k BETWEEN 100 AND 199")
    assert(scannedFiles(viaSql) <= 2,
      "spark.sql over the registered table must skip files")
    assert(viaSql.count() == 100)
    // after a MOR delete the base keeps skipping and results stay
    // exact (the sidecar is a separate component)
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((150L, 15.0, "s0150")).toDF("k", "v", "s")),
      appends = None, operation = "delete")
    val afterMor = Snapshot.read(spark, dir)
      .filter(col("k").between(100L, 199L))
    assert(afterMor.count() == 99)
  }

  test("an IN-list lookup skips files through the manifest index " +
    "(any-of min/max): the key-list shape the rollup dim-window " +
    "fact prune pushes — both the In and the optimizer's InSet form " +
    "prune, results stay exact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpTable("prune10")
    Snapshot.createOrReplace(rows.toDF("k", "v", "s"), dir)
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("k")))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    }
    // 3 keys from one neighborhood (≤ In conversion threshold, stays
    // the literal In form) → at most the files holding that range
    val inQ = Snapshot.read(spark, dir)
      .filter(col("k").isin(150L, 151L, 152L))
    assert(scannedFiles(inQ) <= 2,
      "the In pushdown must prune files by any-of min/max")
    assert(inQ.count() == 3)
    // 12 keys (past the InSet conversion threshold of 10), two
    // clusters → at most the files covering the two neighborhoods
    val many = ((100L to 105L) ++ (700L to 705L)).toSeq
    val inSetQ = Snapshot.read(spark, dir)
      .filter(col("k").isin(many: _*))
    assert(scannedFiles(inSetQ) <= 4,
      "the InSet pushdown must prune files by any-of min/max")
    assert(inSetQ.count() == many.size)
    // an all-miss list scans zero files and returns nothing
    val missQ = Snapshot.read(spark, dir)
      .filter(col("k").isin(100000L, 100001L))
    assert(missQ.count() == 0)
    assert(scannedFiles(Snapshot.read(spark, dir)
      .filter(col("k").isin(100000L, 100001L))) == 0)
  }

  test("an IN-list whose literals the stats domain cannot compare " +
    "(decimal column — manifest stats are unscaled longs) keeps every " +
    "file instead of pruning on a silently-reduced value set") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = tmpTable("prune11")
    val dec = (0 until 800).map(i =>
      (i.toLong, new java.math.BigDecimal(s"$i.5"), f"s$i%04d"))
    Snapshot.createOrReplace(
      dec.toDF("k", "d", "s")
        .withColumn("d", col("d").cast("decimal(10,2)")), dir)
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("k")))
    // publish stats for the decimal column too: parquet stores
    // decimal(10,2) as INT64, so the manifest carries UNSCALED longs
    // a Catalyst Decimal literal can never compare against
    ScanPruning.writeStatsManifest(spark, dir, Seq("k", "d"))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    }
    // both the In form (3 values) and the InSet form (12) must return
    // the exact rows — a dropped-value any-of would prune every
    // stats-carrying file and return nothing
    val inQ = Snapshot.read(spark, dir)
      .filter(col("d").isin(new java.math.BigDecimal("150.5"),
        new java.math.BigDecimal("151.5"),
        new java.math.BigDecimal("152.5")))
    assert(inQ.count() == 3,
      "decimal IN-list must not be mis-pruned by the manifest index")
    val many = ((100 to 105) ++ (700 to 705))
      .map(i => new java.math.BigDecimal(s"$i.5"))
    val inSetQ = Snapshot.read(spark, dir)
      .filter(col("d").isin(many: _*))
    assert(inSetQ.count() == many.size,
      "decimal InSet must not be mis-pruned by the manifest index")
    // the k column (integral — convertible) still prunes in the same
    // snapshot, proving the abort is per-filter, not global
    assert(scannedFiles(Snapshot.read(spark, dir)
      .filter(col("k").isin(150L, 151L, 152L))) <= 2)
  }

  test("WRITE ORDERED BY commits and zorder rewrites publish manifests " +
    "so their layouts skip files too") {
    // ordered commit → manifest for the order column
    val dir = tmpTable("prune9")
    Snapshot.createOrReplace(rows.toDF("k", "v", "s"), dir)
    Snapshot.setSortOrder(dir, Seq(("k", true)))
    Snapshot.createOrReplaceCurrentSpec(rows.toDF("k", "v", "s"), dir)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_scan_manifest.tsv")),
      "an ordered commit must publish the scan manifest")
    // AQE may coalesce this small write to one file — the pruning
    // POWER is pinned on the 8-file rewrites above; here the claim is
    // that the manifest exists, validates, and plans correctly
    val plan = ScanPruning.pruneDir(spark, dir,
      Seq(ColumnRange("k", Some(100L), Some(199L))))
    assert(plan.kept.size <= plan.total && plan.kept.nonEmpty)
    assert(ScanPruning.pruneDir(spark, dir,
      Seq(ColumnRange("k", Some(5000L), None))).kept.isEmpty,
      "a beyond-data range must prune everything via the manifest")
    assert(Snapshot.read(spark, dir)
      .filter(col("k").between(100L, 199L)).count() == 100)

    // zorder CALL → manifest for both source dimensions; a 2-D box
    // query skips files
    val zdir = tmpTable("prune9z")
    Snapshot.createOrReplace(
      (0 until 1024).map(i => (i % 32, i / 32)).toDF("x", "y"), zdir)
    new graft.catalog.TableStore(spark)
      .registerSnapshot("prunez", "t", zdir)
    spark.sql("""CALL iceberg.system.rewrite_data_files(
      table => 'prunez.t', target_file_count => 16,
      strategy => 'sort', sort_order => 'zorder(x, y)')""")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(zdir, "_scan_manifest.tsv")))
    val box = Seq(ColumnRange("x", Some(0L), Some(7L)),
      ColumnRange("y", Some(0L), Some(7L)))
    val zplan = ScanPruning.pruneDir(spark, zdir, box)
    assert(zplan.total == 16 && zplan.kept.size < 16,
      s"z-order box kept ${zplan.kept.size} of ${zplan.total}")
    assert(spark.sql(
      "SELECT count(*) FROM prunez.t WHERE x <= 7 AND y <= 7")
      .head().getLong(0) == 64)
  }

  test("colliding part-file basenames (partitioned layouts) refuse a " +
    "manifest and never trust one") {
    val dir = tmpTable("prune7")
    // one task per partition value → every fragment dir holds a file
    // named part-00000-…: basenames collide across subdirs
    Snapshot.createOrReplacePartitioned(
      rows.toDF("k", "v", "s").withColumn("p", col("k") % 2)
        .repartition(col("p")),
      dir, Seq("p"))
    val names = ScanPruning.dataFiles(spark, dir)
      .map(f => f.substring(f.lastIndexOf('/') + 1))
    assume(names.distinct.size < names.size,
      "fixture must produce colliding basenames")
    intercept[IllegalArgumentException] {
      ScanPruning.writeStatsManifest(spark, dir, Seq("k"))
    }
    // a manifest planted anyway (e.g. by an old writer) is ignored:
    // the plan equals the footer walk, rows stay correct
    val ranges = Seq(ColumnRange("k", Some(0L), Some(99L)))
    val viaFooters = ScanPruning.pruneDir(spark, dir, ranges)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_scan_manifest.tsv"),
      (s"v1\n" + names.distinct.map(n => s"$n\tk\tlong\t500\t501")
        .mkString("\n")).getBytes("UTF-8"))
    assert(ScanPruning.pruneDir(spark, dir, ranges).kept ==
      viaFooters.kept)
    assert(Snapshot.prunedRead(spark, dir, ranges).count() == 100)
  }

  test("bloom filters prune point lookups on unsorted high-cardinality " +
    "columns where min/max cannot") {
    val dir = tmpTable("prune5")
    val data = (0 until 800)
      .map(i => (md5sum(s"row-$i"), i.toLong))
      .toDF("sid", "payload")
      .repartition(8, col("sid"))
    Snapshot.createOrReplace(data, dir,
      options = ScanPruning.bloomWriteOptions("sid", 200))
    val target = md5sum("row-42")
    val point = Seq(ColumnRange("sid", Some(target), Some(target)))
    val withBloom = ScanPruning.pruneDir(spark, dir, point)
    assert(withBloom.total == 8)
    assert(withBloom.kept.size <= 2,
      s"bloom point lookup kept ${withBloom.kept.size} of 8 files")
    val row = Snapshot.prunedRead(spark, dir, point)
      .as[(String, Long)].collect()
    assert(row.toSeq == Seq((target, 42L)))
    // a value NOT in the table prunes everything (no false row)
    val missing = md5sum("not-a-row")
    val none = Seq(ColumnRange("sid", Some(missing), Some(missing)))
    assert(ScanPruning.pruneDir(spark, dir, none).kept.size <= 1)
    assert(Snapshot.prunedRead(spark, dir, none).count() == 0)
    // the same layout WITHOUT bloom filters: min/max over random md5
    // strings spans the domain in every file — nothing prunes
    val plain = tmpTable("prune5b")
    Snapshot.createOrReplace(data, plain)
    val noBloom = ScanPruning.pruneDir(spark, plain, point)
    assert(noBloom.kept.size > withBloom.kept.size,
      s"expected bloom to prune beyond min/max " +
        s"(${noBloom.kept.size} vs ${withBloom.kept.size})")
  }

  private def md5sum(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("merge-on-read composes: append sidecars prune per component, " +
    "delete sidecars always apply, result equals the plain filter") {
    val dir = tmpTable("prune4")
    Snapshot.createOrReplace(rows.toDF("k", "v", "s"), dir,
      keepVersions = 5)
    Snapshot.rewriteSorted(spark, dir, 8, Seq(col("k")),
      keepVersions = 5)
    // delete a row INSIDE the queried range, append one inside and
    // many outside
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((150L, 15.0, "s0150")).toDF("k", "v", "s")),
      appends = None, operation = "delete")
    Snapshot.morCommit(spark, dir, deletes = None,
      appends = Some((Seq((150L, -1.0, "fresh")) ++
        (2000 until 2500).map(i => (i.toLong, i.toDouble, s"x$i")))
        .toDF("k", "v", "s")),
      operation = "append")
    val ranges = Seq(ColumnRange("k", Some(100L), Some(199L)))
    val pruned = Snapshot.prunedRead(spark, dir, ranges)
      .as[(Long, Double, String)].collect().sortBy(r => (r._1, r._2))
    val full = Snapshot.read(spark, dir)
      .filter(col("k").between(100L, 199L))
      .as[(Long, Double, String)].collect().sortBy(r => (r._1, r._2))
    assert(pruned.toSeq == full.toSeq)
    assert(pruned.count(_._1 == 150L) == 1 &&
      pruned.find(_._1 == 150L).get._3 == "fresh",
      "the deleted base row must be gone and the appended twin present")
    // base pruning still effective under MOR
    assert(ScanPruning.pruneDir(spark, dir, ranges).kept.size <= 2)
  }
}
