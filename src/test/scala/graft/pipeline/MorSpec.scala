package graft.pipeline

import graft.SparkSpec
import graft.catalog.TableStore
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Merge-on-read sidecars: delta commits under `_mor/`, read-time
  * merge, time travel into a MOR run, and the
  * rewrite_position_delete_files compaction round-trip. */
class MorSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(tag: String): String =
    Files.createTempDirectory(tag).toString + "/t"

  /** Top-level parquet files of the BASE snapshot (names + mtimes) —
    * the invariant a MOR commit must not touch. */
  private def baseFiles(dir: String): Map[String, Long] = {
    val s = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    } finally s.close()
  }

  test("morCommit layers deletes/appends without touching base files; " +
    "reads merge in version order; duplicates and later-identical " +
    "appends keep exact multiset semantics") {
    val dir = tmpTable("mor1")
    // base v1 with a DUPLICATED row (2,"b")
    Snapshot.createOrReplace(
      Seq((1, "a"), (2, "b"), (2, "b"), (3, "c")).toDF("id", "tag"),
      dir, keepVersions = 5)
    val before = baseFiles(dir)

    // v2: equality-delete of (2,"b") removes BOTH instances
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((2, "b")).toDF("id", "tag")),
      appends = None, operation = "delete")
    assert(Snapshot.currentVersion(dir).contains(2L))
    assert(Snapshot.morVersions(dir) == Seq(2L))
    assert(Snapshot.read(spark, dir).as[(Int, String)].collect().toSet
      == Set((1, "a"), (3, "c")))

    // v3: append an IDENTICAL row to the one just deleted — the v2
    // delete must not reach forward to it
    Snapshot.morCommit(spark, dir,
      deletes = None,
      appends = Some(Seq((2, "b"), (4, "d")).toDF("id", "tag")),
      operation = "update")
    assert(Snapshot.read(spark, dir).as[(Int, String)].collect()
      .sorted.toSeq == Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))

    // base data files: byte-identical (same names, same mtimes)
    assert(baseFiles(dir) == before,
      "a merge-on-read commit must not rewrite base data files")

    // time travel INTO the MOR run, all served from the live dir
    assert(Snapshot.readAsOf(spark, dir, 1).count() == 4)
    assert(Snapshot.readAsOf(spark, dir, 2)
      .as[(Int, String)].collect().toSet == Set((1, "a"), (3, "c")))
    assert(Snapshot.readAsOf(spark, dir, 3).count() == 4)
    assert(Snapshot.retainedVersions(dir) == Seq(1L, 2L, 3L))

    // commit instants are per-version and non-decreasing
    val times = Seq(1L, 2L, 3L).map(Snapshot.committedAt(dir, _).get)
    assert(times == times.sorted)

    // TIMESTAMP AS OF between v2 and v3 resolves v2
    assert(Snapshot.readAsOfTimestamp(spark, dir,
      Snapshot.committedAt(dir, 2).get).count() == 2)
  }

  test("a copy-on-write commit on a MOR-laden table rolls the whole " +
    "dir into history; intermediate versions stay time-travelable; " +
    "tags on them protect the covering dir from expiry") {
    val dir = tmpTable("mor2")
    Snapshot.createOrReplace(Seq(1, 2, 3).toDF("x"), dir,
      keepVersions = 5)
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq(3).toDF("x")), appends = None, "delete")
    // CoW commit at v3: the dir covering [1,2] becomes `.v2`
    Snapshot.createOrReplace(Seq(9).toDF("x"), dir, keepVersions = 5)
    assert(Snapshot.currentVersion(dir).contains(3L))
    assert(Snapshot.historicalVersions(dir) == Seq(2L))
    assert(Snapshot.retainedVersions(dir) == Seq(1L, 2L, 3L))
    assert(Snapshot.readAsOf(spark, dir, 1).as[Int].collect().toSet
      == Set(1, 2, 3))
    assert(Snapshot.readAsOf(spark, dir, 2).as[Int].collect().toSet
      == Set(1, 2))
    assert(Snapshot.readAsOf(spark, dir, 3).as[Int].collect().toSeq
      == Seq(9))

    // tag the INTERMEDIATE v1 (covered by the .v2 dir) and expire:
    // the covering dir must survive, and the tag must stay readable
    Snapshot.createTag(dir, "pre_delete", 1L)
    assert(Snapshot.expireSnapshots(dir, retainLast = 0).isEmpty)
    assert(Snapshot.readAsOfTag(spark, dir, "pre_delete").count() == 3)
    Snapshot.dropTag(dir, "pre_delete")
    assert(Snapshot.expireSnapshots(dir, retainLast = 0) == Seq(2L))
  }

  test("rewritePositionDeletes compacts sidecars into one CoW commit: " +
    "content unchanged, merge cost gone, MOR history retained") {
    val dir = tmpTable("mor3")
    Snapshot.createOrReplace(
      (1 to 100).map(i => (i, s"r$i")).toDF("id", "tag"), dir,
      keepVersions = 5)
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((7, "r7"), (8, "r8")).toDF("id", "tag")),
      appends = None, "delete")
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((9, "r9")).toDF("id", "tag")),
      appends = Some(Seq((101, "new")).toDF("id", "tag")), "update")
    val want = Snapshot.read(spark, dir).as[(Int, String)]
      .collect().sortBy(_._1).toSeq

    val (collapsed, ver) = Snapshot.rewritePositionDeletes(spark, dir,
      keepVersions = 5)
    assert(collapsed >= 2L, s"expected >=2 delete files, got $collapsed")
    assert(ver == 4L)
    assert(Snapshot.morVersions(dir).isEmpty,
      "live dir must be pure copy-on-write after the rewrite")
    assert(Snapshot.read(spark, dir).as[(Int, String)]
      .collect().sortBy(_._1).toSeq == want)
    // the MOR run is history now, still travelable mid-run
    assert(Snapshot.readAsOf(spark, dir, 2).count() == 98)
    assert(Snapshot.readAsOf(spark, dir, 3).count() == 98)
    // idempotent on a clean table
    assert(Snapshot.rewritePositionDeletes(spark, dir, 5) == ((0L, 4L)))
  }

  test("plan pins: the equality-delete anti-join BROADCASTS its tiny " +
    "build side, and a source-column filter on a transform-partitioned " +
    "table still pushes to the scan (row-group pruning composes)") {
    // MOR read plan: base scan LEFT ANTI delete-sidecar — the delete
    // frame is KBs, so AQE must broadcast it, never shuffle the table
    val dir = tmpTable("morplan")
    Snapshot.createOrReplace(
      (1 to 20000).map(i => (i.toLong, s"p$i")).toDF("id", "tag"),
      dir, keepVersions = 2)
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((7L, "p7"), (8L, "p8")).toDF("id", "tag")),
      appends = None, "delete")
    val read = Snapshot.read(spark, dir)
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      s"the MOR merge must be a broadcast anti-join:\n$plan")

    // hidden partitioning: the derived field is invisible, but a
    // filter on the SOURCE column still reaches the scan as a pushed
    // filter — with days()/years() clustering, parquet min/max stats
    // prune the same files directory pruning would have
    val pdir = tmpTable("ptplan")
    Snapshot.setPartitionSpec(pdir, Seq("bucket(4,id)"))
    Snapshot.createOrReplaceCurrentSpec(
      (1 to 20000).map(i => (i.toLong, s"p$i")).toDF("id", "tag"), pdir)
    val filtered = Snapshot.read(spark, pdir).filter(col("id") === 42L)
    // formatted explain carries the PushedFilters detail
    val explained = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters") &&
      explained.contains("EqualTo(id,42)"),
      s"source-column filter must push to the scan:\n$explained")
    assert(filtered.count() == 1L)
  }

  test("DROP PARTITION FIELD on a transform keeps the retired derived " +
    "field HIDDEN (tombstoned), so reads stay clean and MOR sidecars " +
    "keep union-matching; a markerless adopted table falls back to CoW") {
    TableStore.reset(spark)
    val dir = tmpTable("mortomb")
    Snapshot.setPartitionSpec(dir, Seq("bucket(4,id)"))
    Snapshot.createOrReplaceCurrentSpec(
      (1 to 40).map(i => (i.toLong, s"p$i")).toDF("id", "tag"), dir,
      keepVersions = 2)
    new TableStore(spark).registerSnapshot("tomb", "t", dir)
    spark.sql("""ALTER TABLE tomb.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read')""")
    spark.sql("DELETE FROM tomb.t WHERE id = 3")
    assert(Snapshot.morVersions(dir).nonEmpty)
    // retire the transform — metadata-only; id_bucket fragments remain
    // physically in the already-written files
    spark.sql("ALTER TABLE tomb.t DROP PARTITION FIELD bucket(4, id)")
    assert(Snapshot.partitionSpec(dir).isEmpty)
    // reads must neither leak id_bucket nor break the sidecar merge
    val after = spark.sql("SELECT * FROM tomb.t")
    assert(after.columns.toSeq.sorted == Seq("id", "tag"),
      s"retired derived field leaked: ${after.columns.toSeq}")
    assert(after.count() == 39L)

    // adopted markerless dir (register_table over plain parquet) with
    // the MOR property: DML falls back to copy-on-write instead of
    // crashing on a base-less morCommit
    val plain = Files.createTempDirectory("morplain").toString + "/p"
    (1 to 10).map(i => (i, s"x$i")).toDF("id", "tag")
      .write.parquet(plain)
    spark.sql(s"""CALL iceberg.system.register_table(
      table => 'tomb.adopted', metadata_file => '$plain')""")
    spark.sql("""ALTER TABLE tomb.adopted SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read')""")
    spark.sql("DELETE FROM tomb.adopted WHERE id = 1")
    assert(spark.sql("SELECT count(*) FROM tomb.adopted")
      .head().getLong(0) == 9L)
    assert(Snapshot.morVersions(plain).isEmpty,
      "a markerless table must take the CoW fallback")
  }

  test("a partitioned table KEEPS its layout through row-level DML " +
    "and MOR compaction (spec-aware commits, never a flat rewrite)") {
    TableStore.reset(spark)
    val dir = tmpTable("morpart")
    Snapshot.setPartitionSpec(dir, Seq("grp"))
    Snapshot.createOrReplaceCurrentSpec(
      (1 to 40).map(i => (i.toLong, s"g${i % 4}", s"p$i"))
        .toDF("id", "grp", "payload"),
      dir, keepVersions = 3)
    new TableStore(spark).registerSnapshot("mp", "t", dir)
    val frags = spark.sql("SHOW PARTITIONS mp.t")
      .as[String].collect().toSet
    assert(frags == Set("grp=g0", "grp=g1", "grp=g2", "grp=g3"))

    // copy-on-write UPDATE (no MOR property): the commit re-lays the
    // partition dirs
    spark.sql("UPDATE mp.t SET payload = concat(payload, '!') " +
      "WHERE grp = 'g1'")
    assert(spark.sql("SHOW PARTITIONS mp.t")
      .as[String].collect().toSet == frags,
      "CoW DML must keep the Hive layout")

    // MOR delete + compaction: sidecar first, layout restored by the
    // spec-aware rewrite
    spark.sql("""ALTER TABLE mp.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read')""")
    spark.sql("DELETE FROM mp.t WHERE id = 3")
    assert(Snapshot.morVersions(dir).nonEmpty)
    spark.sql("CALL iceberg.system.rewrite_position_delete_files(" +
      "table => 'mp.t')")
    assert(Snapshot.morVersions(dir).isEmpty)
    assert(spark.sql("SHOW PARTITIONS mp.t")
      .as[String].collect().toSet == frags,
      "MOR compaction must keep the Hive layout")
    assert(spark.sql("SELECT count(*) FROM mp.t")
      .head().getLong(0) == 39L)
  }

  test("erase purges the subject from MOR sidecars too (equality-" +
    "delete files carry row content) and keeps commit instants") {
    val dir = tmpTable("mor4")
    Snapshot.createOrReplace(
      Seq((1, "keep"), (2, "subject"), (3, "keep2")).toDF("id", "who"),
      dir, keepVersions = 5)
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((2, "subject")).toDF("id", "who")),
      appends = Some(Seq((2, "subject"), (4, "x")).toDF("id", "who")),
      "update")
    val t2 = Snapshot.committedAt(dir, 2).get
    Snapshot.erase(spark, dir, col("who") === "subject")
    // live content: subject gone (was only re-appended by the update)
    assert(Snapshot.read(spark, dir).as[(Int, String)].collect().toSet
      == Set((1, "keep"), (3, "keep2"), (4, "x")))
    // the sidecar parquet no longer carries the subject's row content
    val morRows = spark.read.parquet(s"$dir/_mor/v2/deletes")
      .unionByName(spark.read.parquet(s"$dir/_mor/v2/appends"))
    assert(morRows.filter(col("who") === "subject").isEmpty)
    // commit instants preserved (erasure rewrites content, not clocks)
    assert(Snapshot.committedAt(dir, 2).contains(t2))
    // v1 history also purged
    assert(Snapshot.readAsOf(spark, dir, 1)
      .filter(col("who") === "subject").isEmpty)
  }

  test("DML routes through MOR when write.<op>.mode=merge-on-read: " +
    "results identical to the copy-on-write twin, deltas tiny, WAP " +
    "branch still takes the staging path") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val src = (1 to 50).map(i =>
      (i.toLong, i % 5, s"p$i")).toDF("id", "grp", "payload")

    val cow = tmpTable("morcow"); val mor = tmpTable("mormor")
    Snapshot.createOrReplace(src, cow, keepVersions = 5)
    Snapshot.createOrReplace(src, mor, keepVersions = 5)
    store.registerSnapshot("twin", "cow", cow)
    store.registerSnapshot("twin", "mor", mor)
    spark.sql("""ALTER TABLE twin.mor SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.update.mode'='merge-on-read',
      'write.merge.mode'='merge-on-read')""")

    Seq("twin.cow", "twin.mor").foreach { t =>
      spark.sql(s"DELETE FROM $t WHERE grp = 0")
      spark.sql(s"UPDATE $t SET payload = concat(payload, '!') " +
        "WHERE grp = 1")
      spark.sql(s"""MERGE INTO $t x USING (
          SELECT id AS k, concat('m', id) AS np FROM range(46, 55)
        ) s ON x.id = s.k
        WHEN MATCHED AND x.grp = 2 THEN DELETE
        WHEN MATCHED THEN UPDATE SET payload = s.np
        WHEN NOT MATCHED THEN INSERT (id, grp, payload)
          VALUES (s.k, CAST(9 AS INT), s.np)""")
      // plain INSERT INTO: the MOR table takes the FAST-APPEND sidecar
      // path (Iceberg's appends-never-rewrite), the CoW twin rewrites
      spark.sql(s"INSERT INTO $t VALUES (CAST(200 AS BIGINT), 7, 'ins')")
    }
    val a = spark.sql("SELECT * FROM twin.cow ORDER BY id")
      .collect().toSeq
    val b = spark.sql("SELECT * FROM twin.mor ORDER BY id")
      .collect().toSeq
    assert(a == b, "MOR DML must read back identical to copy-on-write")

    // MOR table took the sidecar path: 4 stacked commits, base intact
    assert(Snapshot.morVersions(mor) == Seq(2L, 3L, 4L, 5L))
    assert(Snapshot.operationOf(mor, 5L).contains("append"))
    // CoW table rewrote: no sidecars, version also at 5
    assert(Snapshot.morVersions(cow).isEmpty)
    assert(Snapshot.currentVersion(cow).contains(5L))

    // metadata tables see the MOR commits as first-class rows
    val hist = spark.sql(
      "SELECT version, is_current FROM twin.mor.history ORDER BY 1")
      .as[(Long, Boolean)].collect().toSeq
    assert(hist == Seq((1L, false), (2L, false), (3L, false),
      (4L, false), (5L, true)))

    // .delete_files (Iceberg's table of the same name): equality
    // deletes (content 2) summing to the 24 distinct rows the
    // DELETE (10) + UPDATE (10) + MERGE (4 matched) removed
    val delFiles = spark.sql(
      "SELECT content, record_count FROM twin.mor.delete_files")
      .as[(Int, Long)].collect()
    assert(delFiles.nonEmpty && delFiles.forall(_._1 == 2))
    assert(delFiles.map(_._2).sum == 24L,
      s"expected 24 equality-delete rows, got ${delFiles.toSeq}")
    val snaps = spark.sql("SELECT version, record_count FROM " +
      "twin.mor.snapshots ORDER BY version")
      .as[(Long, Long)].collect().toMap
    // record_count counts DATA-file rows (base + appends, deletes are
    // not subtracted — Iceberg's total-records semantics)
    assert(snaps(1L) == 50L)
    assert(snaps(2L) == 50L)      // delete sidecar adds no data file
    assert(snaps(3L) > 50L)       // update appended rewritten rows
    // .files lists append sidecar files beside the base files
    val files = spark.sql("SELECT file_path FROM twin.mor.files")
      .as[String].collect()
    assert(files.exists(_.contains("/_mor/")),
      ".files must list merge-on-read append files")
    assert(files.exists(!_.contains("/_mor/")))

    // lineage sees the MOR commits: newest-first, all five versions
    val anc = spark.sql(
      "CALL iceberg.system.ancestors_of(table => 'twin.mor')")
      .select("snapshot_id").as[Long].collect().toSeq
    assert(anc == Seq(5L, 4L, 3L, 2L, 1L))

    // compaction through the verbatim CALL surface
    val res = spark.sql("CALL iceberg.system." +
      "rewrite_position_delete_files(table => 'twin.mor')")
      .collect().head
    assert(res.getLong(0) >= 2L && res.getLong(1) == 0L)
    assert(Snapshot.morVersions(mor).isEmpty)
    assert(spark.sql("SELECT count(*) FROM twin.mor.delete_files")
      .head().getLong(0) == 0L,
      "a compacted table has no delete files")
    assert(spark.sql("SELECT * FROM twin.mor ORDER BY id")
      .collect().toSeq == a)

    // a WAP session overrides MOR: the write stages a whole branch
    spark.conf.set("spark.wap.branch", "audit_b")
    try {
      spark.sql("DELETE FROM twin.mor WHERE grp = 3")
      assert(Snapshot.morVersions(mor).isEmpty,
        "WAP writes must stage a branch, not a MOR sidecar")
      assert(Snapshot.branches(mor) == Seq("audit_b"))
    } finally {
      spark.conf.unset("spark.wap.branch")
      Snapshot.dropBranch(mor, "audit_b")
    }
  }

  test("position deletes address (file, pos) pairs; relative ids " +
    "survive the dir's rename into history; append-file rows are " +
    "addressable; base files stay byte-identical") {
    val dir = tmpTable("morp1")
    Snapshot.createOrReplace(
      (1 to 10).map(i => (i, s"r$i")).toDF("id", "tag"), dir,
      keepVersions = 6)
    val before = baseFiles(dir)
    val lin = Snapshot.readLineage(spark, dir)
    assert(lin.columns.contains(Snapshot.LineageFile) &&
      lin.columns.contains(Snapshot.LineagePos))
    // lineage ids are RELATIVE (no scheme, no leading slash)
    assert(lin.select(Snapshot.LineageFile).as[String].collect()
      .forall(f => !f.contains("/") && f.endsWith(".parquet")))

    // v2: position-delete the even ids
    Snapshot.morCommit(spark, dir, None, None, "delete",
      posDeletes = Some(lin.filter($"id" % 2 === 0)
        .select(Snapshot.LineageFile, Snapshot.LineagePos)))
    assert(Snapshot.morVersions(dir) == Seq(2L))
    assert(baseFiles(dir) == before,
      "a position-delete commit must not rewrite base data files")
    assert(Snapshot.read(spark, dir).select("id").as[Int]
      .collect().toSet == Set(1, 3, 5, 7, 9))

    // v3: append; v4: position-delete a row FROM THE APPEND FILE
    Snapshot.morCommit(spark, dir, None,
      Some(Seq((11, "r11"), (12, "r12")).toDF("id", "tag")), "update")
    val lin2 = Snapshot.readLineage(spark, dir)
    assert(lin2.filter($"id" === 11)
      .select(Snapshot.LineageFile).as[String].head()
      .startsWith("_mor/v3/appends/"))
    Snapshot.morCommit(spark, dir, None, None, "delete",
      posDeletes = Some(lin2.filter($"id" === 11)
        .select(Snapshot.LineageFile, Snapshot.LineagePos)))
    assert(Snapshot.read(spark, dir).select("id").as[Int]
      .collect().toSet == Set(1, 3, 5, 7, 9, 12))
    assert(Snapshot.posDeleteDirsAsOf(dir, 4L).size == 2)

    // CoW commit rolls the sidecar-laden dir into history (an atomic
    // RENAME) — travel back through it: the relative ids must still
    // resolve against the moved files
    Snapshot.createOrReplace(Seq((99, "z")).toDF("id", "tag"), dir,
      keepVersions = 6)
    assert(Snapshot.readAsOf(spark, dir, 2).select("id").as[Int]
      .collect().toSet == Set(1, 3, 5, 7, 9))
    assert(Snapshot.readAsOf(spark, dir, 4).select("id").as[Int]
      .collect().toSet == Set(1, 3, 5, 7, 9, 12))
    assert(Snapshot.readAsOf(spark, dir, 1).count() == 10)
  }

  test("position and equality sidecars stack on one table; DML routes " +
    "by write.mor.deletes; .delete_files labels content 1 vs 2") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val dir = tmpTable("morp2")
    Snapshot.createOrReplace(
      (1 to 30).map(i => (i.toLong, i % 3, s"p$i"))
        .toDF("id", "grp", "payload"), dir, keepVersions = 6)
    store.registerSnapshot("posns", "t", dir)
    spark.sql("""ALTER TABLE posns.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.update.mode'='merge-on-read',
      'write.mor.deletes'='position')""")
    spark.sql("DELETE FROM posns.t WHERE grp = 0")
    spark.sql("UPDATE posns.t SET payload = concat(payload, '!') " +
      "WHERE grp = 1")
    assert(Snapshot.posDeleteDirsAsOf(dir, 3L).size == 2 &&
      Snapshot.deleteDirsAsOf(dir, 3L).isEmpty,
      "position format must write pos_deletes sidecars only")
    // flip the format: the next DELETE stacks an EQUALITY sidecar on
    // the same table; both arms apply on read
    spark.sql("ALTER TABLE posns.t SET TBLPROPERTIES(" +
      "'write.mor.deletes'='equality')")
    spark.sql("DELETE FROM posns.t WHERE id = 4")
    assert(Snapshot.deleteDirsAsOf(dir, 4L).size == 1)
    val got = spark.sql("SELECT id, payload FROM posns.t ORDER BY id")
      .as[(Long, String)].collect().toSeq
    val want = (1 to 30).filter(i => i % 3 != 0 && i != 4)
      .map(i => (i.toLong, if (i % 3 == 1) s"p$i!" else s"p$i"))
    assert(got == want)
    val delFiles = spark.sql(
      "SELECT content, record_count FROM posns.t.delete_files")
      .as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(delFiles.map(_._1).distinct == Seq(1, 2),
      s"both delete-file kinds must list: $delFiles")
    // compaction collapses both arms
    spark.sql("CALL iceberg.system.rewrite_position_delete_files(" +
      "table => 'posns.t')")
    assert(Snapshot.morVersions(dir).isEmpty)
    assert(spark.sql("SELECT id, payload FROM posns.t ORDER BY id")
      .as[(Long, String)].collect().toSeq == want)
  }

  test("position deletes on a PARTITIONED table carry the fragment " +
    "dir in the file id — Spark reuses part-file basenames across " +
    "fragments, so a bare basename would conflate files") {
    val dir = tmpTable("morp4")
    // partitionBy(grp): the same task writes the same part-file NAME
    // into both fragment dirs — the collision under test
    Snapshot.createOrReplacePartitioned(
      (1 to 20).map(i => (i, i % 2, s"r$i")).toDF("id", "grp", "tag"),
      dir, Seq("grp"), keepVersions = 4)
    val lin = Snapshot.readLineage(spark, dir)
    val ids = lin.select(Snapshot.LineageFile).distinct()
      .as[String].collect().toSeq
    assert(ids.forall(_.contains("grp=")),
      s"partitioned lineage ids must keep the fragment dir: $ids")
    // delete the even ids of ONE partition only
    Snapshot.morCommit(spark, dir, None, None, "delete",
      posDeletes = Some(lin.filter($"grp" === 0 && $"id" <= 10)
        .select(Snapshot.LineageFile, Snapshot.LineagePos)))
    val left = Snapshot.read(spark, dir).select("id").as[Int]
      .collect().toSet
    assert(left == (1 to 20).toSet -- Set(2, 4, 6, 8, 10),
      "rows of the untouched partition must survive basename collisions")
  }

  test("prunedRead applies position sidecars: a stats-pruned scan " +
    "equals read().filter on a position-delete table") {
    val dir = tmpTable("morp5")
    Snapshot.createOrReplace(
      (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "tag"), dir,
      keepVersions = 3)
    val lin = Snapshot.readLineage(spark, dir)
    Snapshot.morCommit(spark, dir, None, None, "delete",
      posDeletes = Some(lin.filter($"id".between(100, 120))
        .select(Snapshot.LineageFile, Snapshot.LineagePos)))
    val ranges = Seq(ScanPruning.ColumnRange("id", Some(90L), Some(130L)))
    val pruned = Snapshot.prunedRead(spark, dir, ranges)
      .select("id").as[Long].collect().toSet
    val plain = Snapshot.read(spark, dir)
      .filter($"id" >= 90 && $"id" <= 130)
      .select("id").as[Long].collect().toSet
    assert(pruned == plain)
    assert(!pruned.contains(110L), "pruned scans must not resurrect " +
      "position-deleted rows")
  }

  test("write.mor.compact-after-commits auto-compacts at the " +
    "threshold: the Nth commit triggers the rewrite, reads identical " +
    "before/after, history intact") {
    TableStore.reset(spark)
    val dir = tmpTable("morauto")
    Snapshot.createOrReplace(
      (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "tag"), dir,
      keepVersions = 10)
    new TableStore(spark).registerSnapshot("morauto", "t", dir)
    spark.sql("""ALTER TABLE morauto.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.mor.compact-after-commits'='3')""")
    spark.sql("DELETE FROM morauto.t WHERE id = 1")
    spark.sql("DELETE FROM morauto.t WHERE id = 2")
    assert(Snapshot.morVersions(dir).size == 2,
      "below the threshold nothing compacts")
    val before = spark.sql("SELECT * FROM morauto.t")
      .as[(Long, String)].collect().toSet
    // the 3rd MOR commit reaches the threshold -> auto-compaction
    spark.sql("DELETE FROM morauto.t WHERE id = 3")
    assert(Snapshot.morVersions(dir).isEmpty,
      "the threshold commit must trigger the rewrite")
    val after = spark.sql("SELECT * FROM morauto.t")
      .as[(Long, String)].collect().toSet
    assert(after == before - ((3L, "v3")))
    assert(after.size == 497)
    // the pre-compaction MOR run stays time-travelable
    assert(Snapshot.readAsOf(spark, dir, 2).count() == 499)
    // and the cycle restarts: stacking resumes from zero
    spark.sql("DELETE FROM morauto.t WHERE id = 4")
    assert(Snapshot.morVersions(dir).size == 1)
  }

  test("IDENTIFIER FIELDS shrink equality-delete files to the id " +
    "columns (Iceberg equality_ids); key-scoped removal; mixed-schema " +
    "delete stacks read correctly") {
    TableStore.reset(spark)
    val dir = tmpTable("morident")
    Snapshot.createOrReplace(
      ((1 to 50).map(i => (i.toLong, s"v$i")) ++
        Seq((100L, "dupA"), (100L, "dupB"))).toDF("id", "tag"), dir,
      keepVersions = 5)
    new TableStore(spark).registerSnapshot("mi", "t", dir)
    spark.sql("""ALTER TABLE mi.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.update.mode'='merge-on-read')""")
    // no identifier fields yet: full-row delete file
    spark.sql("DELETE FROM mi.t WHERE id = 1")
    val v1 = spark.read.parquet(s"$dir/_mor/v2/deletes")
    assert(v1.columns.toSeq.sorted == Seq("id", "tag"),
      "without identifier fields the delete file is full-row")
    // with identifier fields: the delete file carries ONLY the ids
    spark.sql("ALTER TABLE mi.t SET IDENTIFIER FIELDS id")
    spark.sql("DELETE FROM mi.t WHERE id = 2")
    val v2 = spark.read.parquet(s"$dir/_mor/v3/deletes")
    assert(v2.columns.toSeq == Seq("id"),
      s"identifier fields must project the delete file: ${v2.columns.toSeq}")
    // MIXED stack (one full-row file + one key-only file) reads right
    assert(spark.sql("SELECT count(*) FROM mi.t").head.getLong(0) == 50L)
    // key-scoped semantics (the Iceberg contract SET IDENTIFIER FIELDS
    // asserts): deleting by a predicate that matches ONE duplicate
    // removes EVERY row carrying the key
    spark.sql("DELETE FROM mi.t WHERE tag = 'dupA'")
    assert(spark.sql("SELECT count(*) FROM mi.t WHERE id = 100")
      .head.getLong(0) == 0L,
      "key-scoped equality delete removes all instances of the key")
    // UPDATE decomposes as key-delete + append under the same shape
    spark.sql("UPDATE mi.t SET tag = 'x' WHERE id = 3")
    assert(spark.sql("SELECT tag FROM mi.t WHERE id = 3")
      .head.getString(0) == "x")
    assert(spark.sql("SELECT count(*) FROM mi.t").head.getLong(0) == 48L)
    // compaction collapses the mixed stack to the same state
    spark.sql("CALL system.rewrite_position_delete_files('mi.t')")
    assert(Snapshot.morVersions(dir).isEmpty)
    assert(spark.sql("SELECT count(*) FROM mi.t").head.getLong(0) == 48L)
    assert(spark.sql("SELECT tag FROM mi.t WHERE id = 3")
      .head.getString(0) == "x")
  }

  test("morStats censuses sidecars per kind; compaction zeroes it") {
    val dir = tmpTable("morst")
    Snapshot.createOrReplace(
      (1 to 50).map(i => (i, s"r$i")).toDF("id", "tag"), dir,
      keepVersions = 4)
    Snapshot.morCommit(spark, dir,
      deletes = Some(Seq((7, "r7"), (8, "r8")).toDF("id", "tag")),
      appends = Some(Seq((51, "n")).toDF("id", "tag")), "update")
    val lin = Snapshot.readLineage(spark, dir)
    Snapshot.morCommit(spark, dir, None, None, "delete",
      posDeletes = Some(lin.filter($"id" <= 3)
        .select(Snapshot.LineageFile, Snapshot.LineagePos)))
    val stats = Snapshot.morStats(dir).toMap
    assert(stats("mor_commits") == 2L)
    assert(stats("equality_delete_rows") == 2L)
    assert(stats("position_delete_pairs") == 3L)
    assert(stats("append_rows") == 1L)
    assert(stats("equality_delete_files") >= 1L &&
      stats("position_delete_files") >= 1L)
    Snapshot.rewritePositionDeletes(spark, dir, keepVersions = 4)
    assert(Snapshot.morStats(dir).forall(_._2 == 0L))
  }

  test("erase converts position sidecars to equality rows so the GDPR " +
    "rewrite cannot orphan (file, pos) pairs; non-subject deletions " +
    "stay effective across live and history") {
    val dir = tmpTable("morp3")
    Snapshot.createOrReplace(
      (1 to 20).map(i => (i, i % 7, s"u$i")).toDF("id", "subj", "tag"),
      dir, keepVersions = 6)
    val lin = Snapshot.readLineage(spark, dir)
    Snapshot.morCommit(spark, dir, None, None, "delete",
      posDeletes = Some(lin.filter($"id" <= 5)
        .select(Snapshot.LineageFile, Snapshot.LineagePos)))
    assert(Snapshot.read(spark, dir).count() == 15)
    // GDPR: purge subj=3 everywhere (ids 3, 10, 17; id 3 was already
    // position-deleted)
    Snapshot.erase(spark, dir, $"subj" === 3)
    // the erased subject is gone AND the position deletions survive
    // the file rewrite (as converted equality rows)
    assert(Snapshot.read(spark, dir).select("id").as[Int]
      .collect().toSet == (6 to 20).filterNot(i => i % 7 == 3).toSet)
    // v1 (pre-delete) history keeps everything except the subject
    assert(Snapshot.readAsOf(spark, dir, 1).select("id").as[Int]
      .collect().toSet == (1 to 20).filterNot(i => i % 7 == 3).toSet)
    // no position sidecar remains anywhere under the table dir
    assert(Snapshot.posDeleteDirsAsOf(dir,
      Snapshot.currentVersion(dir).get).isEmpty)
  }
}
