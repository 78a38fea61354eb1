package graft.catalog

import graft.SparkSpec
import graft.pipeline.Snapshot
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** `ANALYZE TABLE … COMPUTE STATISTICS` pins: persistence + DESCRIBE
  * surface, version-gated staleness, and the plan-steering claim — a
  * merge-on-read table whose base files overstate the live state gets
  * the broadcast decision WRONG under default file-size estimation
  * and RIGHT after ANALYZE. */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(ns: String, t: String, rows: Int): String = {
    val dir = Files.createTempDirectory(s"an$t").toString + s"/$t"
    val df = (1 to rows).map(i => (i.toLong, s"s${i % 7}"))
      .toDF("id", "grp")
      .withColumn("payload", concat(sha2(col("id").cast("string"), 256),
        sha2((col("id") + 1).cast("string"), 256),
        sha2((col("id") + 2).cast("string"), 256),
        sha2((col("id") + 3).cast("string"), 256)))
    Snapshot.createOrReplace(df, dir, keepVersions = 3)
    new TableStore(spark).registerSnapshot(ns, t, dir)
    dir
  }

  test("ANALYZE persists row count, live-scaled size, and column " +
    "stats; DESCRIBE EXTENDED surfaces them; a new commit voids them") {
    TableStore.reset(spark)
    val dir = mkTable("an", "t1", 5000)
    spark.sql("ANALYZE TABLE an.t1 COMPUTE STATISTICS FOR ALL COLUMNS")
    val store = new TableStore(spark)
    val props = store.properties("an", "t1")
    assert(props(GraftStats.RowsKey) == "5000")
    assert(props(GraftStats.SizeKey).toLong > 0)
    assert(props.contains(s"${GraftStats.ColPrefix}id.ndv"))
    assert(props(s"${GraftStats.ColPrefix}id.min").toDouble == 1.0)
    assert(props(s"${GraftStats.ColPrefix}id.max").toDouble == 5000.0)
    assert(props(s"${GraftStats.ColPrefix}grp.nulls") == "0")
    val desc = spark.sql("DESCRIBE EXTENDED an.t1").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("Statistics").contains("5000 rows"),
      s"DESCRIBE must surface the stats: $desc")
    // stats are attached to the resolved plan while current …
    val est = spark.table("an.t1")
      .queryExecution.optimizedPlan.stats
    assert(est.sizeInBytes == BigInt(props(GraftStats.SizeKey)),
      s"plan estimate must follow ANALYZE: $est")
    // … and vanish the moment a commit moves the table (never stale)
    spark.sql("INSERT INTO an.t1 VALUES (9999999, 'x', 'p')")
    val after = spark.table("an.t1")
      .queryExecution.optimizedPlan.stats
    assert(after.sizeInBytes != BigInt(props(GraftStats.SizeKey)),
      s"stale stats must not attach after a commit: $after")
  }

  test("with CBO enabled the attached stats carry rowCount and " +
    "per-column attribute stats into the plan") {
    TableStore.reset(spark)
    mkTable("an", "t3", 2000)
    spark.sql("ANALYZE TABLE an.t3 COMPUTE STATISTICS FOR COLUMNS id, grp")
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val st = spark.table("an.t3").queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(2000)),
        s"CBO stats must carry the exact row count: $st")
      val byName = st.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.get("id").exists(_.distinctCount.isDefined),
        s"column stats must reach the plan under CBO: $byName")
      assert(byName.get("id").exists(_.min.contains(1L)),
        s"the integral min must round-trip typed: ${byName.get("id")}")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("DESCRIBE EXTENDED t col surfaces the persisted column stats " +
    "in Spark's (info_name, info_value) shape") {
    TableStore.reset(spark)
    mkTable("an", "t4", 1500)
    spark.sql("ANALYZE TABLE an.t4 COMPUTE STATISTICS FOR COLUMNS id")
    val rows = spark.sql("DESCRIBE EXTENDED an.t4 id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("col_name") == "id" && rows("data_type") == "bigint")
    assert(rows("min") == "1.0" && rows("max") == "1500.0", rows)
    assert(rows("num_nulls") == "0", rows)
    assert(rows("distinct_count") != null, rows)
    // un-analyzed column: stats rows present but NULL (native shape)
    val bare = spark.sql("DESCRIBE EXTENDED an.t4 grp").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bare("min") == null && bare("distinct_count") == null, bare)
    // non-extended: schema info only
    assert(spark.sql("DESCRIBE an.t4 id").count() == 3)
    intercept[IllegalArgumentException] {
      spark.sql("DESCRIBE an.t4 nope") }
  }

  test("graft.stats.auto-refresh keeps rowCount/size current across " +
    "commits (footer-exact), drops stale column stats, and skips when " +
    "delete sidecars make footers overstate") {
    TableStore.reset(spark)
    val dir = mkTable("an", "t5", 3000)
    val store = new TableStore(spark)
    store.setProperties("an", "t5",
      Map("graft.stats.auto-refresh" -> "true"))
    spark.sql("ANALYZE TABLE an.t5 COMPUTE STATISTICS FOR COLUMNS id")
    spark.sql("INSERT INTO an.t5 VALUES (9000001, 'x', 'p')")
    val props = store.properties("an", "t5")
    assert(props(GraftStats.RowsKey) == "3001",
      s"auto-refresh must re-stamp the exact footer count: $props")
    assert(!props.keys.exists(_.startsWith(GraftStats.ColPrefix)),
      "stale column stats must drop (run ANALYZE FOR COLUMNS anew)")
    // the refreshed stats still steer the plan (version matches live)
    val est = spark.table("an.t5").queryExecution.optimizedPlan.stats
    assert(est.sizeInBytes == BigInt(props(GraftStats.SizeKey)), est)
    // with MOR delete sidecars the footer path would overstate — skip
    spark.sql("""ALTER TABLE an.t5 SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read')""")
    spark.sql("DELETE FROM an.t5 WHERE id = 1")
    val after = store.properties("an", "t5")
    assert(after(GraftStats.RowsKey) == "3001",
      "a sidecar commit must not refresh from footers")
    // … and the stale stats void naturally (version moved past them):
    // the serving gate reports them non-current (the plan's default
    // file-size estimate may numerically coincide with the stamped
    // footer bytes, so the gate — not the number — is the pin)
    assert(GraftStats.currentStats(spark, "an", "t5", dir).isEmpty,
      "stats recorded for an older version must not be current")
  }

  test("incremental column stats: fast-append commits MERGE the " +
    "per-column stats forward (KMV sketch union), CBO keeps " +
    "receiving them, and the merged ndv stays within KMV error of a " +
    "fresh ANALYZE") {
    TableStore.reset(spark)
    mkTable("an", "t6", 3000)
    val store = new TableStore(spark)
    // merge-on-read mode: INSERT INTO commits fast-append sidecars —
    // the window shape the incremental merge consumes
    spark.sql("""ALTER TABLE an.t6 SET TBLPROPERTIES(
      'write.merge.mode'='merge-on-read',
      'graft.stats.auto-refresh'='true')""")
    spark.sql("ANALYZE TABLE an.t6 COMPUTE STATISTICS FOR COLUMNS id, grp")
    val P = GraftStats.ColPrefix
    val before = store.properties("an", "t6")
    assert(before.contains(s"${P}id.kmv"),
      "ANALYZE must persist the mergeable sketch")
    // three append commits: new ids extend the range and the ndv
    (1 to 3).foreach { b =>
      val vals = (1 to 500).map(i => s"(${3000 + (b - 1) * 500 + i}, " +
        s"'s${i % 7}', 'p$b')").mkString(", ")
      spark.sql(s"INSERT INTO an.t6 VALUES $vals")
    }
    val props = store.properties("an", "t6")
    assert(props(GraftStats.RowsKey) == "4500", props(GraftStats.RowsKey))
    assert(props.contains(s"${P}id.ndv"),
      "column stats must SURVIVE fast-append commits")
    assert(props(s"${P}id.max").toDouble == 4500.0,
      s"merged max must cover the appended range: ${props(s"${P}id.max")}")
    assert(props(s"${P}id.min").toDouble == 1.0)
    assert(props(s"${P}id.nulls") == "0")
    // the merged stats still attach to the base scan (on a
    // sidecar-laden table the read is a Union, so the CatalogTable
    // slot on the base LogicalRelation is the wiring under test —
    // rowCount cannot propagate through the sidecar Union's root)
    val lrs = spark.table("an.t6").queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.catalogTable.exists(_.stats.isDefined) => l
    }
    assert(lrs.nonEmpty, "merged stats must attach to the base scan")
    val cstats = lrs.head.catalogTable.get.stats.get
    assert(cstats.rowCount.contains(BigInt(4500)), cstats)
    assert(cstats.colStats.get("id").exists(_.distinctCount.isDefined),
      s"merged column stats must reach the CBO slot: ${cstats.colStats}")
    // the merged ndv tracks a FRESH ANALYZE within KMV error (k=256
    // → ~6% relative; allow 2/sqrt(k))
    val mergedNdv = props(s"${P}id.ndv").toDouble
    spark.sql("ANALYZE TABLE an.t6 COMPUTE STATISTICS FOR COLUMNS id, grp")
    val freshNdv = store.properties("an", "t6")(s"${P}id.ndv").toDouble
    assert(math.abs(mergedNdv - freshNdv) / freshNdv <= 2.0 / 16.0,
      s"merged ndv $mergedNdv must track fresh ANALYZE $freshNdv")
    // a low-cardinality column merges EXACTLY (fewer than k distinct
    // hashes: the sketch is the value set) — asserted on the MERGED
    // stats, before the fresh re-ANALYZE above could mask it
    assert(props(s"${P}grp.ndv").toDouble == 7.0, props(s"${P}grp.ndv"))
  }

  test("branch-scoped ANALYZE under spark.wap.branch: branch reads " +
    "are steered by branch stats, live reads keep live stats, " +
    "re-staging invalidates, and fast_forward promotes them to live") {
    TableStore.reset(spark)
    val dir = mkTable("an", "t7", 2000)
    val store = new TableStore(spark)
    spark.sql("ANALYZE TABLE an.t7 COMPUTE STATISTICS")
    assert(store.properties("an", "t7")(GraftStats.RowsKey) == "2000")
    val pre = GraftStats.branchPrefix("audit")
    try {
      spark.conf.set("spark.wap.branch", "audit")
      val vals = (1 to 500).map(i =>
        s"(${90000 + i}, 's${i % 7}', 'p')").mkString(", ")
      spark.sql(s"INSERT INTO an.t7 VALUES $vals") // stages the branch
      spark.sql("ANALYZE TABLE an.t7 COMPUTE STATISTICS FOR COLUMNS id")
      val props = store.properties("an", "t7")
      assert(props(s"${pre}rowCount") == "2500",
        s"branch ANALYZE must measure the STAGED content: $props")
      assert(props(GraftStats.RowsKey) == "2000",
        "branch ANALYZE must not touch the live stats")
      // the branch read's scan carries the branch stats
      val lrs = spark.table("an.t7").queryExecution.optimizedPlan
        .collect {
          case l: org.apache.spark.sql.execution.datasources
              .LogicalRelation
              if l.catalogTable.exists(_.stats.isDefined) => l
        }
      assert(lrs.nonEmpty, "branch stats must attach to the branch scan")
      assert(lrs.head.catalogTable.get.stats.get.rowCount
        .contains(BigInt(2500)))
      // a further WAP write RE-STAGES the branch — the recorded token
      // no longer matches and the stats stop serving (never stale)
      spark.sql("INSERT INTO an.t7 VALUES (999999, 'x', 'p')")
      assert(GraftStats.currentStats(spark, "an", "t7", dir).isEmpty,
        "re-staged branch must invalidate its scoped stats")
      spark.sql("ANALYZE TABLE an.t7 COMPUTE STATISTICS FOR COLUMNS id")
    } finally spark.conf.unset("spark.wap.branch")
    // outside the WAP session, LIVE stats (2000 rows) still serve —
    // the live version never moved while the branch staged
    assert(GraftStats.currentStats(spark, "an", "t7", dir)
      .exists(_(GraftStats.RowsKey) == "2000"))
    // publish: the content becomes live verbatim and the branch stats
    // promote with it (re-keyed live, stamped with the new version)
    spark.sql("CALL iceberg.system.fast_forward('an.t7', 'audit')")
    val after = store.properties("an", "t7")
    assert(after(GraftStats.RowsKey) == "2501",
      s"publish must promote the branch stats: $after")
    assert(after.contains(s"${GraftStats.ColPrefix}id.ndv"))
    assert(!after.keys.exists(_.startsWith(pre)),
      "consumed branch must leave no scoped keys behind")
    assert(after(GraftStats.VersionKey)
      == Snapshot.currentVersion(dir).get.toString)
    assert(GraftStats.currentStats(spark, "an", "t7", dir).isDefined,
      "the promoted stats must serve live reads")
  }

  test("fast_forward promotion CLEARS the pre-publish live stats: a " +
    "branch ANALYZE that measured fewer columns must not leave old " +
    "column stats stamped with the new version") {
    TableStore.reset(spark)
    val dir = mkTable("an", "t8", 1000)
    val store = new TableStore(spark)
    spark.sql("ANALYZE TABLE an.t8 COMPUTE STATISTICS FOR COLUMNS id")
    assert(store.properties("an", "t8")
      .contains(s"${GraftStats.ColPrefix}id.ndv"))
    try {
      spark.conf.set("spark.wap.branch", "b8")
      spark.sql("INSERT INTO an.t8 VALUES (777777, 'x', 'p')")
      // branch ANALYZE WITHOUT columns — promote carries no col stats
      spark.sql("ANALYZE TABLE an.t8 COMPUTE STATISTICS")
    } finally spark.conf.unset("spark.wap.branch")
    spark.sql("CALL iceberg.system.fast_forward('an.t8', 'b8')")
    val after = store.properties("an", "t8")
    assert(after(GraftStats.RowsKey) == "1001")
    assert(after(GraftStats.VersionKey)
      == Snapshot.currentVersion(dir).get.toString)
    assert(!after.keys.exists(_.startsWith(GraftStats.ColPrefix)),
      s"pre-publish column stats must not survive stamped current: " +
        s"${after.keys.filter(_.startsWith(GraftStats.ColPrefix))}")
  }

  test("a ZERO-ROW fast-append commit neither fails the statement " +
    "nor disturbs the merged column stats") {
    TableStore.reset(spark)
    mkTable("an", "t9", 500)
    val store = new TableStore(spark)
    spark.sql("""ALTER TABLE an.t9 SET TBLPROPERTIES(
      'write.merge.mode'='merge-on-read',
      'graft.stats.auto-refresh'='true')""")
    spark.sql("ANALYZE TABLE an.t9 COMPUTE STATISTICS FOR COLUMNS id")
    val before = store.properties("an", "t9")
    // the fast-append arm commits an empty appends sidecar; the
    // post-commit refresh must treat it as a zero delta
    spark.sql(
      "INSERT INTO an.t9 SELECT * FROM an.t9 WHERE id < 0")
    val after = store.properties("an", "t9")
    assert(after(s"${GraftStats.ColPrefix}id.ndv")
      == before(s"${GraftStats.ColPrefix}id.ndv"),
      "a zero-row append must leave the column stats unchanged")
    assert(after(GraftStats.RowsKey) == "500", after(GraftStats.RowsKey))
    assert(after(GraftStats.VersionKey)
      == Snapshot.currentVersion(
        store.snapshotPath("an", "t9").get).get.toString,
      "the stats must re-stamp current across the empty commit")
  }

  test("a NARROWER re-ANALYZE after commits REPLACES the stale stats " +
    "instead of re-stamping them with the new version") {
    TableStore.reset(spark)
    mkTable("an", "t10", 1000)
    val store = new TableStore(spark)
    spark.sql("ANALYZE TABLE an.t10 COMPUTE STATISTICS FOR COLUMNS id, grp")
    assert(store.properties("an", "t10")
      .contains(s"${GraftStats.ColPrefix}grp.ndv"))
    // the table moves (no auto-refresh: stats go stale, grp's describe
    // 1000 rows that no longer exist alone)
    spark.sql("INSERT INTO an.t10 VALUES (777777, 'zz', 'p')")
    spark.sql("ANALYZE TABLE an.t10 COMPUTE STATISTICS FOR COLUMNS id")
    val after = store.properties("an", "t10")
    assert(after(GraftStats.RowsKey) == "1001")
    assert(after.contains(s"${GraftStats.ColPrefix}id.ndv"))
    assert(!after.keys.exists(_.startsWith(s"${GraftStats.ColPrefix}grp.")),
      "grp's pre-commit stats must not revive under the new version: " +
        after.keys.filter(_.startsWith(GraftStats.ColPrefix)))
    // NOSCAN after another commit: size-only, the stale rowCount and
    // id stats must clear rather than re-stamp
    spark.sql("INSERT INTO an.t10 VALUES (777778, 'zz', 'p')")
    spark.sql("ANALYZE TABLE an.t10 COMPUTE STATISTICS NOSCAN")
    val noscan = store.properties("an", "t10")
    assert(!noscan.contains(GraftStats.RowsKey),
      "NOSCAN must not revive a stale row count")
    assert(!noscan.keys.exists(_.startsWith(GraftStats.ColPrefix)),
      "NOSCAN must not revive stale column stats")
    assert(noscan(GraftStats.SizeKey).toLong > 0)
  }

  test("incremental column ANALYZE at the SAME version merges: " +
    "FOR COLUMNS id then FOR COLUMNS grp serves both (Spark's " +
    "column-by-column analyze)") {
    TableStore.reset(spark)
    mkTable("an", "t11", 800)
    val store = new TableStore(spark)
    spark.sql("ANALYZE TABLE an.t11 COMPUTE STATISTICS FOR COLUMNS id")
    spark.sql("ANALYZE TABLE an.t11 COMPUTE STATISTICS FOR COLUMNS grp")
    val props = store.properties("an", "t11")
    assert(props.contains(s"${GraftStats.ColPrefix}id.ndv"),
      "still-current stats of the earlier ANALYZE must survive")
    assert(props.contains(s"${GraftStats.ColPrefix}grp.ndv"))
  }

  test("a VERSION-LESS table (registry frame) keeps Spark's merge " +
    "semantics: column-by-column ANALYZE accumulates, NOSCAN does " +
    "not destroy it (no staleness signal exists to justify a clear)") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    store.createNamespace("an")
    store.register("an", "t12",
      (1 to 500).map(i => (i.toLong, s"g${i % 5}")).toDF("id", "grp"))
    spark.sql("ANALYZE TABLE an.t12 COMPUTE STATISTICS FOR COLUMNS id")
    spark.sql("ANALYZE TABLE an.t12 COMPUTE STATISTICS FOR COLUMNS grp")
    val props = store.properties("an", "t12")
    assert(props.contains(s"${GraftStats.ColPrefix}id.ndv"),
      "the earlier column's stats must survive on a version-less table")
    assert(props.contains(s"${GraftStats.ColPrefix}grp.ndv"))
    spark.sql("ANALYZE TABLE an.t12 COMPUTE STATISTICS NOSCAN")
    val after = store.properties("an", "t12")
    assert(after.contains(s"${GraftStats.ColPrefix}id.ndv") &&
      after.contains(s"${GraftStats.ColPrefix}grp.ndv"),
      "NOSCAN on a version-less table must not clear accumulated stats")
  }

  test("NOSCAN records size only (no row count), Spark's contract") {
    TableStore.reset(spark)
    mkTable("an", "t2", 1000)
    spark.sql("ANALYZE TABLE an.t2 COMPUTE STATISTICS NOSCAN")
    val props = new TableStore(spark).properties("an", "t2")
    assert(props.contains(GraftStats.SizeKey))
    assert(!props.contains(GraftStats.RowsKey))
  }

  test("a 99%-deleted MOR table broadcasts only AFTER ANALYZE — the " +
    "default file-size estimate gets the join strategy wrong") {
    TableStore.reset(spark)
    val dir = mkTable("an", "fact", 300000)
    mkTable("an", "other", 300000)
    spark.sql("""ALTER TABLE an.fact SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.mor.deletes'='position')""")
    // live = 3000 rows; the base files keep all 300k on disk
    spark.sql("DELETE FROM an.fact WHERE id % 100 != 0")
    assert(Snapshot.morVersions(dir).nonEmpty, "delete must be MOR")
    assert(spark.table("an.fact").count() == 3000L)
    def staticPlan: String = {
      // both payloads flow through the join: column pruning must not
      // shrink either side's estimate below the broadcast threshold —
      // the decision rides on TABLE size, the quantity ANALYZE fixes.
      // The INITIAL (static) plan is the one under test: AQE can
      // runtime-convert to broadcast, but only AFTER paying the full
      // fact-side scan + shuffle — at 100 TB that shuffle IS the cost,
      // and ANALYZE is what removes it from the plan up front.
      val j = spark.table("an.other").as("o")
        .join(spark.table("an.fact").as("f"), $"o.id" === $"f.id")
        .groupBy($"f.grp").agg(count(lit(1)),
          max(length($"o.payload")), max(length($"f.payload")))
      j.queryExecution.executedPlan.toString
    }
    val pre = staticPlan
    assert(pre.contains("SortMergeJoin") ||
      pre.contains("ShuffledHashJoin"),
      s"pre-ANALYZE the 300k-file estimate must forbid broadcast:\n$pre")
    spark.sql("ANALYZE TABLE an.fact COMPUTE STATISTICS")
    val props = new TableStore(spark).properties("an", "fact")
    // the size must be live-scaled (~1% of the file bytes), the case
    // where raw file size is simply wrong
    val (bytes, fileRows) = Snapshot.dataFileStats(dir)
    assert(fileRows == 300000L)
    assert(props(GraftStats.SizeKey).toLong < bytes / 20,
      s"MOR-aware size must reflect the live fraction: $props vs $bytes")
    val post = staticPlan
    assert(!post.contains("SortMergeJoin") &&
      !post.contains("ShuffledHashJoin") &&
      post.contains("BroadcastHashJoin [id"),
      s"post-ANALYZE the live-sized side must broadcast STATICALLY " +
        s"(no fact-side exchange ever scheduled):\n$post")
  }
}
