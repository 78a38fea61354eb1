package graft.catalog

import graft.SparkSpec
import graft.pipeline.Snapshot
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** CREATE/REFRESH/DROP MATERIALIZED VIEW pins: the MV name serves the
  * defining query FROM THE GOLD STORE while fresh and from the base
  * table when stale (never wrong, only slower), REFRESH re-arms it at
  * O(window delta), non-derivable defining queries fail CREATE with
  * guidance (and leave no debris), and DROP removes the view, the
  * storage registration, and the rollup directory. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def scans(df: DataFrame, dir: String): Boolean =
    df.queryExecution.optimizedPlan.collectLeaves().exists {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation =>
          f.location.rootPaths.map(_.toUri.getPath).exists(p =>
            p == dir || p.startsWith(s"$dir/"))
        case _ => false
      }
      case _ => false
    }

  private def answers(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def fixture(): (String, DataFrame) = {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("mvddl").toString
    val dir = s"$root/facts"
    val facts = (1 to 400).map(i => (i.toLong, s"g${i % 4}",
      s"r${i % 2}", (i % 13).toLong, i.toDouble))
      .toDF("id", "grp", "region", "qty", "amount")
    Snapshot.createOrReplace(facts, dir, keepVersions = 2)
    store.registerSnapshot("mvx", "facts", dir)
    (dir, facts)
  }

  private def recompute(): Set[Seq[Any]] = {
    spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
    try answers(spark.sql("""SELECT grp, count(*) AS c, sum(qty) AS q,
      count(qty) AS cq, avg(qty) AS a, min(amount) AS mn,
      max(amount) AS mx FROM mvx.facts GROUP BY grp"""))
    finally spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
  }

  test("the MV lifecycle: CREATE serves reads from gold while fresh, " +
    "a stale MV falls back to the base (correct, not stale-served), " +
    "REFRESH re-arms, DROP removes view + storage + directory") {
    val (dir, _) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.daily AS
      SELECT grp, count(*) AS c, sum(qty) AS q, count(qty) AS cq,
             avg(qty) AS a, min(amount) AS mn, max(amount) AS mx
      FROM mvx.facts GROUP BY grp""").collect()
    val ruDir = new TableStore(spark)
      .properties("mvx", "daily__storage")("graft.rollup.dir")
    assert(Files.exists(Paths.get(ruDir)))

    val fresh = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(fresh, ruDir) && !scans(fresh, dir),
      "a fresh MV must serve the defining query from the gold store")
    assert(answers(fresh) == recompute())

    // base moves → the MV is STALE: reads COMPENSATE (r18) — the
    // rewrite serves store ⊎ signed window delta, still the exact
    // live answer (Trino would serve the stale store, wrong; through
    // r17 this engine fell back to a full base scan)
    Snapshot.morCommit(spark, dir, deletes = None,
      appends = Some(Seq((9001L, "g9", "r1", 5L, 5.0),
          (9002L, "g1", "r0", 7L, 7.0))
        .toDF("id", "grp", "region", "qty", "amount")),
      operation = "append")
    val stale = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(stale, ruDir),
      "a priceably-stale MV must serve by compensation")
    assert(answers(stale) == recompute(),
      "the compensated answer includes the new rows")
    // with the staleness budget off, the pre-r18 base fallback
    spark.conf.set("spark.graft.mv.maxStalenessCommits", "0")
    try {
      val off = spark.sql("SELECT * FROM mvx.daily")
      assert(!scans(off, ruDir) && scans(off, dir),
        "budget 0 must fall back to the base table")
      assert(answers(off) == recompute())
    } finally
      spark.conf.unset("spark.graft.mv.maxStalenessCommits")

    val touched = spark
      .sql("REFRESH MATERIALIZED VIEW mvx.daily").collect()
    assert(touched.head.getLong(0) > 0L,
      "the append window must touch groups")
    val rearmed = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(rearmed, ruDir) && !scans(rearmed, dir))
    assert(answers(rearmed) == recompute())

    // aggregating the BASE directly also rides the MV's store — the
    // MV registration IS the rewrite linkage
    val baseAgg = spark.sql(
      "SELECT grp, count(*) AS c FROM mvx.facts GROUP BY grp")
    assert(scans(baseAgg, ruDir) && !scans(baseAgg, dir))

    spark.sql("DROP MATERIALIZED VIEW mvx.daily").collect()
    assert(!Files.exists(Paths.get(ruDir)),
      "DROP must remove the rollup directory")
    assert(new TableStore(spark)
      .snapshotPath("mvx", "daily__storage").isEmpty)
    intercept[Exception] {
      spark.sql("SELECT * FROM mvx.daily").collect()
    }
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS mvx.daily").collect()
    intercept[java.util.NoSuchElementException] {
      spark.sql("DROP MATERIALIZED VIEW mvx.daily").collect()
    }
  }

  test("auto-refresh: with graft.rollup.auto-refresh on the storage " +
    "table, base DML maintains the MV inside the statement; a window " +
    "the incremental path cannot price leaves it STALE (correct " +
    "fallback) and REFRESH rebuilds") {
    val (dir, _) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.daily AS
      SELECT grp, count(*) AS c, sum(qty) AS q, count(qty) AS cq,
             avg(qty) AS a, min(amount) AS mn, max(amount) AS mx
      FROM mvx.facts GROUP BY grp""").collect()
    val ruDir = new TableStore(spark)
      .properties("mvx", "daily__storage")("graft.rollup.dir")
    spark.sql("""ALTER TABLE mvx.daily__storage SET TBLPROPERTIES
      ('graft.rollup.auto-refresh'='true')""").collect()
    // fast-append INSERTs give the hook a priceable window
    spark.sql("""ALTER TABLE mvx.facts SET TBLPROPERTIES
      ('write.merge.mode'='merge-on-read')""").collect()

    spark.sql(
      "INSERT INTO mvx.facts VALUES (9001, 'g1', 'r1', 5, 5.0)")
      .collect()
    val served = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(served, ruDir) && !scans(served, dir),
      "the DML statement itself must have maintained the MV")
    assert(answers(served) == recompute())

    // a copy-on-write DELETE rebases the source — unpriceable window:
    // the hook leaves the MV stale, reads fall back and stay correct
    spark.sql("DELETE FROM mvx.facts WHERE id % 7 = 0").collect()
    val stale = spark.sql("SELECT * FROM mvx.daily")
    assert(!scans(stale, ruDir) && scans(stale, dir),
      "an unpriceable window must leave the MV stale, not wrong")
    assert(answers(stale) == recompute())

    // REFRESH means "bring it current": the incremental path raises
    // rebuild, the command falls back to the full recompute
    spark.sql("REFRESH MATERIALIZED VIEW mvx.daily").collect()
    val rebuilt = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(rebuilt, ruDir) && !scans(rebuilt, dir),
      "REFRESH must rebuild when the window is unpriceable")
    assert(answers(rebuilt) == recompute())
  }

  test("CREATE is guarded: duplicate names need OR REPLACE, IF NOT " +
    "EXISTS no-ops, and a non-derivable defining query fails with " +
    "guidance and leaves no debris") {
    val (dir, _) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.daily AS
      SELECT grp, count(*) AS c FROM mvx.facts GROUP BY grp""").collect()
    intercept[IllegalStateException] {
      spark.sql("""CREATE MATERIALIZED VIEW mvx.daily AS
        SELECT grp, count(*) AS c FROM mvx.facts GROUP BY grp""")
        .collect()
    }
    spark.sql("""CREATE MATERIALIZED VIEW IF NOT EXISTS mvx.daily AS
      SELECT grp, count(*) AS c FROM mvx.facts GROUP BY grp""").collect()
    spark.sql("""CREATE OR REPLACE MATERIALIZED VIEW mvx.daily AS
      SELECT grp, sum(qty) AS q FROM mvx.facts GROUP BY grp""").collect()
    val ruDir = new TableStore(spark)
      .properties("mvx", "daily__storage")("graft.rollup.dir")
    val q = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(q, ruDir), "the replaced MV must serve the new query")

    // a raw double sum is order-dependent — not incrementally
    // derivable, so CREATE lands it as a REBUILD-ONLY MV (Trino
    // parity) instead of failing: reads serve its store while fresh
    spark.sql("""CREATE MATERIALIZED VIEW mvx.bad AS
      SELECT grp, sum(amount) AS s FROM mvx.facts GROUP BY grp""")
      .collect()
    val badProps = new TableStore(spark).properties("mvx", "bad__storage")
    assert(badProps.contains("graft.mv.rebuild-only"),
      "a non-derivable aggregate must become a rebuild-only MV")
    val badQ = spark.sql("SELECT * FROM mvx.bad")
    assert(scans(badQ, badProps("graft.rollup.dir")) &&
      !scans(badQ, dir),
      "the rebuild-only MV must serve from its store while fresh")
    // …but the decimal-cast exact-sum idiom IS derivable
    spark.sql("""CREATE MATERIALIZED VIEW mvx.good AS
      SELECT grp, CAST(sum(CAST(amount AS DECIMAL(27,6))) AS DOUBLE)
        AS s FROM mvx.facts GROUP BY grp""").collect()
    val good = spark.sql("SELECT * FROM mvx.good")
    assert(scans(good, new TableStore(spark)
      .properties("mvx", "good__storage")("graft.rollup.dir")))
  }

  test("a PARTIAL materialized view (WHERE in the defining query) " +
    "maintains only its slice, serves reads that repeat the " +
    "predicate, and REFRESH keeps it exact") {
    val (dir, _) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.hot AS
      SELECT grp, count(*) AS c, sum(qty) AS q FROM mvx.facts
      WHERE region = 'r1' GROUP BY grp""").collect()
    val ruDir = new TableStore(spark)
      .properties("mvx", "hot__storage")("graft.rollup.dir")
    def hotBaseline(): Set[Seq[Any]] = {
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
      try answers(spark.sql("""SELECT grp, count(*) AS c,
        sum(qty) AS q FROM mvx.facts WHERE region = 'r1'
        GROUP BY grp"""))
      finally
        spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
    }
    val mv = spark.sql("SELECT * FROM mvx.hot")
    assert(scans(mv, ruDir) && !scans(mv, dir),
      "the partial MV must serve its own defining query from gold")
    assert(answers(mv) == hotBaseline())
    // the base-table query repeating the predicate rides too; the
    // bare aggregate does not (rows the store never saw)
    val direct = spark.sql("""SELECT grp, count(*) AS c,
      sum(qty) AS q FROM mvx.facts WHERE region = 'r1' GROUP BY grp""")
    assert(scans(direct, ruDir) && !scans(direct, dir))
    val bare = spark.sql(
      "SELECT grp, count(*) AS c FROM mvx.facts GROUP BY grp")
    assert(!scans(bare, ruDir) && scans(bare, dir))

    // maintain across a mixed append window (in- and out-of-slice)
    Snapshot.morCommit(spark, dir, deletes = None,
      appends = Some(Seq((9201L, "g0", "r1", 9L, 9.0),
          (9202L, "g0", "r0", 9L, 9.0))
        .toDF("id", "grp", "region", "qty", "amount")),
      operation = "append")
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvx.hot")
      .collect().head.getLong(0) > 0L)
    val after = spark.sql("SELECT * FROM mvx.hot")
    assert(scans(after, ruDir) && answers(after) == hotBaseline())

    // a subquery WHERE cannot maintain incrementally — it lands as a
    // REBUILD-ONLY MV (Trino parity), with the subquery's relation
    // among the freshness pins
    spark.sql("""CREATE MATERIALIZED VIEW mvx.subq AS
      SELECT grp, count(*) AS c FROM mvx.facts
      WHERE qty IN (SELECT max(qty) FROM mvx.facts) GROUP BY grp""")
      .collect()
    assert(new TableStore(spark).properties("mvx", "subq__storage")
      .contains("graft.mv.rebuild-only"),
      "a subquery WHERE must land as a rebuild-only MV")
  }

  test("SHOW MATERIALIZED VIEWS lists MVs with live freshness, and a " +
    "rollup HIERARCHY serves the coarsest matching store") {
    val (dir, _) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.by_grp_region AS
      SELECT grp, region, count(*) AS c, sum(qty) AS q
      FROM mvx.facts GROUP BY grp, region""").collect()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.by_grp AS
      SELECT grp, count(*) AS c, sum(qty) AS q
      FROM mvx.facts GROUP BY grp""").collect()
    val listed = spark.sql("SHOW MATERIALIZED VIEWS IN mvx").collect()
      .map(r => (r.getString(1), r.getBoolean(3))).toSet
    assert(listed == Set(("by_grp_region", true), ("by_grp", true)))

    // both stores can serve the grp-only aggregate — the COARSER one
    // (fewer group columns, fewer gold rows) must win
    val store = new TableStore(spark)
    val fine = store.properties("mvx", "by_grp_region__storage")(
      "graft.rollup.dir")
    val coarse = store.properties("mvx", "by_grp__storage")(
      "graft.rollup.dir")
    val q = spark.sql(
      "SELECT grp, count(*) AS c FROM mvx.facts GROUP BY grp")
    assert(scans(q, coarse) && !scans(q, fine) && !scans(q, dir),
      "the hierarchy must serve the coarsest matching store")
    // …while the finer aggregate is served by the finer store only
    val q2 = spark.sql("""SELECT grp, region, count(*) AS c
      FROM mvx.facts GROUP BY grp, region""")
    assert(scans(q2, fine) && !scans(q2, dir))

    // base moves → SHOW reports both stale
    Snapshot.morCommit(spark, dir, deletes = None,
      appends = Some(Seq((9100L, "g0", "r0", 1L, 1.0))
        .toDF("id", "grp", "region", "qty", "amount")),
      operation = "append")
    val staleListed = spark.sql("SHOW MATERIALIZED VIEWS").collect()
      .map(r => (r.getString(1), r.getBoolean(3))).toSet
    assert(staleListed == Set(("by_grp_region", false),
      ("by_grp", false)))
  }

  test("HAVING over maintainable aggregates and count(DISTINCT col) " +
    "land as INCREMENTAL MVs: the store maintains the un-HAVING'd " +
    "rollup (one grain finer for the distinct count), reads serve " +
    "gold, and REFRESH prices the window — never the full recompute " +
    "a rebuild-only MV pays") {
    val (dir, facts) = fixture()

    def incremental(createSql: String, name: String,
                    deltaGroupsOf: DataFrame => Long): Unit = {
      spark.sql(createSql).collect()
      val props = new TableStore(spark)
        .properties("mvx", s"${name}__storage")
      assert(!props.contains("graft.mv.rebuild-only"),
        s"$name must land as an INCREMENTAL MV, not rebuild-only")
      val mvDir = props("graft.rollup.dir")
      assert(graft.pipeline.Rollup.meta(mvDir).isDefined,
        s"$name must carry rollup meta (a maintained store)")
      def recomputeIt(): Set[Seq[Any]] = {
        spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
        try answers(spark.sql(s"SELECT * FROM mvx.$name"))
        finally spark.conf.set(
          "spark.graft.rollup.rewrite.enabled", "true")
      }
      val fresh = spark.sql(s"SELECT * FROM mvx.$name")
      assert(scans(fresh, mvDir) && !scans(fresh, dir),
        s"$name must serve from gold while fresh")
      assert(answers(fresh) == recomputeIt())
      // a delta lands in ONE query group — REFRESH must touch only
      // the delta's store-grain groups, proving the O(delta) path
      val delta = facts.limit(30)
        .withColumn("id", col("id") + 50000L)
        .withColumn("grp", lit("g1"))
      Snapshot.morCommit(spark, dir, deletes = None,
        appends = Some(delta), operation = "append")
      val touched = spark
        .sql(s"REFRESH MATERIALIZED VIEW mvx.$name")
        .collect()(0).getLong(0)
      assert(touched > 0L, s"$name: the append must touch groups")
      assert(touched <= deltaGroupsOf(delta),
        s"$name: REFRESH must price the window, got $touched")
      val rearmed = spark.sql(s"SELECT * FROM mvx.$name")
      assert(scans(rearmed, mvDir) && !scans(rearmed, dir),
        s"$name must serve from gold after the incremental refresh")
      assert(answers(rearmed) == recomputeIt(),
        s"$name: the refreshed gold answer must equal the recompute")
      spark.sql(s"DROP MATERIALIZED VIEW mvx.$name").collect()
    }

    // HAVING whose aggregate is NOT selected: the store maintains cnt
    // anyway, the view filter evaluates it on gold
    incremental("""CREATE MATERIALIZED VIEW mvx.hv AS
      SELECT grp, sum(qty) AS q FROM mvx.facts
      GROUP BY grp HAVING count(*) > 90""", "hv",
      d => d.select("grp").distinct().count())
    // count(DISTINCT col): the store is keyed one grain finer
    incremental("""CREATE MATERIALIZED VIEW mvx.cd AS
      SELECT grp, count(DISTINCT qty) AS dq, count(*) AS c
      FROM mvx.facts GROUP BY grp""", "cd",
      d => d.select("grp", "qty").distinct().count())
    // both at once, plus a HAVING aggregate over an unselected
    // measure (amount joins the measure set through the predicate)
    incremental("""CREATE MATERIALIZED VIEW mvx.both AS
      SELECT grp, count(DISTINCT qty) AS dq, sum(qty) AS q
      FROM mvx.facts GROUP BY grp
      HAVING count(*) > 90 AND sum(qty) > 0""", "both",
      d => d.select("grp", "qty").distinct().count())
  }

  test("formerly-unmaintainable defining queries (sum DISTINCT, " +
    "outer joins, global aggregates) CREATE as REBUILD-ONLY MVs — " +
    "Trino accepts any defining query; only a non-snapshot source " +
    "still refuses (no freshness gate possible)") {
    val (dir, _) = fixture()
    var i = 0
    def rebuildOnly(sql: String): Unit = {
      i += 1
      val name = s"ro$i"
      spark.sql(sql.replace("mvx.RO", s"mvx.$name")).collect()
      val props = new TableStore(spark)
        .properties("mvx", s"${name}__storage")
      assert(props.contains("graft.mv.rebuild-only"),
        s"$name must land as a rebuild-only MV")
      // fresh ⇒ the read serves the materialized store, and the
      // answer equals the defining query run with the rewrite off
      val q = spark.sql(s"SELECT * FROM mvx.$name")
      assert(scans(q, props("graft.rollup.dir")) && !scans(q, dir),
        s"$name must serve from its store while fresh")
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
      val want =
        try answers(spark.sql(s"SELECT * FROM mvx.$name"))
        finally spark.conf.set(
          "spark.graft.rollup.rewrite.enabled", "true")
      assert(answers(q) == want,
        s"$name: the store must equal the defining query's result")
    }
    rebuildOnly("""CREATE MATERIALIZED VIEW mvx.RO AS
      SELECT grp, CAST(sum(DISTINCT qty) AS BIGINT) AS c
      FROM mvx.facts GROUP BY grp""")
    rebuildOnly("""CREATE MATERIALIZED VIEW mvx.RO AS
      SELECT count(*) AS c, sum(amount) AS s FROM mvx.facts""")
    // a non-maintainable AGGREGATE inside HAVING must classify at
    // parse (ONE pass to the rebuild-only store, never a wasted
    // incremental build the derivability gate then tears down)
    rebuildOnly("""CREATE MATERIALIZED VIEW mvx.RO AS
      SELECT grp, sum(qty) AS q FROM mvx.facts
      GROUP BY grp HAVING CAST(stddev(qty) AS DOUBLE) >= 0""")
    // agg FILTER (WHERE …) has no store-side twin — same one-pass
    // route, in the SELECT list and in HAVING
    rebuildOnly("""CREATE MATERIALIZED VIEW mvx.RO AS
      SELECT grp, CAST(sum(qty) FILTER (WHERE qty > 3) AS BIGINT) AS q
      FROM mvx.facts GROUP BY grp""")
    rebuildOnly("""CREATE MATERIALIZED VIEW mvx.RO AS
      SELECT a.grp, count(*) AS c FROM mvx.facts a
      LEFT JOIN mvx.facts b ON a.id = b.id GROUP BY a.grp""")
    // no snapshot source ⇒ no freshness gate ⇒ still a hard refusal
    (1 to 3).map(j => (j, s"x$j")).toDF("id", "v")
      .createOrReplaceTempView("plainview")
    val e = intercept[Exception] {
      spark.sql("""CREATE MATERIALIZED VIEW mvx.bad AS
        SELECT v, count(DISTINCT id) AS c FROM plainview GROUP BY v""")
        .collect()
    }
    assert(e.getMessage.contains("snapshot") ||
      e.getMessage.contains("qualify"),
      s"got: ${e.getMessage}")
  }

  test("rebuild-only MV lifecycle: a base commit makes it STALE " +
    "(reads fall back to the live base — correct, never " +
    "stale-served), REFRESH fully recomputes and re-arms, a fresh " +
    "REFRESH is a no-op, DROP removes view + storage + directory") {
    val (dir, facts) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.heavy AS
      SELECT grp, count(DISTINCT qty) AS dq, sum(amount) AS s
      FROM mvx.facts GROUP BY grp HAVING count(*) > 10""").collect()
    val props = new TableStore(spark).properties("mvx", "heavy__storage")
    val mvDir = props("graft.rollup.dir")
    def recomputeHeavy(): Set[Seq[Any]] = {
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
      try answers(spark.sql("SELECT * FROM mvx.heavy"))
      finally spark.conf.set(
        "spark.graft.rollup.rewrite.enabled", "true")
    }
    val fresh = spark.sql("SELECT * FROM mvx.heavy")
    assert(scans(fresh, mvDir) && !scans(fresh, dir))
    assert(answers(fresh) == recomputeHeavy())
    assert(answers(spark.sql(
      "SHOW MATERIALIZED VIEWS IN mvx")).exists(r =>
        r(1) == "heavy" && r(3) == true))

    // a base commit flips every pin stale — the read must fall back
    // to the LIVE base and stay correct (Trino would stale-serve)
    Snapshot.morCommit(spark, dir, deletes = None,
      appends = Some(facts.limit(40)
        .withColumn("id", col("id") + 10000L)
        .withColumn("amount", col("amount") * 3)),
      operation = "append")
    val stale = spark.sql("SELECT * FROM mvx.heavy")
    assert(!scans(stale, mvDir) && scans(stale, dir),
      "a stale rebuild-only MV must fall back to the base plan")
    assert(answers(stale) == recomputeHeavy(),
      "the fallback must serve the LIVE answer")
    assert(answers(spark.sql(
      "SHOW MATERIALIZED VIEWS IN mvx")).exists(r =>
        r(1) == "heavy" && r(3) == false))

    // REFRESH = full recompute (Trino semantics for this class)
    val n = spark.sql("REFRESH MATERIALIZED VIEW mvx.heavy")
      .collect()(0).getLong(0)
    assert(n > 0L, "the rebuild must report the materialized rows")
    val rearmed = spark.sql("SELECT * FROM mvx.heavy")
    assert(scans(rearmed, mvDir) && !scans(rearmed, dir),
      "REFRESH must re-arm the store")
    assert(answers(rearmed) == recomputeHeavy())
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvx.heavy")
      .collect()(0).getLong(0) == 0L,
      "a fresh rebuild-only MV must skip the recompute")

    spark.sql("DROP MATERIALIZED VIEW mvx.heavy").collect()
    assert(new TableStore(spark)
      .snapshotPath("mvx", "heavy__storage").isEmpty)
    assert(!Files.exists(Paths.get(mvDir)),
      "DROP must remove the materialized store directory")
  }

  test("rebuild-only MV SUBSUMPTION: a Filter, Project, sort or " +
    "outer aggregate ON TOP of the defining shape still serves the " +
    "store — the defining plan matches as a SUBTREE and the " +
    "residual operators stay above the store read; stale still " +
    "falls back entirely") {
    val (dir, facts) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.hv2 AS
      SELECT grp, CAST(sum(DISTINCT qty) AS BIGINT) AS sd,
             sum(amount) AS s
      FROM mvx.facts GROUP BY grp""").collect()
    val props = new TableStore(spark).properties("mvx", "hv2__storage")
    assert(props.contains("graft.mv.rebuild-only"),
      "sanity: sum(DISTINCT) over a raw double lands rebuild-only")
    val mvDir = props("graft.rollup.dir")
    def chk(sql: String): Unit = {
      val df = spark.sql(sql)
      assert(scans(df, mvDir) && !scans(df, dir),
        s"must serve the store under residual operators: $sql")
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
      val want =
        try answers(spark.sql(sql))
        finally spark.conf.set(
          "spark.graft.rollup.rewrite.enabled", "true")
      assert(answers(df) == want, s"subsumed read changed: $sql")
    }
    chk("SELECT * FROM mvx.hv2 WHERE sd > 100")
    chk("SELECT grp, s FROM mvx.hv2")
    chk("SELECT grp FROM mvx.hv2 WHERE s > 0 ORDER BY grp")
    chk("SELECT count(*) AS n, sum(s) AS ts FROM mvx.hv2 " +
      "WHERE sd >= 0")
    // a base commit flips the pins — every residual shape must fall
    // back to the live base, never the stale store
    Snapshot.morCommit(spark, dir, deletes = None,
      appends = Some(facts.limit(20)
        .withColumn("id", col("id") + 90000L)),
      operation = "append")
    val stale = spark.sql("SELECT grp, s FROM mvx.hv2 WHERE sd > 0")
    assert(!scans(stale, mvDir) && scans(stale, dir),
      "a stale store must not serve under residual operators either")
    spark.sql("DROP MATERIALIZED VIEW mvx.hv2").collect()
  }

  test("a JOIN materialized view (star schema): reads serve from " +
    "gold, a fact append REFRESHes at O(window), and a dim change " +
    "REFRESHes incrementally (the F' JOIN dim-delta term) and re-pins") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val root = Files.createTempDirectory("mvjoin").toString
    val (fdir, ddir) = (s"$root/fact", s"$root/dim")
    val facts = (1 to 400).map(i =>
      (i.toLong, (i % 10).toLong, (i % 13).toLong))
      .toDF("id", "cust_id", "qty")
    val dim = (0 until 10).map(i => (i.toLong, s"seg${i % 3}"))
      .toDF("cust_key", "segment")
    Snapshot.createOrReplace(facts, fdir, keepVersions = 2)
    Snapshot.createOrReplace(dim, ddir, keepVersions = 2)
    store.registerSnapshot("mvs", "facts", fdir)
    store.registerSnapshot("mvs", "cust", ddir)
    spark.sql("""CREATE MATERIALIZED VIEW mvs.by_segment AS
      SELECT segment, count(*) AS c, sum(qty) AS q
      FROM mvs.facts f JOIN mvs.cust c ON f.cust_id = c.cust_key
      GROUP BY segment""").collect()
    val ruDir = new TableStore(spark)
      .properties("mvs", "by_segment__storage")("graft.rollup.dir")
    def mvRead() = spark.sql("SELECT * FROM mvs.by_segment")
    def base(): Set[Seq[Any]] = {
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
      try answers(mvRead())
      finally
        spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
    }
    assert(scans(mvRead(), ruDir) && !scans(mvRead(), fdir),
      "a fresh join MV must serve from the gold store")
    assert(answers(mvRead()) == base())

    // fact append → stale → the rewrite COMPENSATES (store ⊎ window
    // delta joined to the still-pinned dim); REFRESH re-arms the
    // plain store serve at O(delta)
    Snapshot.morCommit(spark, fdir, deletes = None,
      appends = Some(Seq((1001L, 3L, 5L)).toDF("id", "cust_id", "qty")),
      operation = "append")
    assert(scans(mvRead(), ruDir),
      "a fact-stale join MV must serve by compensation")
    assert(answers(mvRead()) == base())
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvs.by_segment")
      .collect().head.getLong(0) > 0L)
    assert(scans(mvRead(), ruDir))
    assert(answers(mvRead()) == base())

    // dim append — one row that MATCHES live facts (fan-out) and one
    // that matches none → the stale store COMPENSATES (r19: the
    // dim-side affected-group arm serves store ∖ touched ⊎ recompute
    // of the re-segmented groups) until REFRESH prices the dim
    // window (one bounded fact read ⋈ the dim delta) and re-pins
    Snapshot.morCommit(spark, ddir, deletes = None,
      appends = Some(Seq((3L, "seg9"), (77L, "seg7"))
        .toDF("cust_key", "segment")),
      operation = "append")
    assert(scans(mvRead(), ruDir),
      "a moved dim must serve by dim-window compensation (r19)")
    assert(answers(mvRead()) == base())
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvs.by_segment")
      .collect().head.getLong(0) > 0L,
      "the matching dim row must touch groups")
    assert(scans(mvRead(), ruDir),
      "the incremental dim refresh must re-pin the moved dim")
    assert(answers(mvRead()) == base())

    // auto-refresh fires on DIM commits too: with the property set, a
    // fast-append INSERT INTO the dimension (a fan-out duplicate of a
    // live key) maintains the star MV inside the statement
    spark.sql("""ALTER TABLE mvs.by_segment__storage SET TBLPROPERTIES
      ('graft.rollup.auto-refresh'='true')""").collect()
    spark.sql("""ALTER TABLE mvs.cust SET TBLPROPERTIES
      ('write.merge.mode'='merge-on-read')""").collect()
    spark.sql("INSERT INTO mvs.cust VALUES (5, 'seg5')").collect()
    val auto = mvRead()
    assert(scans(auto, ruDir) && !scans(auto, fdir),
      "a dim DML must auto-maintain the star MV in-statement")
    assert(answers(auto) == base())

    // DIM-side EQUALITY window through the SQL surface (r17): a keyed
    // DELETE on the dimension under the default delete mode writes an
    // identifier-scoped equality sidecar — REFRESH must PRICE it via
    // the dim-side re-derive (incremental MOR commit on the store,
    // never the full-rebuild fallback Trino pays)
    spark.sql("""ALTER TABLE mvs.by_segment__storage SET TBLPROPERTIES
      ('graft.rollup.auto-refresh'='false')""").collect()
    spark.sql("""ALTER TABLE mvs.cust SET TBLPROPERTIES
      ('write.delete.mode'='merge-on-read')""").collect()
    spark.sql("ALTER TABLE mvs.cust SET IDENTIFIER FIELDS cust_key")
      .collect()
    val d0 = Snapshot.currentVersion(ddir).get
    // key 3 joins live facts (and carries the fan-out duplicate) —
    // its groups must re-derive; an unmatched key would touch none
    spark.sql("DELETE FROM mvs.cust WHERE cust_key = 3").collect()
    assert(Snapshot.windowHasEqualityDeletes(ddir, d0,
      Snapshot.currentVersion(ddir).get),
      "the keyed dim DELETE must write an equality sidecar")
    assert(scans(mvRead(), ruDir),
      "a dim equality delete must serve by dim-window compensation " +
        "(r19: the affected-group arm re-derives the deleted key's " +
        "groups from the live join)")
    assert(answers(mvRead()) == base())
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvs.by_segment")
      .collect().head.getLong(0) > 0L,
      "a dim equality window must REFRESH incrementally, not raise")
    val storeTable = s"$ruDir/table"
    assert(Snapshot.operationOf(storeTable,
        Snapshot.currentVersion(storeTable).get)
      .exists(_.startsWith("rollup-to-v")),
      "the store must advance by an incremental MOR commit, " +
        "never the full-rebuild fallback")
    assert(scans(mvRead(), ruDir))
    assert(answers(mvRead()) == base())

    // WHERE and JOIN compose: a PARTIAL star MV maintains only the
    // matching joined rows and serves the predicate-repeating query
    // (the derivability gate inside CREATE proves the composition)
    spark.sql("""CREATE MATERIALIZED VIEW mvs.hot AS
      SELECT segment, count(*) AS c, sum(qty) AS q
      FROM mvs.facts f JOIN mvs.cust c ON f.cust_id = c.cust_key
      WHERE qty > 6 GROUP BY segment""").collect()
    val hotRu = new TableStore(spark)
      .properties("mvs", "hot__storage")("graft.rollup.dir")
    val hot = spark.sql("SELECT * FROM mvs.hot")
    assert(scans(hot, hotRu) && !scans(hot, fdir) && !scans(hot, ddir),
      "the partial star MV must serve its slice from gold")
    def hotBase(): Set[Seq[Any]] = {
      spark.conf.set("spark.graft.rollup.rewrite.enabled", "false")
      try answers(spark.sql("SELECT * FROM mvs.hot"))
      finally
        spark.conf.set("spark.graft.rollup.rewrite.enabled", "true")
    }
    assert(answers(hot) == hotBase())
    spark.sql("DROP MATERIALIZED VIEW mvs.hot").collect()

    spark.sql("DROP MATERIALIZED VIEW mvs.by_segment").collect()
    assert(!Files.exists(Paths.get(ruDir)))
  }

  test("an UNALIASED aggregate parses (the parser wraps non-aliased " +
    "select items in UnresolvedAlias) and a Trino-dialect unbounded " +
    "varchar cast routes to the graft MV command on the retry") {
    val (_, _) = fixture()
    // count(*) with no alias is exactly the maintainable shape — it
    // must not fall to the unsupported-select-item branch
    spark.sql("""CREATE MATERIALIZED VIEW mvx.noalias AS
      SELECT grp, count(*) FROM mvx.facts GROUP BY grp""").collect()
    assert(new TableStore(spark)
      .properties("mvx", "noalias__storage").contains("graft.mv"))
    assert(spark.sql("SELECT * FROM mvx.noalias").count() == 4)
    spark.sql("DROP MATERIALIZED VIEW mvx.noalias").collect()
    // Trino spells unbounded CAST(x AS varchar); the retry must
    // re-attempt the MV command on the rewritten text, not fall to
    // Spark's inexecutable native pipeline-dataset plan
    spark.sql("""CREATE MATERIALIZED VIEW mvx.vslice AS
      SELECT grp, count(*) AS c FROM mvx.facts
      WHERE CAST(grp AS varchar) <> 'zz' GROUP BY grp""").collect()
    assert(new TableStore(spark)
      .properties("mvx", "vslice__storage").contains("graft.mv"))
    assert(spark.sql("SELECT * FROM mvx.vslice").count() == 4)
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvx.vslice")
      .collect().length == 1)
    spark.sql("DROP MATERIALIZED VIEW mvx.vslice").collect()
  }

  test("same-named MVs in different namespaces over ONE source keep " +
    "separate stores: the second CREATE must not wipe the first's, " +
    "and dropping one leaves the other serving and refreshable") {
    val (dir, _) = fixture()
    val store = new TableStore(spark)
    store.createNamespace("mvy")
    spark.sql("""CREATE MATERIALIZED VIEW mvx.daily AS
      SELECT grp, count(*) AS c FROM mvx.facts GROUP BY grp""")
      .collect()
    val ru1 = new TableStore(spark)
      .properties("mvx", "daily__storage")("graft.rollup.dir")
    spark.sql("""CREATE MATERIALIZED VIEW mvy.daily AS
      SELECT region, count(*) AS c FROM mvx.facts GROUP BY region""")
      .collect()
    val ru2 = new TableStore(spark)
      .properties("mvy", "daily__storage")("graft.rollup.dir")
    assert(ru1 != ru2, "the rollup dir must be namespace-scoped")
    assert(Files.exists(Paths.get(ru1)) && Files.exists(Paths.get(ru2)),
      "creating the second MV must not destroy the first's store")
    val q1 = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(q1, ru1) && !scans(q1, dir),
      "the first MV must still serve from ITS OWN store")
    spark.sql("DROP MATERIALIZED VIEW mvy.daily").collect()
    assert(Files.exists(Paths.get(ru1)),
      "dropping the namespace twin must not delete this MV's store")
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvx.daily")
      .collect().length == 1, "the survivor must stay refreshable")
  }

  test("a failed CREATE OR REPLACE leaves the PREVIOUS MV serving: " +
    "the old store, registration and view are restored when the " +
    "replacement flunks the derivability gate") {
    val (dir, _) = fixture()
    spark.sql("""CREATE MATERIALIZED VIEW mvx.daily AS
      SELECT grp, count(*) AS c, sum(qty) AS q
      FROM mvx.facts GROUP BY grp""").collect()
    val ruDir = new TableStore(spark)
      .properties("mvx", "daily__storage")("graft.rollup.dir")
    val before = answers(spark.sql("SELECT * FROM mvx.daily"))
    // a nonexistent measure column fails the build AFTER the old MV
    // was dropped; the restore must bring it back instead of leaving
    // the session with no MV at all
    intercept[Exception] {
      spark.sql("""CREATE OR REPLACE MATERIALIZED VIEW mvx.daily AS
        SELECT grp, sum(no_such_col) AS s FROM mvx.facts
        GROUP BY grp""").collect()
    }
    assert(Files.exists(Paths.get(ruDir)),
      "the old store must survive the failed replace")
    val after = spark.sql("SELECT * FROM mvx.daily")
    assert(scans(after, ruDir) && !scans(after, dir),
      "the restored MV must serve from its gold store again")
    assert(answers(after) == before)
    assert(spark.sql("REFRESH MATERIALIZED VIEW mvx.daily")
      .collect().length == 1, "the restored MV must stay refreshable")
  }

  test("the rollup-dir encoding is injective for hyphenated " +
    "identifiers: ns a-b/name c and ns a/name b-c must not map to " +
    "one dir (the second CREATE would destroy the first's store)") {
    def dir(ns: String, name: String): String =
      s"src.mv-${MaterializedViews.encodePart(ns)}-" +
        MaterializedViews.encodePart(name)
    assert(dir("a-b", "c") != dir("a", "b-c"))
    assert(dir("a-", "b") != dir("a", "-b"))
    assert(dir("a%2D", "b") != dir("a-", "b"),
      "the escape character itself must be escaped")
    assert(dir("a", "b") == "src.mv-a-b",
      "plain identifiers keep the readable layout")
  }
}
