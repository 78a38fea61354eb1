package graft.catalog

import graft.SparkSpec
import graft.pipeline.Snapshot
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Persistent catalog (the REST-catalog role): metadata written through
  * to a catalog dir survives the session — a FRESH SparkSession
  * attaching the same dir sees the same SHOW TABLES / DESCRIBE /
  * TBLPROPERTIES / view surface. */
class PersistentCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("a fresh session attaching the catalog dir sees snapshot " +
    "tables, TBLPROPERTIES, declared-schema tables and late-bound " +
    "views created by the previous session") {
    TableStore.reset(spark)
    val meta = Files.createTempDirectory("gcat").toString
    val dataDir = Files.createTempDirectory("gcatdata").toString + "/t"
    TableStore.attachCatalog(spark, meta)

    // session 1 builds the surface
    Snapshot.createOrReplace(
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
        .toDF("id", "name", "v"),
      dataDir, keepVersions = 3)
    new TableStore(spark).registerSnapshot("persist", "orders", dataDir)
    spark.sql("""ALTER TABLE persist.orders SET TBLPROPERTIES(
      'custodian'='pipeline', 'write.delete.mode'='merge-on-read')""")
    spark.sql("CREATE TABLE IF NOT EXISTS iceberg.persist.decl " +
      "(k BIGINT, label STRING) USING iceberg")
    spark.sql("""CREATE VIEW iceberg.persist.big AS
      SELECT id, name FROM persist.orders WHERE v >= 20""")
    assert(Files.exists(java.nio.file.Paths.get(meta, "catalog.json")))

    // session 2: same metadata dir, nothing else carried over
    val s2 = spark.newSession()
    assert(s2 ne spark)
    TableStore.attachCatalog(s2, meta)

    val tables = s2.sql("SHOW TABLES IN persist")
      .select("table_name", "is_view")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(tables == Map("orders" -> false, "decl" -> false,
      "big" -> true))

    // snapshot table reads the live data through plain spark.sql
    assert(s2.sql("SELECT count(*) FROM persist.orders")
      .head().getLong(0) == 3L)
    // properties survived
    val props = s2.sql("SHOW TBLPROPERTIES persist.orders")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("custodian") == "pipeline")
    assert(props("write.delete.mode") == "merge-on-read")
    // declared-schema table: schema intact (data is session-scoped)
    val decl = s2.sql("SELECT * FROM persist.decl")
    assert(decl.schema.fieldNames.toSeq == Seq("k", "label"))
    assert(decl.count() == 0)
    // the view re-bound and filters live data
    assert(s2.sql("SELECT name FROM persist.big ORDER BY id")
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq == Seq("b", "c"))

    // LATE BINDING across sessions: session 2 deletes a row (via the
    // persisted merge-on-read property!) and its view follows
    s2.sql("DELETE FROM persist.orders WHERE id = 2")
    assert(Snapshot.morVersions(dataDir).nonEmpty,
      "the persisted write.delete.mode must route MOR")
    assert(s2.sql("SELECT name FROM persist.big ORDER BY id")
      .as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq == Seq("c"))

    // and the ORIGINAL session, attached to the same catalog, keeps
    // resolving the moved table state (reads go to the live dir)
    assert(spark.sql("SELECT count(*) FROM persist.orders")
      .head().getLong(0) == 2L)
  }

  test("a snapshot registration SUPERSEDES a declared-schema " +
    "registration of the same name (day-one CREATE TABLE … PARTITIONED " +
    "BY flow), in-session and across a catalog reload") {
    TableStore.reset(spark)
    val meta = Files.createTempDirectory("gcat3").toString
    val dataDir = Files.createTempDirectory("gcat3d").toString + "/t"
    TableStore.attachCatalog(spark, meta)
    // declared schema first (registers an EMPTY frame)...
    spark.sql("""CREATE TABLE IF NOT EXISTS iceberg.shadow.t
      (id BIGINT, ts TIMESTAMP, v DOUBLE) USING iceberg
      PARTITIONED BY (years(ts))""")
    // ...then the table gets a layout and real data
    new TableStore(spark).registerSnapshot("shadow", "t", dataDir)
    Snapshot.createOrReplaceCurrentSpec(
      Seq((1L, ts("2024-03-01 00:00:00"), 1.0),
        (2L, ts("2025-06-01 00:00:00"), 2.0)).toDF("id", "ts", "v"),
      dataDir, keepVersions = 2)
    // the empty registry frame must NOT shadow the snapshot data
    assert(spark.sql("SELECT count(*) FROM shadow.t")
      .head().getLong(0) == 2L,
      "snapshot registration must supersede the empty declared frame")
    // the CREATE-time spec reached the layout
    assert(Snapshot.partitionSpec(dataDir) == Seq("years(ts)"))

    // and a RELOAD does not resurrect the shadow: the persisted
    // catalog carries both the declared table and the snapshot entry
    val s2 = spark.newSession()
    TableStore.attachCatalog(s2, meta)
    assert(s2.sql("SELECT count(*) FROM shadow.t")
      .head().getLong(0) == 2L,
      "reload must not re-shadow the snapshot with an empty frame")
  }

  test("CREATE OR REPLACE VIEW keeps its creation position, so a " +
    "dependent view created later still loads after it on reload") {
    TableStore.reset(spark)
    val meta = Files.createTempDirectory("gcat4").toString
    TableStore.attachCatalog(spark, meta)
    val dataDir = Files.createTempDirectory("gcat4d").toString + "/t"
    Snapshot.createOrReplace(
      Seq((1, 5), (2, 50)).toDF("id", "v"), dataDir)
    new TableStore(spark).registerSnapshot("vord", "base", dataDir)
    spark.sql("CREATE VIEW iceberg.vord.a AS " +
      "SELECT id, v FROM vord.base WHERE v > 1")
    spark.sql("CREATE VIEW iceberg.vord.b AS " +
      "SELECT id FROM vord.a WHERE v > 10")
    // replacing `a` must NOT move it after its dependent `b`
    spark.sql("CREATE OR REPLACE VIEW iceberg.vord.a AS " +
      "SELECT id, v FROM vord.base WHERE v > 2")

    val s2 = spark.newSession()
    TableStore.attachCatalog(s2, meta)
    assert(s2.sql("SELECT id FROM vord.b").collect().map(_.getInt(0))
      .toSeq == Seq(2),
      "the dependent view must survive the reload")
    // and nothing was erased from the persisted file
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(meta, "catalog.json")))
    assert(json.contains("\"a\"") && json.contains("\"b\""))
  }

  test("MATERIALIZED VIEWS survive a fresh session attaching the " +
    "same catalog dir: the view reads, the always-on rewrite serves " +
    "gold, REFRESH maintains incrementally, and a rebuild-only MV " +
    "still gates freshness (stale → base, refresh → store)") {
    TableStore.reset(spark)
    val meta = Files.createTempDirectory("gcatmv").toString
    val dataDir = Files.createTempDirectory("gcatmvd").toString +
      "/facts"
    def reads(df: org.apache.spark.sql.DataFrame,
              dir: String): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.toUri.getPath)
                .exists(p => p == dir || p.startsWith(s"$dir/"))
            case _ => false
          }
        case _ => false
      }
    TableStore.attachCatalog(spark, meta)
    Snapshot.createOrReplace(
      (1 to 400).map(i => (i.toLong, s"g${i % 4}", (i % 13).toLong))
        .toDF("id", "grp", "qty"), dataDir, keepVersions = 3)
    new TableStore(spark).registerSnapshot("mvp", "facts", dataDir)
    // session 1 creates BOTH MV classes
    spark.sql("""CREATE MATERIALIZED VIEW iceberg.mvp.gold AS
      SELECT grp, count(*) AS cnt,
             CAST(sum(CAST(qty AS DECIMAL(27,6))) AS DOUBLE) AS s
      FROM mvp.facts GROUP BY grp""").collect()
    spark.sql("""CREATE MATERIALIZED VIEW iceberg.mvp.heavy AS
      SELECT grp, CAST(sum(DISTINCT qty) AS BIGINT) AS sd
      FROM mvp.facts GROUP BY grp""").collect()
    assert(new TableStore(spark).properties("mvp", "heavy__storage")
      .contains("graft.mv.rebuild-only"))

    // session 2: same catalog dir, nothing else carried over
    val s2 = spark.newSession()
    TableStore.attachCatalog(s2, meta)
    val ts2 = new TableStore(s2)
    val ruDir = ts2.properties("mvp", "gold__storage")(
      "graft.rollup.dir")
    val hvDir = ts2.properties("mvp", "heavy__storage")(
      "graft.rollup.dir")
    // the MV view reads and the rewrite serves the STORE in the
    // fresh session — the shared-dashboard deployment shape
    val mv = s2.sql("SELECT * FROM mvp.gold")
    assert(reads(mv, ruDir) && !reads(mv, dataDir),
      "a reloaded MV must serve its gold store, not the base")
    assert(mv.count() == 4)
    val agg = s2.sql(
      "SELECT grp, count(*) AS cnt FROM mvp.facts GROUP BY grp")
    assert(reads(agg, ruDir) && !reads(agg, dataDir),
      "the always-on rewrite must survive the catalog reload")

    // a base commit in the NEW session stales both MVs
    Snapshot.morCommit(s2, dataDir, deletes = None,
      appends = Some((401 to 450).map(i =>
        (i.toLong, s"g${i % 4}", (i % 13).toLong))
        .toDF("id", "grp", "qty")), operation = "append")
    val stale = s2.sql(
      "SELECT grp, count(*) AS cnt FROM mvp.facts GROUP BY grp")
    assert(reads(stale, ruDir),
      "a priceably-stale reloaded MV must serve by compensation " +
        "(store ⊎ window delta) in the fresh session too")
    assert(stale.collect().map(r => (r.getString(0), r.getLong(1)))
      .toMap.values.sum == 450L,
      "the compensated answer must count the window's rows")
    val staleHeavy = s2.sql("SELECT * FROM mvp.heavy")
    assert(!reads(staleHeavy, hvDir) && reads(staleHeavy, dataDir),
      "a stale rebuild-only MV must fall back to the live base")
    // stale reads still answer correctly (late-bound fallback)
    assert(staleHeavy.count() == 4)

    // REFRESH in the new session maintains the incremental MV from
    // the commit window and re-arms the rewrite
    assert(s2.sql("REFRESH MATERIALIZED VIEW mvp.gold")
      .collect().head.getLong(0) > 0L,
      "the reloaded MV must refresh INCREMENTALLY (touch groups)")
    val fresh = s2.sql(
      "SELECT grp, count(*) AS cnt FROM mvp.facts GROUP BY grp")
    assert(reads(fresh, ruDir) && !reads(fresh, dataDir))
    // and the served values equal the recompute
    val want = s2.sql("SELECT grp, count(*) AS cnt FROM mvp.facts " +
      "GROUP BY grp")
    s2.conf.set("spark.graft.rollup.rewrite.enabled", "false")
    val base = try s2.sql("SELECT grp, count(*) AS cnt " +
      "FROM mvp.facts GROUP BY grp").collect().map(_.toSeq).toSet
    finally s2.conf.set("spark.graft.rollup.rewrite.enabled", "true")
    assert(want.collect().map(_.toSeq).toSet == base)

    // the rebuild-only MV refreshes (full recompute) and serves again
    s2.sql("REFRESH MATERIALIZED VIEW mvp.heavy").collect()
    val heavy = s2.sql("SELECT * FROM mvp.heavy")
    assert(reads(heavy, hvDir) && !reads(heavy, dataDir),
      "a refreshed rebuild-only MV must serve its store again")
  }

  test("spark.graft.catalog.dir auto-attaches on first catalog touch; " +
    "DROP writes through so a later session no longer sees the table") {
    TableStore.reset(spark)
    val meta = Files.createTempDirectory("gcat2").toString
    val dataDir = Files.createTempDirectory("gcat2d").toString + "/t"
    TableStore.attachCatalog(spark, meta)
    Snapshot.createOrReplace(Seq(1, 2).toDF("x"), dataDir)
    new TableStore(spark).registerSnapshot("auto", "t1", dataDir)
    new TableStore(spark).registerSnapshot("auto", "t2", dataDir)

    // conf-born session: no explicit attach call
    val s3 = spark.newSession()
    s3.conf.set("spark.graft.catalog.dir", meta)
    assert(s3.sql("SELECT sum(x) FROM auto.t1").head().getLong(0) == 3L)

    // drop in s3 persists; a fourth session sees only t2
    s3.sql("DROP TABLE auto.t1")
    val s4 = spark.newSession()
    TableStore.attachCatalog(s4, meta)
    val names = s4.sql("SHOW TABLES IN auto")
      .select("table_name").collect().map(_.getString(0)).toSet
    assert(names == Set("t2"))
  }
}
