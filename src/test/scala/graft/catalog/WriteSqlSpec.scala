package graft.catalog

import graft.SparkSpec

/** `INSERT INTO` / `INSERT OVERWRITE` / CTAS / `DROP TABLE` /
  * `TRUNCATE TABLE` executed verbatim through `spark.sql` against
  * graft-registered tables — the write surface of the reference's
  * Iceberg storage layer beyond the DML trio (MERGE/UPDATE/DELETE).
  * Session-catalog statements must stay untouched: interception
  * requires the graft prefix or a registered 2-part name. */
class WriteSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore = {
    TableStore.reset(spark)
    new TableStore(spark)
  }

  test("INSERT INTO appends: positional, column-list NULL-fill, " +
    "BY NAME, and OVERWRITE replaces") {
    val store = freshStore()
    store.register("ins", "t",
      Seq((1, "a", 10)).toDF("id", "tag", "v"))

    // positional VALUES, 3-part spelling
    spark.sql("INSERT INTO iceberg.ins.t VALUES (2, 'b', 20)")
    // query source, 2-part spelling
    spark.sql("INSERT INTO ins.t SELECT 3, 'c', 30")
    // column list: unlisted column v is NULL-filled
    spark.sql("INSERT INTO ins.t (id, tag) VALUES (4, 'd')")
    // BY NAME: source column order differs from the target's
    spark.sql("INSERT INTO ins.t BY NAME SELECT 'e' AS tag, 5 AS id, 50 AS v")
    assert(store.table("ins", "t")
      .as[(Int, String, Option[Int])].collect().toSet ==
      Set((1, "a", Some(10)), (2, "b", Some(20)), (3, "c", Some(30)),
        (4, "d", None), (5, "e", Some(50))))

    // values are cast to the column type (string literal → int column)
    spark.sql("INSERT INTO ins.t VALUES (6, 'f', '60')")
    assert(store.table("ins", "t").filter($"id" === 6)
      .select("v").as[Int].head() == 60)

    spark.sql("INSERT OVERWRITE ins.t SELECT 9, 'z', 90")
    assert(store.table("ins", "t")
      .as[(Int, String, Option[Int])].collect().toSeq ==
      Seq((9, "z", Some(90))))

    // arity / unknown-column / view-target errors raise
    intercept[Exception] { spark.sql("INSERT INTO ins.t VALUES (1, 'x')") }
    intercept[Exception] {
      spark.sql("INSERT INTO ins.t (id, nope) VALUES (1, 'x')") }
    // a DUPLICATED target column would silently drop one source value
    // through the name map — rejected like Spark's native insert
    assert(intercept[IllegalArgumentException] {
      spark.sql("INSERT INTO ins.t (id, id) VALUES (1, 2)")
    }.getMessage.contains("twice"))
    intercept[Exception] {
      spark.sql("INSERT INTO ins.t BY NAME SELECT 1 AS id, 2 AS nope") }
    store.createView("ins", "view1", store.table("ins", "t"))
    intercept[Exception] {
      spark.sql("INSERT INTO ins.view1 VALUES (1, 'x', 1)") }
  }

  test("CTAS materializes a snapshot; CREATE OR REPLACE re-runs; " +
    "IF NOT EXISTS is a no-op; plain REPLACE needs an existing table") {
    val store = freshStore()
    store.register("src", "base",
      Seq((1, 5), (2, 50), (3, 500)).toDF("id", "v"))

    spark.sql("""CREATE TABLE iceberg.out.big AS
                 SELECT id, v FROM src.base WHERE v >= 50""")
    assert(store.table("out", "big").as[(Int, Int)].collect().toSet ==
      Set((2, 50), (3, 500)))

    // CTAS is a snapshot, not a view: later base-table changes invisible
    spark.sql("DELETE FROM iceberg.src.base WHERE id = 3")
    assert(store.table("out", "big").count() == 2)

    intercept[Exception] {
      spark.sql("CREATE TABLE iceberg.out.big AS SELECT 1 AS x") }
    spark.sql(
      "CREATE TABLE IF NOT EXISTS iceberg.out.big AS SELECT 1 AS x")
    assert(store.table("out", "big").columns.toSeq == Seq("id", "v"))

    spark.sql("""CREATE OR REPLACE TABLE iceberg.out.big AS
                 SELECT id FROM src.base""")
    assert(store.table("out", "big").columns.toSeq == Seq("id"))
    assert(store.table("out", "big").count() == 2)

    intercept[Exception] {
      spark.sql("REPLACE TABLE iceberg.out.missing AS SELECT 1 AS x") }
  }

  test("DROP TABLE and TRUNCATE TABLE: effects, IF EXISTS, view " +
    "rejection") {
    val store = freshStore()
    store.register("dd", "t", Seq((1, "a")).toDF("id", "tag"))
    store.createView("dd", "vw", store.table("dd", "t"))

    spark.sql("TRUNCATE TABLE iceberg.dd.t")
    assert(store.table("dd", "t").count() == 0)
    assert(store.table("dd", "t").columns.toSeq == Seq("id", "tag"))

    spark.sql("DROP TABLE dd.t")
    assert(!store.tableExists("dd", "t"))
    intercept[Exception] { spark.sql("DROP TABLE iceberg.dd.t") }
    spark.sql("DROP TABLE IF EXISTS iceberg.dd.t") // no-op, no raise

    intercept[Exception] { spark.sql("DROP TABLE iceberg.dd.vw") }
    intercept[Exception] { spark.sql("TRUNCATE TABLE iceberg.dd.vw") }
    assert(store.tableExists("dd", "vw"))
  }

  test("INSERT INTO / OVERWRITE / TRUNCATE on a SNAPSHOT-BACKED table " +
    "are versioned commits: history retained, time travel sees the " +
    "pre-write state") {
    val store = freshStore()
    val dir = java.nio.file.Files.createTempDirectory("snapins")
      .toString + "/t"
    graft.pipeline.Snapshot.createOrReplace(
      Seq((1, "a")).toDF("id", "tag"), dir, keepVersions = 4)
    store.registerSnapshot("ws", "t", dir)
    spark.sql("INSERT INTO ws.t VALUES (2, 'b')")
    assert(spark.sql("SELECT id FROM ws.t ORDER BY id")
      .as[Int].collect().toSeq == Seq(1, 2))
    // the append was a commit: v1 is retained and time-travelable
    assert(spark.sql("SELECT id FROM ws.t VERSION AS OF 1")
      .as[Int].collect().toSeq == Seq(1))
    spark.sql("INSERT OVERWRITE iceberg.ws.t VALUES (9, 'z')")
    assert(spark.sql("SELECT id FROM ws.t").as[Int].collect().toSeq
      == Seq(9))
    spark.sql("TRUNCATE TABLE ws.t")
    assert(spark.sql("SELECT count(*) FROM ws.t").as[Long].head() == 0L)
    // schema survives the empty commit; full history is walkable
    assert(spark.sql("SELECT id FROM ws.t").columns.toSeq == Seq("id"))
    assert(spark.sql("SELECT id FROM ws.t VERSION AS OF 3")
      .as[Int].collect().toSeq == Seq(9))
  }

  test("spark.wap.branch session mode: writes stage on the branch and " +
    "compose, reads resolve the branch, live is untouched until " +
    "fast_forward publishes") {
    val store = freshStore()
    val dir = java.nio.file.Files.createTempDirectory("wapconf")
      .toString + "/t"
    graft.pipeline.Snapshot.createOrReplace(
      Seq((1, "a")).toDF("id", "tag"), dir, keepVersions = 3)
    store.registerSnapshot("wap", "t", dir)
    spark.conf.set("spark.wap.branch", "audit")
    try {
      spark.sql("INSERT INTO wap.t VALUES (2, 'b')")
      // live state untouched; the session reads the staged branch
      assert(graft.pipeline.Snapshot.read(spark, dir)
        .as[(Int, String)].collect().toSeq == Seq((1, "a")))
      assert(spark.sql("SELECT id FROM wap.t ORDER BY id")
        .as[Int].collect().toSeq == Seq(1, 2))
      // writes COMPOSE on the branch
      spark.sql("UPDATE wap.t SET tag = 'z' WHERE id = 2")
      assert(spark.sql("SELECT tag FROM wap.t WHERE id = 2")
        .as[String].head() == "z")
      assert(graft.pipeline.Snapshot.read(spark, dir).count() == 1L)
      // publish: the audited branch becomes live in one swap
      spark.sql("""CALL iceberg.system.fast_forward(
        table => 'wap.t', branch => 'audit')""")
    } finally spark.conf.unset("spark.wap.branch")
    assert(spark.sql("SELECT id, tag FROM wap.t ORDER BY id")
      .as[(Int, String)].collect().toSeq ==
      Seq((1, "a"), (2, "z")))
    // pre-publish live state rolled into history
    assert(spark.sql("SELECT count(*) FROM wap.t VERSION AS OF 1")
      .as[Long].head() == 1L)
  }

  test("session-catalog INSERT and DROP TABLE stay on Spark's native " +
    "path when the target is not a graft table") {
    TableStore.reset(spark)
    spark.sql("DROP TABLE IF EXISTS native_ins")
    spark.sql("CREATE TABLE native_ins (id INT, tag STRING) USING parquet")
    spark.sql("INSERT INTO native_ins VALUES (1, 'a'), (2, 'b')")
    assert(spark.table("native_ins").count() == 2)
    spark.sql("DROP TABLE native_ins")
    assert(!spark.catalog.tableExists("native_ins"))
  }
}
