package graft.catalog

import graft.SparkSpec
import graft.pipeline.Snapshot

/** Delta-style CHECK constraints (`graft.constraints.<name>` table
  * properties) enforced at every DML commit path — CoW, MOR appends,
  * fast-append — with the table untouched on violation; plus the
  * `.position_deletes` metadata table. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String, mor: Boolean): String = {
    val dir = java.nio.file.Files.createTempDirectory(tag)
      .toString + "/t"
    Snapshot.createOrReplace(
      Seq((1L, 10.0, "O"), (2L, 20.0, "F")).toDF("id", "amt", "st"),
      dir, keepVersions = 4)
    new TableStore(spark).registerSnapshot("ck", tag, dir)
    spark.sql(s"""ALTER TABLE ck.$tag SET TBLPROPERTIES(
      'graft.constraints.amt_positive'='amt > 0',
      'graft.constraints.known_status'="st IN ('O','F','P')"""" +
      (if (mor) """,
      'write.delete.mode'='merge-on-read',
      'write.update.mode'='merge-on-read',
      'write.merge.mode'='merge-on-read')""" else ")"))
    dir
  }

  test("CoW paths: violating INSERT/UPDATE raise naming the " +
    "constraint; the table never commits; valid statements pass") {
    TableStore.reset(spark)
    val dir = freshTable("cow", mor = false)
    spark.sql("INSERT INTO ck.cow VALUES (3, 30.0, 'P')") // valid
    val e1 = intercept[IllegalStateException] {
      spark.sql("INSERT INTO ck.cow VALUES (4, -5.0, 'O')")
    }
    assert(e1.getMessage.contains("amt_positive") &&
      e1.getMessage.contains("1 row(s)"))
    val e2 = intercept[IllegalStateException] {
      spark.sql("UPDATE ck.cow SET st = 'X' WHERE id = 1")
    }
    assert(e2.getMessage.contains("known_status"))
    // table state: the valid insert landed, nothing else
    assert(spark.sql("SELECT id FROM ck.cow ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    assert(Snapshot.currentVersion(dir).contains(2L),
      "only the valid insert may have committed a version")
    // NULL passes (SQL CHECK): an amt-less row is not a violation
    spark.sql("INSERT INTO ck.cow VALUES (5, CAST(NULL AS DOUBLE), 'O')")
    assert(spark.sql("SELECT count(*) FROM ck.cow").head().getLong(0)
      == 4L)
  }

  test("MOR paths check only the appended rows: violating UPDATE and " +
    "fast-append raise before any sidecar lands; DELETE needs no check") {
    TableStore.reset(spark)
    val dir = freshTable("mor", mor = true)
    val e1 = intercept[IllegalStateException] {
      spark.sql("UPDATE ck.mor SET amt = -amt WHERE id = 2")
    }
    assert(e1.getMessage.contains("amt_positive"))
    val e2 = intercept[IllegalStateException] {
      spark.sql("INSERT INTO ck.mor VALUES (9, 90.0, 'Q')")
    }
    assert(e2.getMessage.contains("known_status"))
    assert(Snapshot.morVersions(dir).isEmpty,
      "no sidecar may land for a violating statement")
    spark.sql("DELETE FROM ck.mor WHERE id = 2") // deletes can't violate
    spark.sql("UPDATE ck.mor SET amt = amt + 1 WHERE id = 1")
    assert(Snapshot.morVersions(dir) == Seq(2L, 3L))
    val e3 = intercept[IllegalStateException] {
      spark.sql("""MERGE INTO ck.mor t USING (SELECT 1 AS k) s
        ON t.id = s.k WHEN MATCHED THEN UPDATE SET amt = -1.0""")
    }
    assert(e3.getMessage.contains("amt_positive"))
    // UNSET lifts the constraint
    spark.sql("ALTER TABLE ck.mor UNSET TBLPROPERTIES(" +
      "'graft.constraints.amt_positive')")
    spark.sql("UPDATE ck.mor SET amt = -amt WHERE id = 1")
    assert(spark.sql("SELECT amt FROM ck.mor WHERE id = 1")
      .head().getDouble(0) < 0)
  }

  test("ADD/DROP CONSTRAINT DDL runs verbatim: existing data is " +
    "validated first (Delta's contract), the constraint then gates " +
    "writes, DROP lifts it") {
    TableStore.reset(spark)
    val store = new TableStore(spark)
    val dir = java.nio.file.Files.createTempDirectory("ckddl")
      .toString + "/t"
    Snapshot.createOrReplace(
      Seq((1L, 10.0), (2L, -3.0)).toDF("id", "amt"), dir,
      keepVersions = 3)
    store.registerSnapshot("ck", "ddl", dir)
    // current data violates → the ALTER itself fails, nothing stored
    val e = intercept[IllegalStateException] {
      spark.sql("ALTER TABLE ck.ddl ADD CONSTRAINT amt_pos " +
        "CHECK (amt > 0)")
    }
    assert(e.getMessage.contains("1 existing row"))
    assert(!store.properties("ck", "ddl")
      .contains("graft.constraints.amt_pos"))
    // clean the data, add, and the gate engages
    spark.sql("DELETE FROM ck.ddl WHERE amt < 0")
    spark.sql("ALTER TABLE iceberg.ck.ddl ADD CONSTRAINT amt_pos " +
      "CHECK (amt > 0)")
    assert(store.properties("ck", "ddl")("graft.constraints.amt_pos")
      == "amt > 0")
    intercept[IllegalArgumentException] { // duplicate name
      spark.sql("ALTER TABLE ck.ddl ADD CONSTRAINT amt_pos " +
        "CHECK (amt > 1)")
    }
    val e2 = intercept[IllegalStateException] {
      spark.sql("INSERT INTO ck.ddl VALUES (3, -1.0)")
    }
    assert(e2.getMessage.contains("amt_pos"))
    spark.sql("ALTER TABLE ck.ddl DROP CONSTRAINT amt_pos")
    spark.sql("INSERT INTO ck.ddl VALUES (3, -1.0)") // now admitted
    assert(spark.sql("SELECT count(*) FROM ck.ddl").head().getLong(0)
      == 2L)
    val e3 = intercept[java.util.NoSuchElementException] {
      spark.sql("ALTER TABLE ck.ddl DROP CONSTRAINT ghost")
    }
    assert(e3.getMessage.contains("no such constraint: ghost"),
      s"DROP must speak constraint vocabulary: ${e3.getMessage}")
    spark.sql("ALTER TABLE ck.ddl DROP CONSTRAINT IF EXISTS ghost")
    // an unnamed ADD CHECK would store a RANDOM undroppable key —
    // rejected with guidance instead
    val e4 = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE ck.ddl ADD CHECK (amt > 0)")
    }
    assert(e4.getMessage.contains("requires a constraint name"))
    // a bad expression fails the ALTER with the constraint named
    val e5 = intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE ck.ddl ADD CONSTRAINT nope " +
        "CHECK (no_such_col > 0)")
    }
    assert(e5.getMessage.contains("ADD CONSTRAINT nope"))
    // a constraint smuggled in UNPARSEABLE through the property form
    // (ADD CONSTRAINT validates; SET TBLPROPERTIES cannot) must
    // surface the parse diagnostic at the write, not the misleading
    // missing-columns message — Spark 4's Column API is lazy, so the
    // parse probe must be eager
    spark.sql("""ALTER TABLE ck.ddl SET TBLPROPERTIES(
      'graft.constraints.garbled'='amt >= (')""")
    val e6 = intercept[IllegalArgumentException] {
      spark.sql("INSERT INTO ck.ddl VALUES (9, 90.0)")
    }
    assert(e6.getMessage.contains("unparseable"),
      s"the parse diagnostic must name the real problem: " +
        s"${e6.getMessage}")
    spark.sql(
      "ALTER TABLE ck.ddl UNSET TBLPROPERTIES('graft.constraints.garbled')")
  }

  test(".position_deletes lists live (file, pos) pairs with their " +
    "delete file; empty on a clean table") {
    TableStore.reset(spark)
    val dir = java.nio.file.Files.createTempDirectory("pdmeta")
      .toString + "/t"
    Snapshot.createOrReplace(
      (1 to 10).map(i => (i, s"r$i")).toDF("id", "tag"), dir,
      keepVersions = 3)
    new TableStore(spark).registerSnapshot("pd", "t", dir)
    assert(spark.sql("SELECT * FROM pd.t.position_deletes").isEmpty)
    spark.sql("""ALTER TABLE pd.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.mor.deletes'='position')""")
    spark.sql("DELETE FROM pd.t WHERE id IN (2, 4, 6)")
    val rows = spark.sql(
      "SELECT file_path, pos, delete_file_path FROM pd.t.position_deletes")
      .as[(String, Long, String)].collect().toSeq
    assert(rows.size == 3)
    assert(rows.forall(_._3.contains("/_mor/v2/pos_deletes/")))
    assert(rows.forall(r => !r._1.startsWith("file:")),
      "data-file ids are relative")
  }
}
