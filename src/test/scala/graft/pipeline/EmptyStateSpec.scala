package graft.pipeline

import graft.SparkSpec
import graft.catalog.TableStore
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Empty-frame edges across the commit surface: no statement may
  * leave a table unreadable, whatever it matched. (The partitionBy
  * write of zero rows emits NO files — the failure mode the
  * empty-state guards in Snapshot close; plain writes emit one
  * schema-bearing 0-row file and were always safe.) */
class EmptyStateSpec extends SparkSpec {
  import spark.implicits._

  test("no-match MOR DELETE (equality and position), empty-delta " +
    "MERGE, and an empty createOrReplacePartitioned all stay readable") {
    TableStore.reset(spark)
    val d = Files.createTempDirectory("ee1").toString + "/t"
    Snapshot.createOrReplace((1 to 20).map(i => (i.toLong, s"v$i"))
      .toDF("id", "tag"), d, keepVersions = 2)
    new TableStore(spark).registerSnapshot("ee", "t", d)
    spark.sql("""ALTER TABLE ee.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.merge.mode'='merge-on-read')""")
    spark.sql("DELETE FROM ee.t WHERE id = -999")
    assert(spark.sql("SELECT count(*) FROM ee.t").head.getLong(0) == 20L)
    Seq((999L, "z")).toDF("id", "tag").createOrReplaceTempView("ee_src")
    spark.sql("""MERGE INTO ee.t t USING ee_src s ON t.id = s.id
      WHEN MATCHED AND false THEN UPDATE SET tag = s.tag""")
    assert(spark.sql("SELECT count(*) FROM ee.t").head.getLong(0) == 20L)

    val d2 = Files.createTempDirectory("ee2").toString + "/t"
    Snapshot.createOrReplacePartitioned(
      Seq.empty[(Long, String)].toDF("id", "grp"), d2, Seq("grp"))
    assert(Snapshot.read(spark, d2).count() == 0L)
    assert(Snapshot.read(spark, d2).columns.toSeq.sorted ==
      Seq("grp", "id"))

    val d3 = Files.createTempDirectory("ee3").toString + "/t"
    Snapshot.createOrReplace((1 to 20).map(i => (i.toLong, s"v$i"))
      .toDF("id", "tag"), d3, keepVersions = 2)
    new TableStore(spark).registerSnapshot("ee", "t3", d3)
    spark.sql("""ALTER TABLE ee.t3 SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read',
      'write.mor.deletes'='position')""")
    spark.sql("DELETE FROM ee.t3 WHERE id = -999")
    assert(spark.sql("SELECT count(*) FROM ee.t3").head.getLong(0) == 20L)
  }
}
