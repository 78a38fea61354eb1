package graft.catalog

import graft.SparkSpec
import graft.cdc.Checkpoints

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  test("register / table / showSchemas / showTables / views") {
    val store = new TableStore(spark)
    store.createNamespace("bronze")
    store.register("silver", "t1", Seq(1).toDF("x"))
    store.createView("silver", "v1", Seq(2).toDF("x"))
    assert(store.listNamespaces() == Seq("bronze", "silver"))
    assert(store.table("silver.t1").as[Int].head() == 1)
    val tables = store.showTables("silver")
      .as[(String, String, Boolean)].collect().toSet
    assert(tables == Set(("silver", "t1", false), ("silver", "v1", true)))
  }

  test("createTableIfNotExists is idempotent and keeps data") {
    val store = new TableStore(spark)
    val t = store.createTableIfNotExists("m", "cp", Checkpoints.schema)
    assert(t.count() == 0)
    store.register("m", "cp", Seq(("p", 1L, ts("2026-01-01 00:00:00")))
      .toDF("pipeline", "last_offset", "updated_at"))
    val again = store.createTableIfNotExists("m", "cp", Checkpoints.schema)
    assert(again.count() == 1) // not re-created
  }

  test("temp views reach spark.sql (S10 staging path)") {
    val store = new TableStore(spark)
    store.register("ns", "tbl", Seq(7, 8).toDF("x"))
    store.stage("staging_x", Seq(9).toDF("x"))
    val n = spark.sql(
      "SELECT count(*) FROM (SELECT x FROM ns_tbl UNION ALL SELECT x FROM staging_x)")
      .head().getLong(0)
    assert(n == 3)
  }
}
