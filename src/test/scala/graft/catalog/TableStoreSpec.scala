package graft.catalog

import graft.SparkSpec
import graft.cdc.Checkpoints

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  test("register / table / showSchemas / showTables / views") {
    TableStore.reset(spark) // state is session-shared; start clean
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

  test("qualified names resolve from spark.sql: ns.table and the " +
    "reference's iceberg.ns.table spelling") {
    val store = new TableStore(spark)
    store.register("silver", "orders_current",
      Seq((1, 700.0), (2, 300.0)).toDF("order_id", "amount_eur"))
    store.createView("silver", "orders_current_priv",
      store.table("silver.orders_current").filter($"amount_eur" > 500.0))
    // 2-part, the verbatim reference view query shape (README.md:121)
    val two = spark.sql(
      "SELECT order_id FROM silver.orders_current_priv ORDER BY order_id")
      .as[Int].collect().toSeq
    assert(two == Seq(1))
    // 3-part with the reference's catalog prefix
    val three = spark.sql(
      "SELECT count(*) FROM iceberg.silver.orders_current ORDER BY 1")
      .head().getLong(0)
    assert(three == 2)
    // alias qualification works (SubqueryAlias carries the table name)
    val aliased = spark.sql(
      """SELECT t.order_id FROM silver.orders_current t
         WHERE t.amount_eur > 500.0""").as[Int].collect().toSeq
    assert(aliased == Seq(1))
    // unknown names still fail analysis (rule leaves them untouched)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM silver.nope").collect()
    }
  }

  test("re-registration replaces the qualified-name target (view is " +
    "lazy over the registered plan)") {
    val store = new TableStore(spark)
    store.register("ns2", "t", Seq(1).toDF("x"))
    assert(spark.sql("SELECT x FROM ns2.t").as[Int].head() == 1)
    store.register("ns2", "t", Seq(42).toDF("x"))
    assert(spark.sql("SELECT x FROM ns2.t").as[Int].head() == 42)
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
