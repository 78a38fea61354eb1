package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL `MERGE INTO` executed verbatim through `spark.sql` against
  * TableStore tables — the reference's write statement
  * (`merge_orders_silver.py:135-147`) with delete/update/insert
  * clauses, star actions, the `iceberg.` prefix, and the checkpoint
  * upsert (`:156-165`). */
class MergeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore = new TableStore(spark)

  test("reference-shaped MERGE: delete, conditional update, insert") {
    val store = freshStore()
    store.register("silver", "orders_current",
      Seq((1, 10, "old"), (2, 20, "gone"), (3, 30, "keep"))
        .toDF("order_id", "user_id", "status"))
    store.stage("staging_orders",
      Seq((1, 11, "upd", "u"), (2, 20, "x", "d"), (4, 40, "new", "c"))
        .toDF("order_id", "user_id", "status", "op"))

    spark.sql("""
      MERGE INTO iceberg.silver.orders_current t
      USING staging_orders s
      ON t.order_id = s.order_id
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED AND s.op <> 'd' THEN UPDATE SET
        user_id = s.user_id, status = s.status
      WHEN NOT MATCHED AND s.op <> 'd' THEN
        INSERT (order_id, user_id, status)
        VALUES (s.order_id, s.user_id, s.status)""")

    val got = store.table("silver", "orders_current")
      .as[(Int, Int, String)].collect().toSet
    assert(got == Set((1, 11, "upd"), (3, 30, "keep"), (4, 40, "new")))
    // qualified-read path sees the merged state too
    val viaSql = spark.sql(
      "SELECT count(*) FROM silver.orders_current").as[Long].head()
    assert(viaSql == 3)
  }

  test("schema evolution then MERGE backfill: ALTER TABLE ADD COLUMNS " +
    "followed by MERGE INTO writing the new column (the Iceberg " +
    "evolve-then-backfill workflow, both statements verbatim)") {
    val store = freshStore()
    store.register("silver", "t_evo",
      Seq((1, "a"), (2, "b")).toDF("id", "v"))
    spark.sql("ALTER TABLE iceberg.silver.t_evo ADD COLUMNS (score INT)")
    store.stage("src_evo",
      Seq((1, 10), (3, 30)).toDF("id", "score"))
    spark.sql("""
      MERGE INTO iceberg.silver.t_evo t USING src_evo s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET score = s.score
      WHEN NOT MATCHED THEN INSERT (id, v, score)
        VALUES (s.id, 'backfilled', s.score)""")
    val got = store.table("silver", "t_evo")
      .as[(Int, String, Option[Int])].collect().toSet
    assert(got == Set((1, "a", Some(10)), (2, "b", None),
      (3, "backfilled", Some(30))))
  }

  test("ALTER COLUMN TYPE widening then MERGE backfill: INT widens to " +
    "BIGINT carrying data, the merge writes values beyond INT range; " +
    "narrowing and cross-type changes are rejected") {
    val store = freshStore()
    store.register("silver", "t_widen",
      Seq((1, 10), (2, 20)).toDF("id", "score"))
    spark.sql(
      "ALTER TABLE iceberg.silver.t_widen ALTER COLUMN score TYPE BIGINT")
    // existing data carried, schema widened
    assert(store.table("silver", "t_widen").schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(store.table("silver", "t_widen")
      .as[(Int, Long)].collect().toSet == Set((1, 10L), (2, 20L)))
    // backfill through MERGE with a value only BIGINT can hold
    store.stage("src_widen",
      Seq((2, 5_000_000_000L), (3, 6_000_000_000L)).toDF("id", "score"))
    spark.sql("""
      MERGE INTO iceberg.silver.t_widen t USING src_widen s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET score = s.score
      WHEN NOT MATCHED THEN INSERT (id, score) VALUES (s.id, s.score)""")
    assert(store.table("silver", "t_widen")
      .as[(Int, Long)].collect().toSet ==
      Set((1, 10L), (2, 5_000_000_000L), (3, 6_000_000_000L)))
    // narrowing (BIGINT → INT) and cross-type (INT → STRING) rejected
    val e1 = intercept[UnsupportedOperationException] { spark.sql(
      "ALTER TABLE iceberg.silver.t_widen ALTER COLUMN score TYPE INT") }
    assert(e1.getMessage.contains("widening"))
    intercept[UnsupportedOperationException] { spark.sql(
      "ALTER TABLE iceberg.silver.t_widen ALTER COLUMN id TYPE STRING") }
    // DECIMAL precision growth allowed at the same scale; scale change
    // rejected
    store.register("silver", "t_dec",
      Seq((1, BigDecimal("12.34"))).toDF("id", "amt")
        .select($"id", $"amt".cast("decimal(10,2)").as("amt")))
    spark.sql(
      "ALTER TABLE iceberg.silver.t_dec ALTER COLUMN amt TYPE DECIMAL(12,2)")
    assert(store.table("silver", "t_dec").schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    intercept[UnsupportedOperationException] { spark.sql(
      "ALTER TABLE iceberg.silver.t_dec ALTER COLUMN amt TYPE DECIMAL(14,4)") }
    // non-TYPE alterations are rejected loudly, native targets untouched
    intercept[UnsupportedOperationException] { spark.sql(
      "ALTER TABLE silver.t_widen ALTER COLUMN score COMMENT 'x'") }
  }

  test("standalone DELETE FROM and UPDATE run verbatim: condition " +
    "semantics (NULL keeps), type-cast assignments, unknown column raises") {
    val store = freshStore()
    store.register("dml", "t",
      Seq((1, Some("a"), 10), (2, Some("b"), 20), (3, None, 30))
        .toDF("id", "tag", "v"))
    // NULL tag row: condition NULL → neither deleted nor updated
    spark.sql("DELETE FROM iceberg.dml.t WHERE tag = 'b'")
    spark.sql("UPDATE dml.t SET v = v + 1, tag = upper(tag) WHERE tag = 'a'")
    val got = store.table("dml", "t")
      .as[(Int, Option[String], Int)].collect().toSet
    assert(got == Set((1, Some("A"), 11), (3, None, 30)))
    // assignment value is cast to the column type (string → int col)
    spark.sql("UPDATE dml.t SET v = '99' WHERE id = 3")
    assert(store.table("dml", "t").filter($"id" === 3)
      .select("v").as[Int].head() == 99)
    // qualified SQL read sees the committed state
    assert(spark.sql("SELECT count(*) FROM dml.t").as[Long].head() == 2)
    intercept[Exception] {
      spark.sql("UPDATE dml.t SET nope = 1") }
    intercept[Exception] {
      spark.sql("DELETE FROM dml.unregistered WHERE 1 = 1") }
    // DELETE without WHERE empties the table
    spark.sql("DELETE FROM iceberg.dml.t")
    assert(store.table("dml", "t").count() == 0)
  }

  test("UPDATE SET * / INSERT * star actions expand the target schema") {
    val store = freshStore()
    store.register("silver", "t_star",
      Seq((1, "a"), (2, "b")).toDF("id", "v"))
    store.stage("src_star", Seq((2, "B"), (3, "C")).toDF("id", "v"))
    spark.sql("""
      MERGE INTO silver.t_star t USING src_star s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val got = store.table("silver", "t_star")
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "B"), (3, "C")))
  }

  test("MERGE schema evolution (merge-schema): star actions ADD " +
    "source-only columns when enabled — untouched rows read NULL; " +
    "without the flag extras are ignored and the schema is unchanged") {
    val store = freshStore()
    def freshTarget(): Unit = store.register("ms", "t",
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    store.stage("ms_src",
      Seq((2, "b2", 20.0), (9, "i", 90.0)).toDF("id", "v", "w"))

    // default: the star expands from the TARGET schema; the source's
    // extra column w is ignored, schema unchanged
    freshTarget()
    spark.sql("""MERGE INTO iceberg.ms.t t USING ms_src s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(store.table("ms", "t").columns.toSeq == Seq("id", "v"))

    // session-conf arm
    freshTarget()
    spark.conf.set("spark.graft.merge.mergeSchema", "true")
    try {
      spark.sql("""MERGE INTO iceberg.ms.t t USING ms_src s
                   ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET *
                   WHEN NOT MATCHED THEN INSERT *""")
    } finally spark.conf.unset("spark.graft.merge.mergeSchema")
    val out = store.table("ms", "t")
      .orderBy("id").as[(Int, String, Option[Double])].collect().toSeq
    assert(out == Seq((1, "a", None), (2, "b2", Some(20.0)),
      (3, "c", None), (9, "i", Some(90.0))))

    // explicit-assignment MERGE never widens, even with the flag on
    freshTarget()
    spark.conf.set("spark.graft.merge.mergeSchema", "true")
    try {
      spark.sql("""MERGE INTO iceberg.ms.t t USING ms_src s
                   ON t.id = s.id
                   WHEN MATCHED THEN UPDATE SET v = s.v""")
    } finally spark.conf.unset("spark.graft.merge.mergeSchema")
    assert(store.table("ms", "t").columns.toSeq == Seq("id", "v"))
  }

  test("checkpoint-style upsert with an inline SELECT source") {
    val store = freshStore()
    store.register("monitoring", "cdc_checkpoints",
      Seq(("orders", 100L)).toDF("pipeline", "last_offset"))
    spark.sql("""
      MERGE INTO monitoring.cdc_checkpoints t
      USING (SELECT 'orders' AS pipeline, 250 AS last_offset) s
      ON t.pipeline = s.pipeline
      WHEN MATCHED THEN UPDATE SET last_offset = s.last_offset
      WHEN NOT MATCHED THEN INSERT (pipeline, last_offset)
      VALUES (s.pipeline, s.last_offset)""")
    spark.sql("""
      MERGE INTO monitoring.cdc_checkpoints t
      USING (SELECT 'events' AS pipeline, 7 AS last_offset) s
      ON t.pipeline = s.pipeline
      WHEN MATCHED THEN UPDATE SET last_offset = s.last_offset
      WHEN NOT MATCHED THEN INSERT (pipeline, last_offset)
      VALUES (s.pipeline, s.last_offset)""")
    val got = store.table("monitoring", "cdc_checkpoints")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("orders", 250L), ("events", 7L)))
  }

  test("cardinality guard raises BY DEFAULT when a target row matches " +
    "several source rows (Iceberg's MERGE contract); opt-out lets the " +
    "duplicate flow") {
    val store = freshStore()
    store.register("silver", "t_card", Seq((1, "a")).toDF("id", "v"))
    store.stage("src_card", Seq((1, "x"), (1, "y")).toDF("id", "v"))
    val sql = """
      MERGE INTO silver.t_card t USING src_card s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v"""
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // default (no conf set): the guard is on
    val e = intercept[Exception](spark.sql(sql))
    assert(msgs(e).exists(_.contains("cardinality violation")), e)
    // explicit true behaves identically
    spark.conf.set("spark.graft.merge.checkCardinality", "true")
    try {
      val e2 = intercept[Exception](spark.sql(sql))
      assert(msgs(e2).exists(_.contains("cardinality violation")), e2)
      // opt-out: the duplicate match flows through (documented deviation)
      spark.conf.set("spark.graft.merge.checkCardinality", "false")
      spark.sql(sql)
      assert(store.table("silver", "t_card").count() == 2)
    } finally spark.conf.unset("spark.graft.merge.checkCardinality")
  }

  test("NOT MATCHED BY SOURCE clauses apply to unreferenced target rows") {
    val store = freshStore()
    store.register("silver", "t_bysrc",
      Seq((1, "live"), (2, "stale"), (3, "live"))
        .toDF("id", "state"))
    store.stage("src_bysrc", Seq(Tuple1(1), Tuple1(3)).toDF("id"))
    spark.sql("""
      MERGE INTO silver.t_bysrc t USING src_bysrc s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET state = 'seen'
      WHEN NOT MATCHED BY SOURCE AND t.state = 'stale' THEN DELETE""")
    val got = store.table("silver", "t_bysrc")
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "seen"), (3, "seen")))
  }
}
