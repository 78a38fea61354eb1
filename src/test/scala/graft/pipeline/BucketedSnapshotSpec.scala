package graft.pipeline

import graft.{SparkSpec, Tables}
import graft.catalog.TableStore
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-partitioned joins on SNAPSHOT tables (Iceberg 1.8's SPJ):
  * a snapshot written under a `bucket(n,c)` spec reports
  * `HashPartitioning(c, n)` from its scan, so a join/MERGE keyed on
  * `c` plans with ZERO exchanges on the snapshot side — the staging
  * side alone shuffles to n partitions — and two same-spec snapshots
  * join with zero exchanges on BOTH sides. The recurring-MERGE cost
  * lever of the reference's workload
  * (`/root/reference/jobs/merge_orders_silver.py:135-147`). */
class BucketedSnapshotSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("bucket-spec snapshot round-trips row-identical, carries the " +
    "layout marker, and every data file is bucket-named") {
    val dir = Files.createTempDirectory("spjrt").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Snapshot.setPartitionSpec(dir, Seq("bucket(8,o_custkey)"))
    Snapshot.createOrReplaceCurrentSpec(orders, dir)
    assert(Snapshot.bucketLayout(dir).contains((8, Seq("o_custkey"))))
    val back = Snapshot.read(spark, dir)
    assert(back.columns.toSeq.sorted ==
      Seq("o_custkey", "o_orderkey", "o_totalprice"),
      "hidden bucket fragment field must not leak")
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // every file name must parse to a bucket id < 8 (Spark convention)
    import scala.jdk.CollectionConverters._
    val s = Files.walk(java.nio.file.Paths.get(dir))
    val names = try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(_.getFileName.toString).toSeq
    finally s.close()
    assert(names.nonEmpty)
    names.foreach { n =>
      val id = org.apache.spark.sql.execution.datasources.BucketingUtils
        .getBucketId(n)
      assert(id.exists(_ < 8), s"file not bucket-named: $n")
    }
  }

  test("join keyed on the bucket column plans ONE exchange total — " +
    "the staging side — and none above the snapshot scan") {
    val dir = Files.createTempDirectory("spjjoin").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Snapshot.setPartitionSpec(dir, Seq("bucket(8,o_custkey)"))
    Snapshot.createOrReplaceCurrentSpec(orders, dir)
    val customer = Tables.customer(spark, sf)
      .select("c_custkey", "c_name")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Snapshot.read(spark, dir)
        .join(customer, col("o_custkey") === col("c_custkey"))
      val plan = finalPlan(joined)
      assert(exchanges(plan) == 1,
        s"expected exactly the staging-side exchange:\n$plan")
      assert(plan.contains("Bucketed: true") ||
        plan.contains("SelectedBucketsCount"),
        s"snapshot scan not bucketed:\n$plan")
      assert(joined.count() == orders.join(customer,
        col("o_custkey") === col("c_custkey")).count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("two same-spec snapshots join with ZERO exchanges; groupBy on " +
    "the bucket key also skips its exchange") {
    val base = Files.createTempDirectory("spj2").toString
    val d1 = base + "/orders"
    val d2 = base + "/cust"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf)
      .select("c_custkey", "c_name")
    Snapshot.setPartitionSpec(d1, Seq("bucket(8,o_custkey)"))
    Snapshot.createOrReplaceCurrentSpec(orders, d1)
    Snapshot.setPartitionSpec(d2, Seq("bucket(8,c_custkey)"))
    Snapshot.createOrReplaceCurrentSpec(customer, d2)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Snapshot.read(spark, d1)
        .join(Snapshot.read(spark, d2),
          col("o_custkey") === col("c_custkey"))
      val plan = finalPlan(joined)
      assert(exchanges(plan) == 0,
        s"same-spec snapshot join must not exchange:\n$plan")
      assert(joined.count() == orders.join(customer,
        col("o_custkey") === col("c_custkey")).count())
      val agg = Snapshot.read(spark, d1)
        .groupBy("o_custkey").agg(sum("o_totalprice"))
      val aggPlan = finalPlan(agg)
      assert(exchanges(aggPlan) == 0,
        s"bucket-key aggregation must not exchange:\n$aggPlan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("mismatched bucket counts (16 vs 8) still join exchange-free " +
    "under Spark's coalesce-buckets-in-join") {
    val base = Files.createTempDirectory("spjco").toString
    val d1 = base + "/orders16"
    val d2 = base + "/cust8"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf)
      .select("c_custkey", "c_name")
    Snapshot.setPartitionSpec(d1, Seq("bucket(16,o_custkey)"))
    Snapshot.createOrReplaceCurrentSpec(orders, d1)
    Snapshot.setPartitionSpec(d2, Seq("bucket(8,c_custkey)"))
    Snapshot.createOrReplaceCurrentSpec(customer, d2)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      val joined = Snapshot.read(spark, d1)
        .join(Snapshot.read(spark, d2),
          col("o_custkey") === col("c_custkey"))
      val plan = finalPlan(joined)
      assert(exchanges(plan) == 0,
        s"16x8 bucket join must coalesce, not exchange:\n$plan")
      assert(joined.count() == orders.join(customer,
        col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set(
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false")
    }
  }

  test("the SQL path reports the same partitioning: a registered " +
    "bucket-spec table aggregates its key through spark.sql with " +
    "zero exchanges") {
    TableStore.reset(spark)
    val dir = Files.createTempDirectory("spjsql").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Snapshot.setPartitionSpec(dir, Seq("bucket(8,o_custkey)"))
    Snapshot.createOrReplaceCurrentSpec(orders, dir)
    new TableStore(spark).registerSnapshot("spjs", "orders", dir)
    val agg = spark.sql(
      """SELECT o_custkey, sum(o_totalprice) AS s
         FROM spjs.orders GROUP BY o_custkey""")
    val plan = finalPlan(agg)
    assert(exchanges(plan) == 0,
      s"SQL-path bucket-key aggregation must not exchange:\n$plan")
  }

  test("MERGE INTO a bucket-spec snapshot keeps the target side " +
    "exchange-free and commits correctly under the layout") {
    TableStore.reset(spark)
    val dir = Files.createTempDirectory("spjmerge").toString + "/t"
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Snapshot.setPartitionSpec(dir, Seq("bucket(8,o_orderkey)"))
    Snapshot.createOrReplaceCurrentSpec(orders, dir, keepVersions = 2)
    new TableStore(spark).registerSnapshot("spj", "orders", dir)
    // the delta join the MERGE plans: target keyed on the bucket
    // column — target side must not exchange (the SPJ claim); verify
    // via the equivalent DataFrame join the command builds
    val batch = orders.limit(50)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val delta = Snapshot.read(spark, dir).as("t")
        .join(batch.as("s"), col("t.o_orderkey") === col("s.o_orderkey"),
          "left_outer")
      val plan = finalPlan(delta)
      assert(exchanges(plan) == 1,
        s"MERGE-shaped join must exchange only the batch side:\n$plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    // and the actual SQL MERGE commits correctly, re-laying the table
    // out under the same bucket spec
    batch.createOrReplaceTempView("spj_batch")
    spark.sql("""MERGE INTO spj.orders t USING spj_batch s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET t.o_totalprice = s.o_totalprice
      WHEN NOT MATCHED THEN INSERT *""")
    assert(Snapshot.bucketLayout(dir).contains((8, Seq("o_orderkey"))),
      "the MERGE commit must preserve the bucket layout")
    val after = Snapshot.read(spark, dir)
    assert(after.count() == orders.count())
    val changed = after.as("a")
      .join(batch.select(col("o_orderkey").as("k"),
        col("o_totalprice").as("p")), col("a.o_orderkey") === col("k"))
      .filter(col("a.o_totalprice") =!= col("p")).count()
    assert(changed == 0L, "MERGE updates must have landed")
  }

  test("TRUNCATE / DELETE-all leave a partitioned or bucketed table " +
    "READABLE (empty, schema intact); the layout returns at the next " +
    "non-empty commit") {
    TableStore.reset(spark)
    import spark.implicits._
    // bucket-spec table
    val d1 = Files.createTempDirectory("spjtr").toString + "/t"
    Snapshot.setPartitionSpec(d1, Seq("bucket(4,id)"))
    Snapshot.createOrReplaceCurrentSpec(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "tag"), d1,
      keepVersions = 2)
    new TableStore(spark).registerSnapshot("spjt", "t", d1)
    spark.sql("TRUNCATE TABLE spjt.t")
    val empty = spark.sql("SELECT * FROM spjt.t")
    assert(empty.columns.toSeq.sorted == Seq("id", "tag"),
      "the truncated table must keep its logical schema")
    assert(empty.count() == 0L)
    // identity-partitioned table, emptied by a DELETE matching all
    val d2 = Files.createTempDirectory("spjtr2").toString + "/t"
    Snapshot.createOrReplacePartitioned(
      (1 to 90).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"),
      d2, Seq("grp"), keepVersions = 2)
    new TableStore(spark).registerSnapshot("spjt", "t2", d2)
    spark.sql("DELETE FROM spjt.t2 WHERE id > 0")
    val empty2 = spark.sql("SELECT * FROM spjt.t2")
    assert(empty2.columns.toSeq.sorted == Seq("grp", "id"),
      "identity partition columns must survive the empty state")
    assert(empty2.count() == 0L)
    // the next non-empty commit restores fragments + bucket layout
    spark.sql("INSERT INTO spjt.t VALUES (7, 'x'), (8, 'y')")
    assert(Snapshot.bucketLayout(d1).contains((4, Seq("id"))),
      "the bucket layout must return with the next non-empty commit")
    assert(spark.sql("SELECT count(*) FROM spjt.t").head.getLong(0) == 2L)
    // pre-truncate state stays time-travelable
    assert(Snapshot.readAsOf(spark, d1, 1).count() == 100L)
  }

  test("COMPOSITE bucket spec bucket(8,k1,k2): the scan reports the " +
    "multi-column HashPartitioning, a two-column MERGE-shaped join " +
    "exchanges only the batch side, and same-spec tables join with " +
    "zero exchanges") {
    TableStore.reset(spark)
    val base = Files.createTempDirectory("spjmulti").toString
    val dir = base + "/t"
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    Snapshot.setPartitionSpec(dir, Seq("bucket(8,l_orderkey,l_linenumber)"))
    Snapshot.createOrReplaceCurrentSpec(lines, dir, keepVersions = 2)
    assert(Snapshot.bucketLayout(dir)
      .contains((8, Seq("l_orderkey", "l_linenumber"))))
    val back = Snapshot.read(spark, dir)
    assert(back.exceptAll(lines).isEmpty && lines.exceptAll(back).isEmpty,
      "composite-bucket layout must round-trip row-identical")
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // MERGE-shaped join on the FULL composite key: only the staged
      // batch shuffles, never the stored table
      val batch = lines.limit(50)
        .withColumn("l_quantity", col("l_quantity") + 1.0)
      val delta = Snapshot.read(spark, dir).as("t")
        .join(batch.as("s"),
          col("t.l_orderkey") === col("s.l_orderkey") &&
            col("t.l_linenumber") === col("s.l_linenumber"),
          "left_outer")
      val plan = finalPlan(delta)
      assert(exchanges(plan) == 1,
        s"composite-key MERGE join must exchange only the batch:\n$plan")
      // two same-spec snapshots: zero exchanges on both sides
      val d2 = base + "/t2"
      Snapshot.setPartitionSpec(d2,
        Seq("bucket(8,l_orderkey,l_linenumber)"))
      Snapshot.createOrReplaceCurrentSpec(
        lines.withColumnRenamed("l_quantity", "q2"), d2)
      val both = Snapshot.read(spark, dir)
        .join(Snapshot.read(spark, d2),
          Seq("l_orderkey", "l_linenumber"))
      val bothPlan = finalPlan(both)
      assert(exchanges(bothPlan) == 0,
        s"same-composite-spec join must not exchange:\n$bothPlan")
      // the fixture's (l_orderkey, l_linenumber) is NOT unique, so
      // compare against the plain (layout-free) join count
      assert(both.count() == lines.join(
        lines.withColumnRenamed("l_quantity", "q2"),
        Seq("l_orderkey", "l_linenumber")).count())
      // composite-key aggregation also rides the layout
      val agg = Snapshot.read(spark, dir)
        .groupBy("l_orderkey", "l_linenumber").agg(sum("l_quantity"))
      val aggPlan = finalPlan(agg)
      assert(exchanges(aggPlan) == 0,
        s"composite-bucket-key agg must not exchange:\n$aggPlan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("MOR sidecars stack on a bucketed base without breaking reads " +
    "(the zero-exchange claim returns after compaction)") {
    TableStore.reset(spark)
    val dir = Files.createTempDirectory("spjmor").toString + "/t"
    import spark.implicits._
    val data = (1 to 400).map(i => (i.toLong, s"v$i")).toDF("id", "tag")
    Snapshot.setPartitionSpec(dir, Seq("bucket(4,id)"))
    Snapshot.createOrReplaceCurrentSpec(data, dir, keepVersions = 3)
    new TableStore(spark).registerSnapshot("spjm", "t", dir)
    spark.sql("""ALTER TABLE spjm.t SET TBLPROPERTIES(
      'write.delete.mode'='merge-on-read')""")
    spark.sql("DELETE FROM spjm.t WHERE id <= 10")
    assert(Snapshot.morVersions(dir).nonEmpty)
    assert(spark.sql("SELECT count(*) c FROM spjm.t").head.getLong(0)
      == 390L)
    // compaction re-materializes under the spec — bucket layout and
    // the exchange-free aggregation both return
    spark.sql("CALL system.rewrite_position_delete_files('spjm.t')")
    assert(Snapshot.morVersions(dir).isEmpty)
    assert(Snapshot.bucketLayout(dir).contains((4, Seq("id"))))
    val agg = Snapshot.read(spark, dir).groupBy("id").agg(count("*"))
    val plan = finalPlan(agg)
    assert(exchanges(plan) == 0,
      s"post-compaction bucket-key agg must not exchange:\n$plan")
  }
}
