package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Proves the bucketed-layout claim: two tables bucketed on the join
  * key join WITHOUT any exchange — the pre-shuffled-on-disk strategy a
  * 100-TB deployment uses for its recurring key joins. */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key runs with zero " +
    "exchanges and matches the plain join") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority")
    val lineitem = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    Bucketed.writeBucketed(orders, "b_orders", "o_orderkey", 8,
      Seq("o_orderkey"))
    Bucketed.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 8,
      Seq("l_orderkey"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n == lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count())
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("SelectedBucketsCount") ||
        plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("aggregation on the bucket key also skips its exchange") {
    val lineitem = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
    Bucketed.writeBucketed(lineitem, "b_li_agg", "l_orderkey", 8)
    try {
      val agg = spark.table("b_li_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_li_agg")
  }
}
