package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ST6/ST7: stream-static broadcast enrichment and the watermarked
  * stream-stream interval join (attribution), including cross-batch
  * matching and equivalence with the batch X12 range join. */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("ST6: every micro-batch enriches against the static dim; " +
    "unmatched rows keep nulls") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (11L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, String)]
    val out = StreamingJoins.enrichStream(
      input.toDF().toDF("user_id", "event"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("st6_out")
      .outputMode("append").start()
    try {
      input.addData((10L, "click"), (99L, "view"))
      q.processAllAvailable()
      input.addData((11L, "click"))
      q.processAllAvailable()
      val rows = spark.table("st6_out")
        .select($"user_id", $"event", $"tier")
        .as[(Long, String, Option[String])].collect().toSet
      assert(rows == Set(
        (10L, "click", Some("gold")),
        (99L, "view", None), // unmatched survives the left outer
        (11L, "click", Some("basic"))))
    } finally q.stop()
  }

  test("ST7: purchases attribute to in-window clicks across " +
    "micro-batches; out-of-window pairs never join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamingJoins.attributeStream(
      clicks.toDF().toDF("user_id", "click_id", "click_ts"),
      purchases.toDF().toDF("p_user_id", "purchase_id", "p_ts"),
      windowSec = 3600)
    val q = out.writeStream.format("memory").queryName("st7_out")
      .outputMode("append").start()
    try {
      // batch 1: clicks only — no matches yet
      clicks.addData(
        (1L, 100L, ts("2024-01-01 10:00:00")),
        (2L, 101L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      assert(spark.table("st7_out").count() == 0)

      // batch 2 (the other stream, a later micro-batch): user 1 buys
      // in-window; user 2 buys 2h after the click (out of window);
      // user 3 buys with no click at all
      purchases.addData(
        (1L, 500L, ts("2024-01-01 10:30:00")),
        (2L, 501L, ts("2024-01-01 12:30:00")),
        (3L, 502L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      val rows = spark.table("st7_out")
        .select($"click_id", $"purchase_id")
        .as[(Long, Long)].collect().toSet
      assert(rows == Set((100L, 500L)))

      // batch 3: a second in-window purchase by user 2 still matches
      // its batch-1 click — the click survived in join state
      purchases.addData((2L, 503L, ts("2024-01-01 10:50:00")))
      q.processAllAvailable()
      val all = spark.table("st7_out")
        .select($"click_id", $"purchase_id")
        .as[(Long, Long)].collect().toSet
      assert(all == Set((100L, 500L), (101L, 503L)))
    } finally q.stop()
  }

  test("ST7 equals the batch X12 interval join on the same input") {
    val clicks = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 101L, ts("2024-01-01 10:05:00")),
      (2L, 102L, ts("2024-01-01 11:40:00")))
      .toDF("user_id", "click_id", "click_ts")
    val purchases = Seq(
      (1L, 500L, ts("2024-01-01 10:30:00")),
      (2L, 501L, ts("2024-01-01 12:30:00")),
      (3L, 502L, ts("2024-01-01 10:10:00")))
      .toDF("p_user_id", "purchase_id", "p_ts")

    // streaming operator in batch mode (plan-compatible)
    val streamed = StreamingJoins.attributeStream(clicks, purchases)
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet

    // batch X12: points = purchases, intervals = [click, click+1h]
    val batch = graft.ext.RangeJoin.intervalJoin(
      purchases.selectExpr("p_user_id AS user_id", "purchase_id",
        "CAST(p_ts AS BIGINT) AS pt"),
      clicks.selectExpr("user_id", "click_id",
        "CAST(click_ts AS BIGINT) AS cs",
        "CAST(click_ts AS BIGINT) + 3600 AS ce"),
      "user_id", "pt", "cs", "ce", bucketWidth = 3600)
      .select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet

    assert(streamed == batch && batch == Set((100L, 500L), (102L, 501L)))
  }
}
