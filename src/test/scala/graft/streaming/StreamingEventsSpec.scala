package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ST5: append-mode watermarked windowed aggregation — windows emit
  * once when the watermark passes, and rows later than the watermark
  * are DROPPED by the state store (the bounded-state contract). */
class StreamingEventsSpec extends SparkSpec {
  import spark.implicits._

  test("windows finalize once past the watermark; late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamingEvents.windowedEventCounts(
      input.toDF().toDF("ts", "event_type"),
      watermark = "10 minutes", window_ = "1 hour")
    val q = out.writeStream
      .format("memory").queryName("st5_out").outputMode("append").start()
    try {
      // batch 1: two clicks inside the 00:00 window — nothing emits yet
      input.addData(
        (ts("2024-01-01 00:10:00"), "click"),
        (ts("2024-01-01 00:20:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("st5_out").count() == 0)

      // batch 2: 02:00 advances the watermark to 01:50 → the 00:00
      // window closes and emits its finalized count exactly once
      input.addData((ts("2024-01-01 02:00:00"), "click"))
      q.processAllAvailable()
      val closed = spark.table("st5_out")
        .select($"window_start".cast("string"), $"n_events")
        .as[(String, Long)].collect().toSet
      assert(closed == Set(("2024-01-01 00:00:00", 2L)))

      // batch 3: a row at 00:30 is far behind the 01:50 watermark →
      // dropped, NOT re-opened; 02:30 joins the live 02:00 window
      input.addData(
        (ts("2024-01-01 00:30:00"), "click"),
        (ts("2024-01-01 02:30:00"), "click"))
      q.processAllAvailable()

      // batch 4: 04:00 closes the 02:00 window
      input.addData((ts("2024-01-01 04:00:00"), "click"))
      q.processAllAvailable()

      val all = spark.table("st5_out")
        .select($"window_start".cast("string"), $"n_events")
        .as[(String, Long)].collect().toSet
      // 00:00 window still counts 2 (the late row never landed);
      // 02:00 window finalized with its two in-horizon rows
      assert(all == Set(
        ("2024-01-01 00:00:00", 2L),
        ("2024-01-01 02:00:00", 2L)))
    } finally q.stop()
  }
}
