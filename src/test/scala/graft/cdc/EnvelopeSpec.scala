package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Envelope parse: wrapped/bare payload, amount cleanup, before/after
  * coalesce, second-truncating timestamp
  * (`/root/reference/jobs/build_orders_silver.py:27-91`). */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def bronzeOf(values: String*) =
    values.toSeq.toDF("v")

  test("wrapped payload parses") {
    val v = """{"payload":{"before":null,"after":{"order_id":1,"user_id":7,
      "amount_eur":"19.99","status":"created","created_at":"2024-01-01 00:00:00"},
      "op":"c","ts_ms":1700000000123}}""".replaceAll("\n\\s*", "")
    val row = Envelope.parse(bronzeOf(v))
      .select("order_id", "user_id", "amount_eur", "status", "op", "ts_ms")
      .head()
    assert(row.getInt(0) == 1 && row.getInt(1) == 7)
    assert(row.getDouble(2) == 19.99)
    assert(row.getString(3) == "created" && row.getString(4) == "c")
    assert(row.getLong(5) == 1700000000123L)
  }

  test("bare payload (no wrapper) parses identically") {
    val bare = """{"before":null,"after":{"order_id":2,"user_id":8,
      "amount_eur":"5.00","status":"x","created_at":"2024-01-01 00:00:00"},
      "op":"c","ts_ms":1700000000000}""".replaceAll("\n\\s*", "")
    val row = Envelope.parse(bronzeOf(bare))
      .select("order_id", "amount_eur").head()
    assert(row.getInt(0) == 2 && row.getDouble(1) == 5.0)
  }

  test("polluted amount string is cleaned before cast") {
    val row = Envelope.parse(bronzeOf(
      """{"before":null,"after":{"order_id":3,"user_id":9,"amount_eur":" 42.50 ","status":"x","created_at":"c"},"op":"c","ts_ms":1}"""))
      .select("amount_eur").head()
    assert(row.getDouble(0) == 42.5)
  }

  test("delete uses before image (after is null)") {
    val v =
      """{"payload":{"before":{"order_id":4,"user_id":1,"amount_eur":"7.00","status":"gone","created_at":"c"},"after":null,"op":"d","ts_ms":9}}"""
    val row = Envelope.parse(bronzeOf(v))
      .select("order_id", "status", "op").head()
    assert(row.getInt(0) == 4 && row.getString(1) == "gone"
      && row.getString(2) == "d")
  }

  test("lastChangeTs truncates to whole seconds (reference parity)") {
    val out = bronzeOf("x")
      .select(Envelope.lastChangeTs(lit(1700000000999L)).as("t")).head()
    assert(out.getTimestamp(0) == ts("2023-11-14 22:13:20"))
  }
}
