package graft.cdc

import graft.SparkSpec

/** LWW dedup: ties on ts broken by offset; idempotence
  * (`/root/reference/jobs/merge_orders_silver.py:112-118`). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    (1, 100L, 1L, "old"),
    (1, 200L, 2L, "new"),
    (2, 100L, 3L, "a"),
    (2, 100L, 4L, "b"), // ts tie — offset must break it
    (3, 50L, 5L, "only")
  ).toDF("id", "ts_ms", "offset", "payload")

  test("latestByKey keeps newest, ties broken by offset") {
    val out = Dedup.latestByKey(events, Seq("id"), Seq("ts_ms", "offset"))
      .select("id", "payload").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "new", 2 -> "b", 3 -> "only"))
  }

  test("latestByKey is idempotent") {
    val once = Dedup.latestByKey(events, Seq("id"), Seq("ts_ms", "offset"))
    val twice = Dedup.latestByKey(once, Seq("id"), Seq("ts_ms", "offset"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("sortDropDuplicates (W2) agrees on single partition") {
    val out = Dedup.sortDropDuplicates(events.coalesce(1),
      Seq("id"), Seq("ts_ms", "offset"))
      .select("id", "payload").as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "new", 2 -> "b", 3 -> "only"))
  }
}
