package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** ST2: flatMapGroupsWithState changelog compaction — MERGE row-level
  * action semantics across micro-batches. */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Int, op: String, ts: Long, off: Long,
                 status: String = "O") =
    ChangeEvent(id, Some(10 + id), Some(id * 100.0), Some(status), op,
      ts, off)

  test("two micro-batches: I on first sight, U on rematch, D only for " +
    "existing keys, within-batch LWW, delete-then-insert revives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val actions = Changelog.fromChanges(input.toDF())
    val q = actions.writeStream
      .format("memory").queryName("chg").outputMode("update").start()
    try {
      // batch 1: two inserts; key 1 has two events — LWW keeps ts=200
      input.addData(ev(1, "c", 100L, 1L), ev(1, "u", 200L, 2L, "updated"),
        ev(2, "c", 100L, 3L))
      q.processAllAvailable()
      // batch 2: update 1, delete 2, delete absent 9 (no-op), insert 4
      input.addData(ev(1, "u", 50L, 4L, "late"), ev(2, "d", 300L, 5L),
        ev(9, "d", 300L, 6L), ev(4, "c", 300L, 7L))
      q.processAllAvailable()
      // batch 3: re-insert the deleted key 2 — revived as I
      input.addData(ev(2, "c", 400L, 8L))
      q.processAllAvailable()

      val out = spark.table("chg")
        .select("order_id", "action", "status", "ts_ms")
        .as[(Int, String, String, Long)].collect().toList

      // batch 1: I for both keys; key 1 carries the LWW winner image
      assert(out.contains((1, "I", "updated", 200L)))
      assert(out.contains((2, "I", "O", 100L)))
      // batch 2: cross-batch late event still overwrites (no ts guard)
      assert(out.contains((1, "U", "late", 50L)))
      assert(out.contains((2, "D", "O", 300L)))
      assert(!out.exists(_._1 == 9)) // delete of absent key: no action
      assert(out.contains((4, "I", "O", 300L)))
      // batch 3: deleted key revived as INSERT, not UPDATE
      assert(out.contains((2, "I", "O", 400L)))
      assert(out.count(_._1 == 2) == 3) // I, D, I — nothing else
    } finally q.stop()
  }

  test("batch mode compacts to insert-only actions (state starts empty)") {
    val changes = Seq(
      ev(1, "c", 100L, 1L), ev(1, "u", 200L, 2L, "updated"),
      ev(2, "c", 100L, 3L), ev(2, "d", 300L, 4L), // net delete: no row
      ev(9, "d", 100L, 5L)
    ).toDF()
    val out = Changelog.fromChanges(changes)
      .select("order_id", "action", "status")
      .as[(Int, String, String)].collect().toSet
    assert(out == Set((1, "I", "updated")))
  }

  test("fromBronze parses raw envelopes through the same path") {
    val orders = Seq(
      (1L, 10L, "O", 100.0, ts("2024-01-01 00:00:00")),
      (17L, 13L, "P", 17.0, ts("2024-01-04 00:00:00")) // k%17==0: deleted
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate")
    val out = Changelog.fromBronze(graft.cdc.Synth.bronze(orders))
      .select("order_id", "action").as[(Int, String)].collect().toSet
    assert(out == Set((1, "I"))) // 17's latest event is the delete
  }
}
