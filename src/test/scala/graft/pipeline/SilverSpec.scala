package graft.pipeline

import graft.SparkSpec
import graft.cdc.{Checkpoints, Synth}
import org.apache.spark.sql.DataFrame

/** Pipeline invariants over a synthetic orders fixture:
  * §5.3 — N-batch incremental replay ≡ one-batch merge; rebuild differs
  * from merge exactly by the tombstoned keys; checkpoint read/advance. */
class SilverSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders: DataFrame = Seq(
    (1L, 10L, "O", 100.0, ts("2024-01-01 00:00:00")),
    (2L, 11L, "F", 200.5, ts("2024-01-02 00:00:00")),
    (3L, 12L, "O", 300.0, ts("2024-01-03 00:00:00")),  // k%3=0 → update
    (17L, 13L, "P", 17.0, ts("2024-01-04 00:00:00")),  // k%17=0 → delete
    (51L, 14L, "O", 51.0, ts("2024-01-05 00:00:00")),  // update + delete
    (55L, 15L, "O", 55.0, ts("2024-01-06 00:00:00")),  // k%5,%11: polluted+bare
    (30L, 16L, "F", 30.0, ts("2024-01-07 00:00:00"))   // update + polluted
  ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate")

  private lazy val bronze = Synth.bronze(orders)

  private def rows(df: DataFrame) =
    df.select("order_id", "user_id", "amount_eur", "status")
      .as[(Int, Int, Double, String)].collect().toSet

  test("incremental replay (3 batches) equals one-batch merge") {
    val one = Silver.mergeBatch(
      Silver.rebuild(bronze).limit(0), bronze)
    val three = Silver.incremental(bronze, 3)
    assert(rows(one) == rows(three))
  }

  test("rebuild keeps last non-delete state; merge tombstones deletes") {
    val rebuilt = rows(Silver.rebuild(bronze))
    val merged = rows(Silver.incremental(bronze, 2))
    val rebuiltIds = rebuilt.map(_._1)
    val mergedIds = merged.map(_._1)
    // deleted keys (17, 51) present in rebuild, absent after merge
    assert(rebuiltIds.contains(17) && rebuiltIds.contains(51))
    assert(!mergedIds.contains(17) && !mergedIds.contains(51))
    // non-deleted keys identical between the two materializations
    assert(rebuilt.filter(r => !Set(17, 51)(r._1))
      == merged.filter(r => !Set(17, 51)(r._1)))
  }

  test("update events win: k=3 ends 'updated' with 1-prefixed amount") {
    val r = rows(Silver.rebuild(bronze)).find(_._1 == 3).get
    assert(r._4 == "updated" && r._3 == 1300.0)
  }

  test("checkpoint read is 0 when absent, advances to max offset") {
    val empty = Checkpoints.empty(spark)
    assert(Checkpoints.lastOffset(empty, "p") == 0L)
    val cp1 = Checkpoints.advance(empty, "p", 41L,
      ts("2026-01-01 00:00:00"))
    val cp2 = Checkpoints.advance(cp1, "p", 42L,
      ts("2026-01-02 00:00:00"))
    assert(Checkpoints.lastOffset(cp2, "p") == 42L)
    assert(cp2.count() == 1) // upsert, not append
  }
}
