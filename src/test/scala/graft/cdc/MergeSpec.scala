package graft.cdc

import graft.SparkSpec

/** MERGE emulation vs the reference matrix
  * (`/root/reference/jobs/merge_orders_silver.py:135-147`):
  * matched+delete → DELETE, matched → UPDATE, not-matched+non-delete →
  * INSERT, not-matched+delete → no-op; late-arrival overwrite quirk;
  * Iceberg-style cardinality violation. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1, "kept"), (2, "to_update"), (3, "to_delete")
  ).toDF("id", "val")

  test("delete/update/insert/no-op matrix") {
    val staging = Seq(
      (2, "updated", "u"),  // matched → update
      (3, "ignored", "d"),  // matched delete → remove
      (4, "inserted", "c"), // not matched → insert
      (5, "ghost", "d")     // not matched delete → no-op
    ).toDF("id", "val", "op")
    val out = Merge.mergeCdc(target, staging, Seq("id"))
      .as[(Int, String)].collect().toMap
    assert(out == Map(1 -> "kept", 2 -> "updated", 4 -> "inserted"))
  }

  test("late arrival overwrites (reference quirk: no ts guard)") {
    val staging = Seq((1, "older_event", "u")).toDF("id", "val", "op")
    val out = Merge.mergeCdc(target, staging, Seq("id"))
      .as[(Int, String)].collect().toMap
    assert(out(1) == "older_event")
  }

  test("cardinality guard raises on multi-row staging key") {
    val staging = Seq((2, "a", "u"), (2, "b", "u")).toDF("id", "val", "op")
    val e = intercept[Exception] {
      Merge.mergeCdc(target, staging, Seq("id"), checkCardinality = true)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("cardinality")))
  }

  test("cardinality guard passes unique staging") {
    val staging = Seq((2, "a", "u")).toDF("id", "val", "op")
    val out = Merge.mergeCdc(target, staging, Seq("id"),
      checkCardinality = true).as[(Int, String)].collect().toMap
    assert(out(2) == "a")
  }
}
