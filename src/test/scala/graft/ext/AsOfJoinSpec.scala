package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val labels = Seq(
    (1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"),
    (2L, 100L, "m1"),
    (3L, 100L, "n1")
  ).toDF("user_id", "ts", "label")

  private val states = Seq(
    (1L, 80L, "a"), (1L, 100L, "b"), (1L, 150L, "c"),
    (2L, 500L, "z")
  ).toDF("user_id", "ts", "state")

  test("backward as-of picks the latest right row at-or-before each " +
    "left ts; no match yields null") {
    val out = AsOfJoin.backward(labels, states, "user_id", "ts", "ts",
      Seq("state", "ts"))
      .select($"user_id", $"ts", $"label", $"asof_state", $"asof_ts")
      .as[(Long, Long, String, Option[String], Option[Long])]
      .collect().toSet
    assert(out == Set(
      (1L, 50L, "l0", None, None),            // nothing at/before 50
      (1L, 100L, "l1", Some("b"), Some(100L)), // equal ts is inclusive
      (1L, 200L, "l2", Some("c"), Some(150L)), // latest of 80/100/150
      (2L, 100L, "m1", None, None),            // right exists only later
      (3L, 100L, "n1", None, None)             // key absent on the right
    ))
  }

  test("as-of output cardinality is exactly |left| (no range blowup)") {
    val out = AsOfJoin.backward(labels, states, "user_id", "ts", "ts",
      Seq("state"))
    assert(out.count() == labels.count())
  }

  test("forward as-of picks the earliest right row at-or-after each " +
    "left ts; no match yields null") {
    val out = AsOfJoin.forward(labels, states, "user_id", "ts", "ts",
      Seq("state", "ts"))
      .select($"user_id", $"ts", $"label", $"asof_state", $"asof_ts")
      .as[(Long, Long, String, Option[String], Option[Long])]
      .collect().toSet
    assert(out == Set(
      (1L, 50L, "l0", Some("a"), Some(80L)),   // earliest of 80/100/150
      (1L, 100L, "l1", Some("b"), Some(100L)), // equal ts is inclusive
      (1L, 200L, "l2", None, None),            // nothing at/after 200
      (2L, 100L, "m1", Some("z"), Some(500L)), // later right serves it
      (3L, 100L, "n1", None, None)             // key absent on the right
    ))
  }

  test("null payload field in the latest right row travels atomically " +
    "(no back-fill from an older right row)") {
    // key 1: latest state before ts=200 is (150, null value, "newer") —
    // the null must come through, NOT 100's "b" value; sibling column
    // must come from the SAME (150) row.
    val nullableStates = Seq(
      (1L, 80L, Option("a"), "old"),
      (1L, 100L, Option("b"), "mid"),
      (1L, 150L, Option.empty[String], "newer")
    ).toDF("user_id", "ts", "state", "note")
    val out = AsOfJoin.backward(
        labels.filter($"user_id" === 1L && $"ts" === 200L),
        nullableStates, "user_id", "ts", "ts", Seq("state", "note"))
      .select($"asof_state", $"asof_note")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(out == Seq((None, Some("newer"))))
    // forward mirror: earliest state at/after ts=50 is (80,"a","old");
    // make ITS value null and check the same atomicity.
    val fwdStates = Seq(
      (1L, 80L, Option.empty[String], "old"),
      (1L, 100L, Option("b"), "mid")
    ).toDF("user_id", "ts", "state", "note")
    val fwd = AsOfJoin.forward(
        labels.filter($"user_id" === 1L && $"ts" === 50L),
        fwdStates, "user_id", "ts", "ts", Seq("state", "note"))
      .select($"asof_state", $"asof_note")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(fwd == Seq((None, Some("old"))))
  }

  test("plan: one hash exchange (the key window), no join operator") {
    val df = AsOfJoin.backward(labels, states, "user_id", "ts", "ts",
      Seq("state"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
