package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, 5L, "p5"), (1L, 100L, "p100"), (1L, 250L, "p250"),
    (2L, 100L, "q100")
  ).toDF("k", "t", "pname")
  private def intervals = Seq(
    (1L, 0L, 99L, "i0"), (1L, 100L, 150L, "i1"), (1L, 90L, 260L, "iwide"),
    (3L, 0L, 1000L, "other")
  ).toDF("k", "lo", "hi", "iname")

  test("interval join matches exactly the rows a brute-force range " +
    "predicate matches (inclusive bounds), across bucket widths") {
    val want = points.join(intervals, Seq("k"))
      .filter($"t" >= $"lo" && $"t" <= $"hi")
      .select($"pname", $"iname").as[(String, String)].collect().toSet
    assert(want == Set(("p5", "i0"), ("p100", "i1"), ("p100", "iwide"),
      ("p250", "iwide")))
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalJoin(points, intervals, "k", "t",
        "lo", "hi", w)
        .select($"pname", $"iname").as[(String, String)].collect()
      assert(got.toSet == want, s"bucketWidth=$w")
      assert(got.length == want.size, s"dup pairs at bucketWidth=$w")
    }
  }

  test("plan: hash join on (key, bucket), no nested loop or cartesian") {
    val df = RangeJoin.intervalJoin(points, intervals, "k", "t",
      "lo", "hi", 64L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("_b"), plan)
  }
}
