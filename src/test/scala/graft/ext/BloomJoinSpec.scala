package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = (1L to 2000L).map(k => (k, s"p$k")).toDF("k", "v")
  // selective build side: 3% of the probe's key space
  private def build = (1L to 2000L).filter(_ % 33 == 0)
    .map(k => (k, "b")).toDF("bk", "w")

  test("semiJoin is exactly the plain left-semi join (bloom false " +
    "positives removed)") {
    val got = BloomJoin.semiJoin(probe, "k", build, "bk",
      expectedItems = 64).orderBy("k").collect()
    val want = probe.join(build, $"k" === $"bk", "left_semi")
      .orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.length == 2000 / 33)
  }

  test("bloom prefilter never drops a true match and the sketch stays " +
    "in-plan as a scalar subquery (no collect)") {
    val flagged = probe.withColumn("hit",
      BloomJoin.mightMatch(build, "bk", $"k", expectedItems = 64))
    // no false negatives: every real key flagged
    assert(flagged.filter($"k" % 33 === 0 && !$"hit").count() == 0)
    // pruning is real: a 64-item sketch over 60 keys keeps the pass-set
    // close to the true 3%, nowhere near the full 2000
    val passed = flagged.filter($"hit").count()
    assert(passed < 400, s"bloom pruned nothing: $passed of 2000 passed")
    // the sketch is built by a subquery inside the plan, not driver-side
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("Subquery"),
      s"bloom filter not planned as a subquery:\n$plan")
  }

  test("empty build side: semiJoin returns no rows") {
    assert(BloomJoin.semiJoin(probe, "k", build.filter($"bk" < 0), "bk")
      .count() == 0)
  }
}
