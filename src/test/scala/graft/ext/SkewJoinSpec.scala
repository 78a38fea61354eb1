package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private def probe = (1 to 1000).map { i =>
    (if (i <= 900) 1L else i.toLong, s"row$i")
  }.toDF("k", "payload")
  private def build = (1L to 1000L).map(k => (k, s"dim$k"))
    .toDF("k", "dim")

  test("salted join result equals the plain equi-join") {
    val got = SkewJoin.salted(probe, build, "k", salts = 8)
      .select($"k", $"payload", $"dim")
      .as[(Long, String, String)].collect().sorted.toSeq
    val want = probe.join(build, Seq("k"))
      .select($"k", $"payload", $"dim")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(got == want)
  }

  test("join condition carries the salt key (hot key spread over salts)") {
    val df = SkewJoin.salted(probe, build, "k", salts = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("_salt"), plan)
  }

  test("salting measurably flattens reducer load: max partition share " +
    "drops from ~all-in-one to under 40%") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a shuffled join over 8 reducers, no AQE coalescing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
        val counts = df
          .groupBy(spark_partition_id().as("pid")).count()
          .as[(Int, Long)].collect().map(_._2)
        counts.max.toDouble / counts.sum
      }
      val plain = maxShare(probe.join(build, Seq("k")))
      val salted = maxShare(SkewJoin.salted(probe, build, "k", salts = 8))
      assert(plain > 0.85, s"fixture lost its skew: $plain")
      assert(salted < 0.40, s"salting left a hot reducer: $salted")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("the probe-side salt is deterministic across runs") {
    val a = SkewJoin.salted(probe, build, "k", salts = 8)
      .orderBy("k", "payload").collect().toSeq
    val b = SkewJoin.salted(probe, build, "k", salts = 8)
      .orderBy("k", "payload").collect().toSeq
    assert(a == b)
  }
}
