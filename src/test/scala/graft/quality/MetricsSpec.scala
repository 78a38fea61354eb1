package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("columnStats: nulls, exact-under-k NDV, numeric min/max, " +
    "string columns report null min/max") {
    val df = Seq(
      (1L, Some("en"), Some(10L)),
      (2L, Some("en"), Some(20L)),
      (3L, None, Some(30L)),
      (4L, Some("de"), None)
    ).toDF("id", "lang", "n")
    val stats = Metrics.columnStats(df, Seq("id", "lang", "n"), k = 16)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(stats("id").getLong(1) == 0L)       // no null ids
    assert(stats("lang").getLong(1) == 1L)     // one null lang
    assert(stats("n").getLong(1) == 1L)        // one null n
    // under k the KMV estimate is the exact distinct count
    assert(stats("id").getDouble(2) == 4.0)
    assert(stats("lang").getDouble(2) == 2.0)
    assert(stats("n").getDouble(2) == 3.0)
    // numeric min/max; strings deliberately report null
    assert(stats("id").getDouble(3) == 1.0 && stats("id").getDouble(4) == 4.0)
    assert(stats("n").getDouble(3) == 10.0 && stats("n").getDouble(4) == 30.0)
    assert(stats("lang").isNullAt(3) && stats("lang").isNullAt(4))
    // avg_len over non-null string forms: lang → (2+2+2)/3 = 2
    assert(stats("lang").getDouble(5) == 2.0)
  }

  test("valueOutliers flags the planted spike, skips constant groups, " +
    "and computes the population z-score") {
    // group a: 100 values at 10.0 plus one spike at 1000.0
    // group b: constant — zero variance, must emit nothing
    val rows = (1 to 100).map(i => (i.toLong, "a", 10.0)) ++
      Seq((101L, "a", 1000.0)) ++
      (200 to 220).map(i => (i.toLong, "b", 5.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val out = Metrics.valueOutliers(df, Seq("event_type"), "value", 3.0)
      .select("event_id", "z").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(101L))
    // hand-computed population z of the spike
    val vals = rows.filter(_._2 == "a").map(_._3)
    val mean = vals.sum / vals.length
    val varp = vals.map(v => (v - mean) * (v - mean)).sum / vals.length
    val wantZ = (1000.0 - mean) / math.sqrt(varp)
    assert(math.abs(out.head._2 - wantZ) < 1e-6,
      s"z=${out.head._2} want≈$wantZ")
  }

  test("columnStats NDV estimate stays within ~3x sigma above k") {
    val df = spark.range(0, 5000)
      .select(col("id"), (col("id") % 50).as("mod"))
    val stats = Metrics.columnStats(df, Seq("id", "mod"), k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // k=64 → relative error ~1/sqrt(63) ≈ 12.6%; allow 3 sigma
    assert(math.abs(stats("id") - 5000.0) / 5000.0 < 0.38)
    assert(stats("mod") == 50.0) // under k → exact
  }
}
