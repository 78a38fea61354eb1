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
