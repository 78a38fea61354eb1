package graft.streaming

import graft.SparkSpec
import graft.ext.Sketches
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** ST8: running quantile estimates from bounded histogram state. */
class StreamingStatsSpec extends SparkSpec {
  import spark.implicits._

  test("estimates update across micro-batches and the final trigger " +
    "matches the batch histogram sketch on the same bounds") {
    val dir = Files.createTempDirectory("sstats").toString + "/in"
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))

    // two micro-batches over values 0..99 in one group: batch 1 holds
    // the evens, batch 2 the odds — bounds [0, 99] known up front
    val (evens, odds) = (0 until 100).map(_.toDouble).partition(_ % 2 == 0)
    evens.map(("a", _)).toDF("g", "v").coalesce(1).write.parquet(dir)
    odds.map(("a", _)).toDF("g", "v").coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingStats.quantileStream(stream, "g", "v",
        lo = 0.0, hi = 99.0, bins = 10,
        qs = Seq(("p50", 0.5), ("p90", 0.9)))
      .writeStream.format("memory").queryName("sstats_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("sstats_out").as[QuantileEstimate].collect()
    // one estimate per (trigger, quantile): two triggers × two qs
    assert(out.length == 4, out.toSeq.toString)
    val byN = out.groupBy(_.n)
    assert(byN.keySet == Set(50L, 100L),
      "each trigger reports its cumulative n")

    // final trigger == batch sketch with min/max-matching bounds
    val batch = Sketches.histQuantiles(
      (0 until 100).map(v => ("a", v.toDouble)).toDF("g", "v"),
      Seq("g"), "v", bins = 10, qs = Seq(("p50", 0.5), ("p90", 0.9)))
      .select($"quantile", $"est_value").as[(String, Double)]
      .collect().toMap
    byN(100L).foreach { e =>
      assert(e.est_value == batch(e.quantile),
        s"streaming ${e.quantile}=${e.est_value} != batch " +
          s"${batch(e.quantile)}")
    }
  }

  test("state stays bins-bounded: out-of-range values clamp to edge " +
    "bins instead of growing state; nulls are ignored") {
    val dir = Files.createTempDirectory("sstatsc").toString + "/in"
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    Seq(("a", Some(-100.0)), ("a", Some(0.5)), ("a", Some(999.0)),
        ("a", Option.empty[Double]))
      .toDF("g", "v").coalesce(1).write.parquet(dir)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingStats.quantileStream(stream, "g", "v",
        lo = 0.0, hi = 1.0, bins = 4, qs = Seq(("p50", 0.5)))
      .writeStream.format("memory").queryName("sstatsc_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("sstatsc_out").as[QuantileEstimate].collect()
    assert(out.length == 1)
    // 3 non-null values: -100 → bin 0, 0.5 → bin 2, 999 → bin 3;
    // p50 target rank 2 lands in bin 2 → est = 0 + 2·0.25
    assert(out.head.n == 3L && out.head.est_value == 0.5)
  }
}
