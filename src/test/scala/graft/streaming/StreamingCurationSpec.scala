package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming CURATION on ingest — the on-arrival twin of the batch
  * curation pipeline, as two chained streaming stages (the layered
  * bronze→silver→gold shape a production stream uses, each stage with
  * its own checkpoint):
  *   stage 1: quality gate (stateless filter) → watermarked exact
  *            dedup (ST3) → parquet;
  *   stage 2: per-source quota admission (ST4) over stage 1's output.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("gate → dedup → quota across micro-batches: short docs gated, " +
    "duplicate content collapsed, hot source capped — admitted set " +
    "matches the batch curation of the same events") {
    val root = Files.createTempDirectory("scur").toString
    val inDir = s"$root/in"
    val midDir = s"$root/mid"
    val outDir = s"$root/out"
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts", TimestampType),
      StructField("text", StringType),
      StructField("source", StringType)))

    // two micro-batches; "hot" over-delivers, doc 3 duplicates doc 1,
    // doc 4 is too short for the gate
    Seq((1L, ts("2024-01-01 00:00:00"), "alpha beta gamma delta", "hot"),
        (2L, ts("2024-01-01 00:00:01"), "epsilon zeta eta theta", "hot"),
        (3L, ts("2024-01-01 00:00:02"), "alpha beta gamma delta", "hot"),
        (4L, ts("2024-01-01 00:00:03"), "too short", "hot"),
        (10L, ts("2024-01-01 00:00:04"), "iota kappa lambda mu", "cold"))
      .toDF("doc_id", "ts", "text", "source")
      .coalesce(1).write.parquet(inDir)
    Seq((5L, ts("2024-01-01 00:01:00"), "nu xi omicron pi rho", "hot"),
        (6L, ts("2024-01-01 00:01:01"), "sigma tau upsilon phi chi", "hot"),
        (11L, ts("2024-01-01 00:01:02"), "psi omega aleph bet gimel", "cold"))
      .toDF("doc_id", "ts", "text", "source")
      .coalesce(1).write.mode("append").parquet(inDir)

    // stage 1: gate + watermarked dedup → parquet (its own checkpoint)
    val s1 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .filter(size(split(col("text"), " ")) >= 4)
    val q1 = StreamingDedup.dedupStream(s1, "ts", "text")
      .drop("content_hash")
      .writeStream.format("parquet")
      .option("path", midDir)
      .option("checkpointLocation", s"$root/cp1")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(60000)

    // stage 2: per-source quota (cap 2) over stage 1's output
    val sink: (org.apache.spark.sql.Dataset[QuotaAdmit], Long) => Unit =
      (b, _) => b.write.mode("append").parquet(outDir)
    val s2 = spark.readStream
      .schema(spark.read.parquet(midDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(midDir)
    val q2 = StreamingQuota.admitStream(s2, "source", n = 2)
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$root/cp2")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)

    val admitted = spark.read.parquet(outDir)
      .as[QuotaAdmit].collect()
    val bySource = admitted.groupBy(_.source).view
      .mapValues(_.map(_.doc_id).sorted.toSeq).toMap
    // hot: gate drops 4, dedup drops 3, quota keeps the first 2 of
    // {1, 2, 5, 6} in arrival order across batches
    assert(bySource("hot") == Seq(1L, 2L), s"got $bySource")
    assert(bySource("cold") == Seq(10L, 11L))
    // every admitted doc passed the gate and is content-unique
    assert(admitted.length == 4)
  }
}
