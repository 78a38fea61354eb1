package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** ST3: streaming exact-dedup over micro-batches — duplicates inside
  * and across batches (within the watermark) collapse to the first
  * arrival. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch duplicate content is dropped within the watermark") {
    val dir = Files.createTempDirectory("sdedup").toString + "/in"
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ts", TimestampType),
      StructField("text", StringType)))

    // two files → two micro-batches (maxFilesPerTrigger=1)
    Seq((1L, ts("2024-01-01 00:00:00"), "aaa"),
        (2L, ts("2024-01-01 00:00:05"), "bbb"),
        (3L, ts("2024-01-01 00:00:06"), "aaa")) // in-batch dup
      .toDF("doc_id", "ts", "text").coalesce(1).write.parquet(dir)
    Seq((4L, ts("2024-01-01 00:01:00"), "aaa"), // cross-batch dup
        (5L, ts("2024-01-01 00:01:30"), "ccc"))
      .toDF("doc_id", "ts", "text").coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingDedup.dedupStream(stream, "ts", "text")
      .writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("sdedup_out")
      .select($"text").as[String].collect().toSeq.sorted
    assert(out == Seq("aaa", "bbb", "ccc"))
  }
}
