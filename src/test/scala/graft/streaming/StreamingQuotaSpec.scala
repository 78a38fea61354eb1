package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** ST4: per-source lifetime quota admission across micro-batches. */
class StreamingQuotaSpec extends SparkSpec {
  import spark.implicits._

  test("a hot source is cut off across micro-batches at exactly n; " +
    "cold sources admit everything; ranks are continuous") {
    val dir = Files.createTempDirectory("squota").toString + "/in"
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType)))

    // batch 1: hot admits 3 of 4 (cap 3), cold admits both
    Seq((1L, "hot"), (2L, "hot"), (3L, "hot"), (4L, "hot"),
        (10L, "cold"), (11L, "cold"))
      .toDF("doc_id", "source").coalesce(1).write.parquet(dir)
    // batch 2: hot is already saturated — nothing admitted
    Seq((5L, "hot"), (6L, "hot"), (12L, "cold"))
      .toDF("doc_id", "source").coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = StreamingQuota.admitStream(stream, "source", n = 3)
      .writeStream.format("memory").queryName("squota_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("squota_out")
      .as[QuotaAdmit].collect().sortBy(a => (a.source, a.admitted_rank))
    val hot = out.filter(_.source == "hot")
    val cold = out.filter(_.source == "cold")
    assert(hot.map(_.doc_id).toSeq == Seq(1L, 2L, 3L),
      s"hot must admit its 3 smallest first-batch ids: ${hot.toSeq}")
    assert(hot.map(_.admitted_rank).toSeq == Seq(1L, 2L, 3L))
    assert(cold.map(_.doc_id).toSeq == Seq(10L, 11L, 12L))
    assert(cold.map(_.admitted_rank).toSeq == Seq(1L, 2L, 3L),
      "ranks must continue across micro-batches")
  }

  test("restart/resume: the per-source counter survives a query " +
    "restart via the state checkpoint — a saturated source stays " +
    "saturated in the new query") {
    val base = Files.createTempDirectory("squotar").toString
    val dir = base + "/in"
    val ckpt = base + "/ckpt"
    val outDir = base + "/out"
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType)))

    // memory sink can't recover a checkpoint — durable admissions go
    // through foreachBatch → parquet, the silver-restart pattern
    val sink: (org.apache.spark.sql.Dataset[QuotaAdmit], Long) => Unit =
      (b, _) => b.write.mode("append").parquet(outDir)
    def runAvailable(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val q = StreamingQuota.admitStream(stream, "source", n = 2)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    // run 1: saturate "hot" (cap 2 of 3 offered)
    Seq((1L, "hot"), (2L, "hot"), (3L, "hot"))
      .toDF("doc_id", "source").coalesce(1).write.parquet(dir)
    runAvailable()
    // run 2 (NEW query, same checkpoint): more hot rows arrive — the
    // restored counter must reject them; a new source starts fresh
    Seq((4L, "hot"), (10L, "fresh"))
      .toDF("doc_id", "source").coalesce(1)
      .write.mode("append").parquet(dir)
    runAvailable()

    val out = spark.read.parquet(outDir)
      .as[QuotaAdmit].collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 10L),
      s"restored counter must keep hot saturated: ${out.toSeq}")
    assert(out.filter(_.source == "hot").map(_.admitted_rank).max == 2L)
  }

  test("batch mode: admitStream over a static frame equals a per-source " +
    "n-smallest selection") {
    val docs = Seq.tabulate(40)(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val out = StreamingQuota.admitStream(docs, "source", n = 5)
      .collect().groupBy(_.source).view.mapValues(_.map(_.doc_id).sorted.toSeq)
      .toMap
    for (s <- Seq("s0", "s1", "s2")) {
      val want = (0 until 40).map(_.toLong)
        .filter(i => s"s${i % 3}" == s).sorted.take(5)
      assert(out(s) == want, s"source $s")
    }
  }
}
