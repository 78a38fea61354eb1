package graft.quality

import graft.SparkSpec
import graft.pipeline.Snapshot
import graft.quality.Expectations._

/** Expectation audit semantics (null contract, uniqueness), the
  * quarantine/retain partition, and the gated write leaving the
  * previous snapshot live when the new frame violates its contract. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  // id 2 dups; id 4 has null amount; id 5 out of range; id 6 bad status
  private def df = Seq(
    (1, Some(10.0), "O"), (2, Some(20.0), "O"), (2, Some(30.0), "F"),
    (4, None: Option[Double], "O"), (5, Some(-1.0), "F"),
    (6, Some(40.0), "X")
  ).toDF("id", "amount", "status")

  private val exps = Seq(
    Complete("amount"), Unique(Seq("id")),
    InRange("amount", 0.0, 100.0), InSet("status", Seq("O", "F")))

  test("audit counts violations per check in one pass") {
    val out = audit(df, exps)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      ("complete(amount)", 1L, 6L, false),
      ("unique(id)", 1L, 6L, false),
      ("in_range(amount)", 1L, 6L, false),  // null amount NOT counted
      ("in_set(status)", 1L, 6L, false)))
  }

  test("a null-keyed row is Complete's business, not a duplicate") {
    val d = Seq(Some(1), None, Some(2)).toDF("id")
    val out = audit(d, Seq(Unique(Seq("id")), Complete("id")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out == Map("unique(id)" -> 0L, "complete(id)" -> 1L))
  }

  test("audit passes a clean frame") {
    val clean = Seq((1, 10.0, "O"), (2, 20.0, "F"))
      .toDF("id", "amount", "status")
    assert(audit(clean, exps).filter(!$"passed").isEmpty)
  }

  test("quarantine and retain partition the frame with stable reasons") {
    val rowExps = exps.filter(!_.isInstanceOf[Unique])
    val bad = quarantine(df, rowExps)
      .select("id", "reasons").as[(Int, String)].collect().toSet
    assert(bad == Set(
      (4, "complete(amount)"),
      (5, "in_range(amount)"),
      (6, "in_set(status)")))
    assert(retain(df, rowExps).count() == df.count() - bad.size)
    intercept[IllegalArgumentException] {
      quarantine(df, Seq(Unique(Seq("id"))))
    }
  }

  test("enforce raises naming every failed check") {
    val e = intercept[IllegalStateException] { enforce(df, exps) }
    assert(e.getMessage.contains("unique(id)=1"))
    assert(e.getMessage.contains("in_set(status)=1"))
    enforce(df.filter($"id" === 1), exps) // clean subset passes
  }

  test("expectations gate a STREAM: quarantine/retain are stateless " +
    "codegen'd projections, so the same split runs per micro-batch") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("expstream")
      .toString
    val inDir = s"$root/in"; val goodDir = s"$root/good"
    val badDir = s"$root/bad"; val cp = s"$root/cp"
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("amount", DoubleType),
      StructField("status", StringType)))
    val rowExps = exps.filter(!_.isInstanceOf[Unique])
    Seq((1, Some(10.0), "O"), (5, Some(-1.0), "F"))
      .toDF("id", "amount", "status").coalesce(1).write.parquet(inDir)
    Seq((6, Some(40.0), "X"), (7, Some(20.0), "F"))
      .toDF("id", "amount", "status").coalesce(1)
      .write.mode("append").parquet(inDir)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .writeStream.option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          retain(batch, rowExps).write.mode("append").parquet(goodDir)
          quarantine(batch, rowExps).write.mode("append").parquet(badDir)
          ()
      }.start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(goodDir).select("id").as[Int]
      .collect().toSet == Set(1, 7))
    assert(spark.read.parquet(badDir).select("id", "reasons")
      .as[(Int, String)].collect().toSet ==
      Set((5, "in_range(amount)"), (6, "in_set(status)")))
  }

  test("gatedReplace refuses the violating commit; previous stays live") {
    val dir = java.nio.file.Files.createTempDirectory("expgate")
      .toString + "/t"
    val good = Seq((1, 10.0, "O")).toDF("id", "amount", "status")
    gatedReplace(good, dir, exps)
    intercept[IllegalStateException] { gatedReplace(df, dir, exps) }
    assert(Snapshot.read(spark, dir).count() == 1) // v1 untouched
    gatedReplace(good.union(Seq((2, 20.0, "F")).toDF), dir, exps)
    assert(Snapshot.read(spark, dir).count() == 2)
  }
}
