package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** Snapshot sink: atomic create-or-replace swap + append. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("createOrReplace replaces atomically; append accumulates") {
    val dir = Files.createTempDirectory("snap").toString + "/t"
    Snapshot.createOrReplace(Seq(1, 2, 3).toDF("x"), dir)
    assert(Snapshot.read(spark, dir).count() == 3)
    Snapshot.createOrReplace(Seq(9).toDF("x"), dir)
    assert(Snapshot.read(spark, dir).as[Int].collect().toSeq == Seq(9))
    Snapshot.append(Seq(10).toDF("x"), dir)
    assert(Snapshot.read(spark, dir).as[Int].collect().toSet == Set(9, 10))
  }

  test("partitioned snapshot: a filter on the partition column prunes " +
    "directories at planning time, not row-by-row") {
    val dir = Files.createTempDirectory("snapp").toString + "/events"
    val df = Seq(
      ("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
      ("2024-01-02", 3L, 30.0), ("2024-01-03", 4L, 40.0)
    ).toDF("day", "event_id", "value")
    Snapshot.createOrReplacePartitioned(df, dir, Seq("day"))

    val q = Snapshot.read(spark, dir).filter($"day" === "2024-01-02")
    assert(q.select("event_id").as[Long].collect().toSeq == Seq(3L))
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"no partition filter on the scan:\n$plan")
    // replace replaces partitions wholesale too
    Snapshot.createOrReplacePartitioned(
      Seq(("2024-01-05", 9L, 0.0)).toDF("day", "event_id", "value"),
      dir, Seq("day"))
    assert(Snapshot.read(spark, dir).count() == 1)
  }
}
