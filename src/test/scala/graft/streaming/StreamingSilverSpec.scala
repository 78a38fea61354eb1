package graft.streaming

import graft.SparkSpec
import graft.cdc.Synth
import graft.pipeline.{Silver, Snapshot}
import java.nio.file.Files

/** ST1 end-to-end: file-source stream of bronze events → foreachBatch
  * merge → final silver snapshot equals the batch merge result. */
class StreamingSilverSpec extends SparkSpec {
  import spark.implicits._

  test("streamed merge converges to the batch merge result") {
    val root = Files.createTempDirectory("stream").toString
    val bronzeDir = s"$root/bronze"
    val silverDir = s"$root/silver"
    val cpDir = s"$root/cp"

    val orders = Seq(
      (1L, 10L, "O", 100.0, ts("2024-01-01 00:00:00")),
      (3L, 12L, "O", 300.0, ts("2024-01-03 00:00:00")),
      (17L, 13L, "P", 17.0, ts("2024-01-04 00:00:00")),
      (6L, 14L, "F", 60.0, ts("2024-01-05 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate")
    val bronze = Synth.bronze(orders)
    bronze.write.parquet(bronzeDir)

    val q = StreamingSilver.start(spark, bronzeDir, silverDir, cpDir)
    q.awaitTermination(60000)

    val streamed = Snapshot.read(spark, silverDir)
      .select("order_id", "status").as[(Int, String)].collect().toSet
    val batch = Silver.mergeBatch(StreamingSilver.emptySilver(spark), bronze)
      .select("order_id", "status").as[(Int, String)].collect().toSet
    assert(streamed == batch)
    assert(!streamed.map(_._1).contains(17)) // tombstoned
  }

  test("restart with the same checkpointLocation resumes without " +
    "reprocessing drained files (exactly-once-ish, README.md:225)") {
    val root = Files.createTempDirectory("stream-restart").toString
    val bronzeDir = s"$root/bronze"
    val silverDir = s"$root/silver"
    val cpDir = s"$root/cp"

    def ordersDf(rows: Seq[(Long, Long, String, Double, String)]) =
      rows.map { case (k, u, st, p, d) => (k, u, st, p, ts(d)) }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
    val bronze1 = Synth.bronze(ordersDf(Seq(
      (1L, 10L, "O", 100.0, "2024-01-01 00:00:00"),
      (3L, 12L, "O", 300.0, "2024-01-03 00:00:00"))))
    bronze1.write.parquet(bronzeDir)

    val q1 = StreamingSilver.start(spark, bronzeDir, silverDir, cpDir)
    q1.awaitTermination(60000)

    // stop/append/RESTART with the same checkpoint: only the new files
    // may be consumed
    val bronze2 = Synth.bronze(ordersDf(Seq(
      (2L, 11L, "P", 200.0, "2024-01-06 00:00:00"),
      (5L, 13L, "F", 500.0, "2024-01-07 00:00:00"))))
    bronze2.write.mode("append").parquet(bronzeDir)

    val q2 = StreamingSilver.start(spark, bronzeDir, silverDir, cpDir)
    q2.awaitTermination(60000)
    val replayRows = q2.recentProgress.map(_.numInputRows).sum
    assert(replayRows == bronze2.count(),
      s"restart consumed $replayRows rows, expected only batch-2's")

    // final snapshot == the full two-step batch merge (no duplication,
    // no loss)
    val streamed = Snapshot.read(spark, silverDir)
      .select("order_id", "status").as[(Int, String)].collect().toSet
    val batch = Silver.mergeBatch(
      Silver.mergeBatch(StreamingSilver.emptySilver(spark), bronze1),
      bronze2)
      .select("order_id", "status").as[(Int, String)].collect().toSet
    assert(streamed == batch)

    // idle restart: nothing new → zero rows processed, snapshot intact
    val q3 = StreamingSilver.start(spark, bronzeDir, silverDir, cpDir)
    q3.awaitTermination(60000)
    assert(q3.recentProgress.map(_.numInputRows).sum == 0)
    assert(Snapshot.read(spark, silverDir)
      .select("order_id", "status").as[(Int, String)].collect().toSet
      == batch)
  }

  test("merge-on-read streaming: micro-batches commit sidecars, base " +
    "files stay untouched, result equals the copy-on-write stream, " +
    "compaction clears the merge tax") {
    val root = Files.createTempDirectory("stream-mor").toString
    val bronzeDir = s"$root/bronze"
    val silverDir = s"$root/silver"
    val cpDir = s"$root/cp"

    def ordersDf(rows: Seq[(Long, Long, String, Double, String)]) =
      rows.map { case (k, u, st, p, d) => (k, u, st, p, ts(d)) }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
    // wave 1 bootstraps the base snapshot (copy-on-write)
    val bronze1 = Synth.bronze(ordersDf(Seq(
      (1L, 10L, "O", 100.0, "2024-01-01 00:00:00"),
      (3L, 12L, "O", 300.0, "2024-01-03 00:00:00"))))
    bronze1.write.parquet(bronzeDir)
    val q1 = StreamingSilver.startMor(spark, bronzeDir, silverDir, cpDir)
    q1.awaitTermination(60000)
    val baseVersion = Snapshot.currentVersion(silverDir).get
    val morBefore = Snapshot.morVersions(silverDir).size
    val baseMtimes = java.nio.file.Files.list(
      java.nio.file.Paths.get(silverDir)).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    assert(baseMtimes.nonEmpty)

    // wave 2: update key 3 (k%3=0 → a 'u' event wins), insert key 5,
    // and key 17 (k%17=0 → its delete event tombstones it) — resumes
    // from the checkpoint, commits MOR sidecars only
    val bronze2 = Synth.bronze(ordersDf(Seq(
      (3L, 12L, "P", 350.0, "2024-01-06 00:00:00"),
      (5L, 13L, "F", 500.0, "2024-01-07 00:00:00"),
      (17L, 14L, "X", 170.0, "2024-01-08 00:00:00"))))
    bronze2.write.mode("append").parquet(bronzeDir)
    val q2 = StreamingSilver.startMor(spark, bronzeDir, silverDir, cpDir)
    q2.awaitTermination(60000)

    // base data files byte-identical; commits were sidecars
    val baseAfter = java.nio.file.Files.list(
      java.nio.file.Paths.get(silverDir)).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
    assert(baseAfter == baseMtimes,
      "a MOR micro-batch must not rewrite base data files")
    assert(Snapshot.morVersions(silverDir).size > morBefore)
    assert(Snapshot.currentVersion(silverDir).get > baseVersion)

    // result equals the two-step batch merge (the CoW streaming twin)
    val streamed = Snapshot.read(spark, silverDir)
      .select("order_id", "status", "amount_eur")
      .as[(Int, String, Double)].collect().toSet
    val batch = Silver.mergeBatch(
      Silver.mergeBatch(StreamingSilver.emptySilver(spark), bronze1),
      bronze2)
      .select("order_id", "status", "amount_eur")
      .as[(Int, String, Double)].collect().toSet
    assert(streamed == batch)
    assert(!streamed.exists(_._1 == 17), "key 17 must be tombstoned")
    assert(streamed.exists(r => r._1 == 3 && r._2 == "updated"),
      "key 3's wave-2 update event must win")

    // compaction clears the sidecars; content unchanged
    Snapshot.rewritePositionDeletes(spark, silverDir)
    assert(Snapshot.morVersions(silverDir).isEmpty)
    assert(Snapshot.read(spark, silverDir)
      .select("order_id", "status", "amount_eur")
      .as[(Int, String, Double)].collect().toSet == batch)

    // AUTO-compaction threshold (the write.mor.compact-after-commits
    // twin for streams): with compactAfterCommits=1, the next wave's
    // sidecar commit compacts straight back to copy-on-write —
    // long-running streams never stack unbounded sidecars
    val bronze3 = Synth.bronze(ordersDf(Seq(
      (7L, 15L, "O", 700.0, "2024-01-09 00:00:00"))))
    bronze3.write.mode("append").parquet(bronzeDir)
    val q3 = StreamingSilver.startMor(spark, bronzeDir, silverDir, cpDir,
      compactAfterCommits = Some(1))
    q3.awaitTermination(60000)
    assert(Snapshot.morVersions(silverDir).isEmpty,
      "the threshold batch must auto-compact the stream's sidecars")
    assert(Snapshot.read(spark, silverDir)
      .filter($"order_id" === 7).count() == 1L)
  }

  test("streamed SCD2 converges to the one-shot build, including a " +
    "cross-wave update closing the open version, and resumes from " +
    "its checkpoint") {
    val root = Files.createTempDirectory("stream-scd2").toString
    val bronzeDir = s"$root/bronze"
    val dimDir = s"$root/dim"
    val cpDir = s"$root/cp"

    def ordersDf(rows: Seq[(Long, Long, String, Double, String)]) =
      rows.map { case (k, u, st, p, d) => (k, u, st, p, ts(d)) }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
    // key 3 (k%3=0) gets c then u in wave 1 → two versions already;
    // key 17 (k%17=0) gets c/d → history but no current row
    val bronze1 = Synth.bronze(ordersDf(Seq(
      (1L, 10L, "O", 100.0, "2024-01-01 00:00:00"),
      (3L, 12L, "O", 300.0, "2024-01-03 00:00:00"),
      (17L, 13L, "P", 17.0, "2024-01-04 00:00:00"))))
    bronze1.write.parquet(bronzeDir)
    val q1 = StreamingSilver.startScd2(spark, bronzeDir, dimDir, cpDir)
    q1.awaitTermination(60000)

    // wave 2: key 3 again LATER — its wave-1 open version must close
    // at the wave-2 'c' event's ts
    val bronze2 = Synth.bronze(ordersDf(Seq(
      (3L, 12L, "P", 350.0, "2024-02-01 00:00:00"),
      (5L, 14L, "F", 500.0, "2024-02-02 00:00:00"))))
    bronze2.write.mode("append").parquet(bronzeDir)
    val q2 = StreamingSilver.startScd2(spark, bronzeDir, dimDir, cpDir)
    q2.awaitTermination(60000)
    assert(q2.recentProgress.map(_.numInputRows).sum == bronze2.count(),
      "restart must consume only wave-2 files")

    def rows(df: org.apache.spark.sql.DataFrame)
        : Set[(Int, String, Long, Option[Long], Boolean)] =
      df.select("order_id", "status", "valid_from_ms", "valid_to_ms",
        "is_current")
        .as[(Int, String, Long, Option[Long], Boolean)].collect().toSet
    val streamed = rows(Snapshot.read(spark, dimDir))
    // one-shot build over the full log
    val all = bronze1.unionByName(bronze2)
    val batch = rows(graft.cdc.Scd2.build(Silver.changes(all),
      Silver.Keys, "ts_ms", Seq("offset"),
      Seq("order_id", "user_id", "amount_eur", "status")))
    assert(streamed == batch)
    // the cross-wave chain: key 3 has 2 closed wave-1 versions, then
    // wave-2 c (closed by its own u) and the open u version
    val k3 = streamed.filter(_._1 == 3).toSeq.sortBy(_._3)
    assert(k3.size == 4 && k3.count(_._5) == 1)
    assert(k3.init.forall(_._4.isDefined) && k3.last._4.isEmpty)
    // key 17: history retained, no current version (deleted)
    val k17 = streamed.filter(_._1 == 17)
    assert(k17.nonEmpty && !k17.exists(_._5))
  }

  test("windowedCounts groups ops into tumbling windows") {
    val orders = Seq(
      (1L, 10L, "O", 100.0, ts("2024-01-01 00:00:00")),
      (3L, 12L, "O", 300.0, ts("2024-01-01 00:10:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate")
    // batch frame through the same code path (windowedCounts is
    // plan-compatible with both batch and streaming inputs)
    val out = StreamingSilver.windowedCounts(Synth.bronze(orders))
      .select("op", "n_events")
      .as[(String, Long)].collect().toMap
    assert(out("c") == 2L && out("u") == 1L)
  }
}
