package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** SCD Type 2 semantics: interval chaining, delete tombstones, re-insert
  * after delete, and the replay-equivalence contract (N in-order batches
  * through `merge` ≡ one-shot `build`). */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val K = Seq("id")
  private val V = Seq("id", "v")

  /** (id, v, op, ts, off) change stream. */
  private def ch(rows: (Int, String, String, Long, Long)*): DataFrame =
    rows.toDF("id", "v", "op", "ts", "off")

  private def build(c: DataFrame) = Scd2.build(c, K, "ts", Seq("off"), V)

  private def rows(d: DataFrame): Set[(Int, String, Long, Option[Long], Boolean)] =
    d.select("id", "v", "valid_from_ms", "valid_to_ms", "is_current")
      .as[(Int, String, Long, Option[Long], Boolean)].collect().toSet

  test("update chains intervals; last version open") {
    val dim = build(ch((1, "a", "c", 10, 1), (1, "b", "u", 20, 2),
      (1, "c", "u", 30, 3)))
    assert(rows(dim) == Set(
      (1, "a", 10L, Some(20L), false),
      (1, "b", 20L, Some(30L), false),
      (1, "c", 30L, None, true)))
  }

  test("delete closes the open version and emits no row") {
    val dim = build(ch((1, "a", "c", 10, 1), (1, "a", "d", 20, 2)))
    assert(rows(dim) == Set((1, "a", 10L, Some(20L), false)))
  }

  test("re-insert after delete opens a fresh version") {
    val dim = build(ch((1, "a", "c", 10, 1), (1, "a", "d", 20, 2),
      (1, "b", "c", 30, 3)))
    assert(rows(dim) == Set(
      (1, "a", 10L, Some(20L), false),
      (1, "b", 30L, None, true)))
  }

  test("same-ts events ordered by the offset tie-break") {
    val dim = build(ch((1, "a", "c", 10, 1), (1, "b", "u", 10, 2)))
    assert(rows(dim) == Set(
      (1, "a", 10L, Some(10L), false),
      (1, "b", 10L, None, true)))
  }

  test("merge replay over any in-order batch split equals the build") {
    val events = ch(
      (1, "a", "c", 10, 1), (1, "b", "u", 20, 3), (1, "b", "d", 40, 6),
      (2, "x", "c", 15, 2), (2, "y", "u", 35, 5),
      (3, "m", "c", 30, 4), (3, "m", "d", 50, 7), (3, "n", "c", 60, 8))
    val oneShot = rows(build(events))
    for (splits <- Seq(Seq(3L), Seq(2L, 5L), Seq(1L, 4L, 6L))) {
      val bounds = (Long.MinValue +: splits :+ Long.MaxValue).sliding(2).toSeq
      val folded = bounds.foldLeft(build(events.limit(0))) {
        case (dim, Seq(lo, hi)) =>
          Scd2.merge(dim,
            events.filter($"off" > lo && $"off" <= hi), K, "ts",
            Seq("off"), V)
      }
      assert(rows(folded) == oneShot, s"splits=$splits")
    }
  }

  test("mergeMor reads back equal to merge; base dimension files " +
    "untouched; delete tombstones close without reopening") {
    val events = ch(
      (1, "a", "c", 10, 1), (2, "x", "c", 15, 2), (3, "m", "c", 30, 3))
    val batch = ch(
      (1, "b", "u", 40, 4),          // close + new version
      (3, "m", "d", 50, 5),          // close, no new version
      (4, "q", "c", 60, 6))          // fresh key
    val dir = java.nio.file.Files.createTempDirectory("scd2mor")
      .toString + "/dim"
    graft.pipeline.Snapshot.createOrReplace(build(events), dir,
      keepVersions = 2)
    val baseParquet = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir)).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".parquet")).sorted
    Scd2.mergeMor(spark, dir, batch, K, "ts", Seq("off"), V)
    val afterParquet = java.nio.file.Files
      .list(java.nio.file.Paths.get(dir)).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".parquet")).sorted
    assert(afterParquet == baseParquet,
      "mergeMor must commit sidecars, not rewrite the base")
    val viaMor = rows(graft.pipeline.Snapshot.read(spark, dir))
    val viaCow = rows(Scd2.merge(build(events), batch, K, "ts",
      Seq("off"), V))
    assert(viaMor == viaCow)
    assert(viaMor.contains((3, "m", 30L, Some(50L), false)) &&
      !viaMor.exists(r => r._1 == 3 && r._5))
  }

  test("temporalJoin picks the version valid at each probe's own ts; " +
    "pre-insert and post-delete probes keep NULL dimension columns") {
    val dim = build(ch((1, "a", "c", 10, 1), (1, "b", "u", 20, 2),
      (1, "b", "d", 30, 3), (2, "x", "c", 5, 4)))
    val probes = Seq((1, 5L), (1, 10L), (1, 15L), (1, 25L), (1, 30L),
      (2, 100L), (3, 50L)).toDF("id", "t")
    val out = Scd2.temporalJoin(probes, dim, K, "t")
      .select("id", "t", "_dim_v")
      .as[(Int, Long, Option[String])].collect().toSet
    assert(out == Set(
      (1, 5L, None),          // before the insert
      (1, 10L, Some("a")),    // exactly at valid_from → included
      (1, 15L, Some("a")),
      (1, 25L, Some("b")),    // after the update
      (1, 30L, None),         // at the delete → closed interval
      (2, 100L, Some("x")),   // open version serves any later ts
      (3, 50L, None)))        // unknown key keeps the fact row
  }

  test("merge on an unseen key inserts; untouched keys keep is_current") {
    val dim = build(ch((1, "a", "c", 10, 1)))
    val merged = Scd2.merge(dim, ch((2, "x", "c", 20, 2)), K, "ts",
      Seq("off"), V)
    assert(rows(merged) == Set(
      (1, "a", 10L, None, true),
      (2, "x", 20L, None, true)))
  }
}
