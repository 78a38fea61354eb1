package graft.ext

import graft.SparkSpec
import graft.pipeline.Snapshot
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for the commit-maintained id-membership guard: exact
  * equivalence with the full anti-join it replaced, O(batch) plan
  * shape on the fresh-id steady state, O(delta) catch-up from the
  * commit window, superset-safety under deletes, and the rebuild
  * fallbacks (torn sidecar, unrecoverable window). */
class IdMembershipSpec extends SparkSpec {
  import spark.implicits._

  private def ids(xs: Seq[Long]): DataFrame =
    xs.map(i => (i, s"p$i")).toDF("vec_id", "payload")

  /** The exact semantics the guard must reproduce. */
  private def naive(table: String, batch: DataFrame): Set[Long] =
    batch.join(Snapshot.read(spark, table).select("vec_id"),
      Seq("vec_id"), "left_anti")
      .select("vec_id").collect().map(_.getLong(0)).toSet

  private def guarded(table: String, batch: DataFrame): Set[Long] =
    IdMembership.freshOnly(spark, table, batch, "vec_id")
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("freshOnly is exactly the anti-join it replaced: overlap, " +
    "fresh, and mixed batches agree with the naive guard, across " +
    "commits the sidecar catches up from the window") {
    val root = Files.createTempDirectory("idmem").toString
    val t = s"$root/corpus"
    Snapshot.createOrReplace(ids(1L to 500L), t, keepVersions = 2)
    // all-fresh, all-dup, and mixed (plus ids deleted upstream of the
    // corpus never seen: batch-internal shape is caller-owned)
    for (batch <- Seq(ids(501L to 560L), ids(100L to 140L),
        ids(480L to 520L))) {
      assert(guarded(t, batch) == naive(t, batch),
        "the guard must equal the exact anti-join")
    }
    // the corpus moves by a fast-append; the NEXT probe must see the
    // new ids via the O(delta) catch-up, not a stale bloom
    Snapshot.morCommit(spark, t, deletes = None,
      appends = Some(ids(601L to 650L)), operation = "append")
    val after = ids(Seq(610L, 611L, 700L, 701L))
    assert(guarded(t, after) == Set(700L, 701L),
      "window catch-up must fold the appended ids before probing")
    assert(guarded(t, after) == naive(t, after))
  }

  test("the fresh-id steady state never reads the corpus: with no " +
    "bloom suspects the returned plan IS the batch (no corpus leaf), " +
    "and suspects trigger the exact confirm") {
    val root = Files.createTempDirectory("idmemplan").toString
    val t = s"$root/corpus"
    Snapshot.createOrReplace(ids(1L to 300L), t, keepVersions = 2)
    def readsCorpus(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().exists {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.toUri.getPath)
                .exists(p => p == t || p.startsWith(s"$t/"))
            case _ => false
          }
        case _ => false
      }
    // fresh ids, far from the corpus range: bloom clears the whole
    // batch and the guard returns the batch frame untouched
    val fresh = IdMembership.freshOnly(spark, t,
      ids(1000001L to 1000050L), "vec_id")
    assert(!readsCorpus(fresh),
      "a suspect-free batch must not scan the corpus id column")
    assert(fresh.count() == 50)
    // a true duplicate makes the batch pay the exact confirm (the
    // confirm materializes eagerly inside freshOnly — the returned
    // frame is batch ⟕ confirmed-dup ids, so the corpus read already
    // happened; the RESULT is the proof it ran)
    val mixed = IdMembership.freshOnly(spark, t,
      ids(Seq(100L, 2000000L)), "vec_id")
    assert(mixed.select("vec_id").collect().map(_.getLong(0)).toSet
      == Set(2000000L),
      "the suspect must be confirmed against the corpus exactly")
  }

  test("deletes keep the bloom a SUPERSET (safe direction): a " +
    "deleted-then-restreamed id probes positive and the exact " +
    "confirm re-admits it") {
    val root = Files.createTempDirectory("idmemdel").toString
    val t = s"$root/corpus"
    Snapshot.createOrReplace(ids(1L to 200L), t, keepVersions = 2)
    // prime the sidecar at the full id set
    assert(guarded(t, ids(Seq(1L))) == Set.empty[Long])
    Snapshot.morCommit(spark, t,
      deletes = Some(Seq(42L).toDF("vec_id")), appends = None,
      operation = "delete")
    val b = ids(Seq(42L, 43L, 300L))
    assert(guarded(t, b) == Set(42L, 300L),
      "a deleted id must be re-admitted; a live one must not")
    assert(guarded(t, b) == naive(t, b))
  }

  test("the sketch re-sizes geometrically: a fold that outgrows the " +
    "stored capacity rebuilds at the next power-of-two — the guard " +
    "stays exact through the re-size") {
    val root = Files.createTempDirectory("idmemgrow").toString
    val t = s"$root/corpus"
    Snapshot.createOrReplace(ids(1L to 100L), t, keepVersions = 2)
    // hand-craft a sidecar at a tiny capacity (1024 items), stamped
    // at the live version, covering the live ids
    val v = Snapshot.currentVersion(t).get
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1024, 8192)
    val hasher = (x: Long) =>
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        x, org.apache.spark.sql.types.LongType, 42L)
    (1L to 100L).foreach(i => bf.putLong(hasher(i)))
    val bout = new java.io.ByteArrayOutputStream()
    bf.writeTo(bout)
    val bytes = bout.toByteArray
    val buf = java.nio.ByteBuffer.allocate(24 + bytes.length)
    buf.putLong(v).putLong(1024L).putLong(100L).put(bytes)
    Files.write(Paths.get(t, "_id_bloom"), buf.array())
    IdMembership.invalidate(t)
    // sanity: the crafted sidecar answers (its hash protocol matches)
    assert(guarded(t, ids(Seq(50L, 5000L))) == Set(5000L))
    // a commit that pushes the folded count past capacity: 1000 new
    // ids → approxItems 1100 > 1024 → rebuild at the next pow2 floor
    Snapshot.morCommit(spark, t, deletes = None,
      appends = Some(ids(2001L to 3000L)), operation = "append")
    val b = ids(Seq(50L, 2500L, 9000L))
    assert(guarded(t, b) == Set(9000L),
      "the re-sized sketch must see both old and folded ids")
    assert(guarded(t, b) == naive(t, b))
    val st = IdMembership.ensureCurrent(spark, t, "vec_id")
    assert(st.capacity >= 2200 && st.approxItems == 1100,
      s"capacity must re-size past the item count: $st")
  }

  test("a past-the-clamp corpus gets its REQUESTED sketch geometry: " +
    "BloomFilterAggregate's runtime-filter confs (4M items / 8 MB) " +
    "must not silently cap the sidecar, and capacity reflects the " +
    "serialized bits") {
    val root = Files.createTempDirectory("idmembig").toString
    val t = s"$root/corpus"
    val n = 5000000L
    Snapshot.createOrReplace(
      spark.range(n).select(col("id").as("vec_id"),
        (col("id") % 97).as("payload")), t, keepVersions = 1)
    IdMembership.invalidate(t)
    val st = IdMembership.ensureCurrent(spark, t, "vec_id")
    // 2× the live count, NOT the 8,388,608-item ceiling the default
    // maxNumBits clamp would leave behind
    assert(st.capacity == 2 * n,
      s"capacity must match the request past the 4M clamp: $st")
    assert(st.bloom.length > 9 * 1024 * 1024,
      s"the serialized sketch must hold 2n×8 bits (~10 MB), " +
        s"got ${st.bloom.length} bytes")
    // the confs were restored after the build
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits") ==
      "67108864")
    // and the guard stays exact at this size
    val b = ids(Seq(1234567L, n + 5L))
    assert(guarded(t, b) == Set(n + 5L))
  }

  test("an AT-CAP sketch folds forever instead of rebuilding: past " +
    "MaxItems a rebuild would produce the same geometry, so the " +
    "catch-up keeps folding (saturation rides the exact confirm) " +
    "and the guard stays exact") {
    val root = Files.createTempDirectory("idmemcap").toString
    val t = s"$root/corpus"
    Snapshot.createOrReplace(ids(1L to 100L), t, keepVersions = 2)
    val v = Snapshot.currentVersion(t).get
    // hand-craft an AT-CAP sidecar whose approx count already
    // exceeds the cap (a saturated long-lived guard), covering the
    // live ids
    val cap = IdMembership.MaxItems
    val bf = org.apache.spark.util.sketch.BloomFilter
      .create(cap, cap * 8)
    val hasher = (x: Long) =>
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        x, org.apache.spark.sql.types.LongType, 42L)
    (1L to 100L).foreach(i => bf.putLong(hasher(i)))
    val bout = new java.io.ByteArrayOutputStream()
    bf.writeTo(bout)
    val bytes = bout.toByteArray
    val buf = java.nio.ByteBuffer.allocate(24 + bytes.length)
    buf.putLong(v).putLong(cap).putLong(cap + 5L).put(bytes)
    Files.write(Paths.get(t, "_id_bloom"), buf.array())
    IdMembership.invalidate(t)
    Snapshot.morCommit(spark, t, deletes = None,
      appends = Some(ids(2001L to 2050L)), operation = "append")
    val b = ids(Seq(50L, 2025L, 9000L))
    assert(guarded(t, b) == Set(9000L),
      "the at-cap fold must see old and new ids and stay exact")
    val st = IdMembership.ensureCurrent(spark, t, "vec_id")
    assert(st.capacity == cap && st.approxItems == cap + 55L,
      s"an at-cap sketch must FOLD (approx grows), never rebuild " +
        s"(which would reset approx to the 150-id live count): $st")
  }

  test("fallbacks stay exact: a torn sidecar rebuilds from the id " +
    "column, and a compaction past the stamp (unrecoverable window) " +
    "falls back to the full rebuild") {
    val root = Files.createTempDirectory("idmemfall").toString
    val t = s"$root/corpus"
    Snapshot.createOrReplace(ids(1L to 200L), t, keepVersions = 2)
    assert(guarded(t, ids(Seq(5L))) == Set.empty[Long])
    // torn write: truncate the sidecar to its stamp prefix
    Files.write(Paths.get(t, "_id_bloom"), Array[Byte](0, 0, 0, 0))
    IdMembership.invalidate(t)
    val b1 = ids(Seq(10L, 900L))
    assert(guarded(t, b1) == Set(900L),
      "a torn sidecar must rebuild, not misjudge")
    // corpus rewritten wholesale (stamped version unrecoverable):
    // the guard must rebuild from the live id column and stay exact
    Snapshot.createOrReplace(ids(50L to 250L), t, keepVersions = 1)
    val b2 = ids(Seq(60L, 260L, 900L))
    assert(guarded(t, b2) == naive(t, b2),
      "an unrecoverable window must fall back to the full rebuild")
    assert(guarded(t, b2) == Set(260L, 900L))
  }
}
