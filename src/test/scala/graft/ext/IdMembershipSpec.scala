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
    assert(st.capacity >= 2200 && st.approxItems.sum == 1100,
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
    assert(st.shardBits == 0 &&
      st.shards.head.length > 9 * 1024 * 1024,
      s"the serialized sketch must hold 2n×8 bits (~10 MB), " +
        s"got ${st.shards.head.length} bytes")
    // the raise ran on a CLONED session — the user session's conf
    // was never touched
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits") ==
      "67108864")
    // and the guard stays exact at this size
    val b = ids(Seq(1234567L, n + 5L))
    assert(guarded(t, b) == Set(n + 5L))
  }

  /** The driver-side xxhash64 twin (seed 42, Spark's internal
    * representation) — the spec's shard-targeting helper. */
  private def hashOf(x: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      x, org.apache.spark.sql.types.LongType, 42L)

  private def shardOf(x: Long, bits: Int): Int =
    (hashOf(x) >>> (64 - bits)).toInt

  test("past the cap the sketch SPLITS into hash-range shards: the " +
    "bootstrap picks the shard count from the corpus, the guard " +
    "stays exactly the anti-join through window folds and a further " +
    "split, and the sharded sidecar round-trips a reload") {
    IdMembership.minItemsForTests = Some(256)
    IdMembership.maxItemsForTests = Some(2048)
    try {
      val root = Files.createTempDirectory("idmemshard").toString
      val t = s"$root/corpus"
      Snapshot.createOrReplace(ids(1L to 5000L), t, keepVersions = 2)
      IdMembership.invalidate(t)
      val st = IdMembership.ensureCurrent(spark, t, "vec_id")
      // 2n = 10000 > 2048 → 8 shards of ~625 expected items each
      assert(st.shardBits == 3,
        s"a past-the-cap corpus must bootstrap SHARDED: $st")
      assert(st.approxItems.sum == 5000L, s"per-shard counts: $st")
      // exactness across shard boundaries: fresh, dup, mixed
      for (batch <- Seq(ids(9001L to 9050L), ids(100L to 140L),
          ids(4980L to 5020L))) {
        assert(guarded(t, batch) == naive(t, batch),
          "the sharded guard must equal the exact anti-join")
      }
      // window fold: the catch-up must land in the right shards
      Snapshot.morCommit(spark, t, deletes = None,
        appends = Some(ids(20001L to 20100L)), operation = "append")
      val after = ids(Seq(20050L, 20051L, 30000L))
      assert(guarded(t, after) == Set(30000L),
        "the sharded window catch-up must fold before probing")
      // the sidecar round-trips: drop the in-process caches, reload
      // the v2 file, keep answering exactly. NOTE the lazy-persist
      // contract: the FILE may lag the fold (stamp ≤ bytes), and the
      // reload must re-fold the gap from the commit window.
      IdMembership.invalidate(t)
      assert(guarded(t, after) == Set(30000L),
        "a reloaded sharded sidecar must re-fold its lag and answer")
      val st2 = IdMembership.ensureCurrent(spark, t, "vec_id")
      assert(st2.shardBits == 3 && st2.version ==
        Snapshot.currentVersion(t).get, s"reload state: $st2")
      // grow the corpus past the per-shard capacity → the catch-up
      // SPLITS again (more shards), never saturates
      Snapshot.morCommit(spark, t, deletes = None,
        appends = Some(ids(40001L to 48000L)), operation = "append")
      val b2 = ids(Seq(45000L, 90000L, 123L))
      assert(guarded(t, b2) == Set(90000L))
      val st3 = IdMembership.ensureCurrent(spark, t, "vec_id")
      assert(st3.shardBits > 3,
        s"outgrowing every shard must SPLIT, not saturate: $st3")
      assert(guarded(t, ids(47001L to 47050L)) == Set.empty[Long],
        "post-split probes must see the folded ids")
    } finally {
      IdMembership.minItemsForTests = None
      IdMembership.maxItemsForTests = None
    }
  }

  test("a sharded probe touches ONLY the shards the batch's ids land " +
    "in (one deserialization per shard per process), and a " +
    "SKEW-overflowed shard folds forever instead of a futile " +
    "same-geometry rebuild") {
    IdMembership.minItemsForTests = Some(256)
    IdMembership.maxItemsForTests = Some(2048)
    try {
      val root = Files.createTempDirectory("idmemshardp").toString
      val t = s"$root/corpus"
      Snapshot.createOrReplace(ids(1L to 5000L), t, keepVersions = 2)
      IdMembership.invalidate(t)
      val st = IdMembership.ensureCurrent(spark, t, "vec_id")
      assert(st.shardBits == 3)
      // a batch crafted to land ENTIRELY in one shard
      val target = 0
      val oneShard = (10000L to 40000L)
        .filter(shardOf(_, 3) == target).take(40)
      assert(oneShard.size == 40)
      val before = IdMembership.shardLoads.get()
      assert(guarded(t, ids(oneShard)) == oneShard.toSet)
      val loads = IdMembership.shardLoads.get() - before
      assert(loads == 1,
        s"a single-shard batch must deserialize exactly 1 shard, " +
          s"not $loads")
      // SKEW: overflow one shard (fold > capacity) while the TOTAL
      // would rebuild into the same geometry — must keep folding
      // (futile rebuilds are O(corpus) per window)
      val cap = st.capacity
      val skewIds = Iterator.iterate(100000L)(_ + 1)
        .filter(shardOf(_, 3) == target).take(cap.toInt + 50)
        .toSeq
      Snapshot.morCommit(spark, t, deletes = None,
        appends = Some(ids(skewIds)), operation = "append")
      val b = ids(Seq(skewIds.head, 999999999L))
      assert(guarded(t, b) == Set(999999999L),
        "the skew fold must stay exact")
      val st2 = IdMembership.ensureCurrent(spark, t, "vec_id")
      assert(st2.shardBits == st.shardBits &&
        st2.approxItems(target) > cap,
        s"a skew overflow whose total would not regrow must FOLD " +
          s"(approx grows past capacity), never rebuild: $st2")
    } finally {
      IdMembership.minItemsForTests = None
      IdMembership.maxItemsForTests = None
    }
  }

  test("the BULK distributed path stays exact with hit-shard-only " +
    "probe plans: a key type with no driver-side hash twin routes " +
    "fold and probe through the distributed arms, sharded and " +
    "unsharded (the bits==0 fold keeps full parallelism)") {
    // DECIMAL ids have no driver-side xxhash64 twin → every fold and
    // probe takes the bulk path: bloomsByShard for catch-ups (incl.
    // the bits==0 no-repartition arm) and the hit-shard CASE probe
    def decIds(xs: Seq[Long]): DataFrame =
      xs.map(i => (BigDecimal(i), s"p$i")).toDF("vec_id", "payload")
    def naiveDec(table: String, batch: DataFrame): Set[BigDecimal] =
      batch.join(Snapshot.read(spark, table).select("vec_id"),
        Seq("vec_id"), "left_anti")
        .select("vec_id").collect().map(_.getDecimal(0): BigDecimal)
        .toSet
    def guardedDec(table: String, batch: DataFrame): Set[BigDecimal] =
      IdMembership.freshOnly(spark, table, batch, "vec_id")
        .select("vec_id").collect().map(_.getDecimal(0): BigDecimal)
        .toSet
    // unsharded (bits == 0): bootstrap, probe, window fold
    val root = Files.createTempDirectory("idmembulk").toString
    val t0 = s"$root/flat"
    Snapshot.createOrReplace(decIds(1L to 400L), t0, keepVersions = 2)
    IdMembership.invalidate(t0)
    for (batch <- Seq(decIds(401L to 440L), decIds(50L to 90L),
        decIds(380L to 420L)))
      assert(guardedDec(t0, batch) == naiveDec(t0, batch),
        "the unsharded bulk guard must equal the exact anti-join")
    Snapshot.morCommit(spark, t0, deletes = None,
      appends = Some(decIds(501L to 540L)), operation = "append")
    val after = decIds(Seq(510L, 511L, 900L))
    assert(guardedDec(t0, after) == Set(BigDecimal(900L)),
      "the bits==0 distributed window fold must land before probing")
    // sharded: the probe plan embeds only the batch's hit shards —
    // exactness across shard boundaries is the pin (the plan-size
    // win is structural: the CASE enumerates the batch's shard set)
    IdMembership.minItemsForTests = Some(256)
    IdMembership.maxItemsForTests = Some(2048)
    try {
      val t1 = s"$root/sharded"
      Snapshot.createOrReplace(decIds(1L to 5000L), t1,
        keepVersions = 2)
      IdMembership.invalidate(t1)
      val st = IdMembership.ensureCurrent(spark, t1, "vec_id")
      assert(st.shardBits > 0, s"must bootstrap sharded: $st")
      for (batch <- Seq(decIds(9001L to 9040L), decIds(100L to 140L),
          decIds(4980L to 5020L)))
        assert(guardedDec(t1, batch) == naiveDec(t1, batch),
          "the sharded bulk probe must equal the exact anti-join")
      // a sharded DISTRIBUTED window fold (bloomsByShard) then probes
      Snapshot.morCommit(spark, t1, deletes = None,
        appends = Some(decIds(20001L to 20080L)), operation = "append")
      val b = decIds(Seq(20040L, 20041L, 31000L))
      assert(guardedDec(t1, b) == Set(BigDecimal(31000L)),
        "the sharded distributed fold must land before probing")
    } finally {
      IdMembership.minItemsForTests = None
      IdMembership.maxItemsForTests = None
    }
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
