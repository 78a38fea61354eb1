package graft.ext

import graft.pipeline.Snapshot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Commit-maintained id-membership structure for a snapshot table —
  * the O(batch) overlap guard of the streaming maintenance loops
  * ([[graft.streaming.StreamingIndex]]).
  *
  * The naive exact guard anti-joins every micro-batch against the
  * table's column-pruned id column: correct, but O(corpus) per batch —
  * at a billion-id corpus the stream pays a full id-column scan for
  * every few thousand arriving rows. This module maintains a BLOOM
  * sidecar over the table's ids, kept current from the table's own
  * COMMIT WINDOW ([[IndexDelta.changesSince]] — O(delta) per catch-up,
  * the same primitive every persisted index refreshes from), so the
  * per-batch cost is:
  *
  *  - an O(batch) distributed bloom probe (the sketch travels as a
  *    plan literal, same expressions as Spark's own
  *    `InjectRuntimeFilter`), plus
  *  - an exact confirmation of the bloom-POSITIVE rows only (false
  *    positives + true duplicates) against the id column READ UNDER
  *    AN `IN (suspect ids)` PUSHDOWN — parquet min/max (and bloom,
  *    when written) prune the lookup to the files that can hold
  *    those ids; paid only when a batch actually carries suspects,
  *    never on the fresh-id steady state.
  *
  * Correctness never rests on the bloom: a bloom "no" is exact (the
  * sidecar always covers every id committed at its stamped version —
  * it is persisted BEFORE reads rely on it and only ever lags, which
  * the catch-up folds), and a bloom "yes" is confirmed exactly.
  * Deletes cannot leave a bloom, so a deleted-then-restreamed id
  * probes positive and the confirmation correctly re-admits it — the
  * sidecar is a monotone SUPERSET of the live id set, which is the
  * safe direction.
  *
  * Sizing is ADAPTIVE WITH A HARD CAP: the bootstrap sizes the
  * sketch at 2× the live id count (~16 bits/item → ~0.05% false
  * positives), the sidecar tracks an approximate item count as
  * catch-ups fold appends, and when the count outgrows the capacity
  * the sketch is rebuilt at the next size from the full id column —
  * geometric, amortized O(1) per streamed row — UP TO [[MaxItems]]
  * (16 MB of sketch). The cap is a MEASURED trade, not a shortcut:
  * every byte of sketch is paid on EVERY batch (the probe ships it
  * to each task, the driver fold deserializes + reserializes it, the
  * catch-up persists it) and in every distributed build (one
  * capacity-sized buffer per partial-aggregate task), so an
  * uncapped 38.4M-id corpus would ride a 77 MB sketch that costs
  * MORE per batch than the anti-join it replaces — while a
  * saturated capped sketch merely sends more bloom-positives to the
  * exact IN-pruned confirm, which the x256 soak measured FLAT.
  * Past the cap the bloom is a prefilter, not a registry; the
  * confirm keeps every trade-off exact, and an overfull bloom can
  * degrade only to more confirmations, never to wrong answers. */
object IdMembership {

  /** Sizing floor — sketches never start smaller than this many
    * expected items (4 MB at 8 bits/item). */
  val MinItems: Long = 1L << 22

  /** Sizing CAP — 16 MB of sketch at 8 bits/item (~16.7M items):
    * the largest sketch whose per-batch shipping/fold/persist cost
    * stays well under the exact confirm it saves (object doc). */
  val MaxItems: Long = 1L << 24

  private def numBits(items: Long): Long = items * 8

  /** Suspect sets up to this size confirm under an `IN` pushdown
    * (driver-bounded by the BATCH size, not the corpus); larger ones
    * fall back to the plain anti-join scan. */
  private val MaxInListSuspects = 16384

  private def sidecar(tableDir: String) = Paths.get(tableDir, "_id_bloom")

  private[graft] final case class State(version: Long, capacity: Long,
                                        approxItems: Long,
                                        bloom: Array[Byte])

  /** One state cached per table dir — the steady-state batch loop
    * re-reads the sidecar only when another writer advanced it. */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[String, State]

  /** Serializes the [[bloomAndCount]] conf raise/restore (a
    * session-global mutation two concurrent builds would corrupt). */
  private val confLock = new Object

  /** Serialized bloom over `xxhash64(keyCol)` plus the row count, in
    * ONE pass over `df` — the exact probe protocol
    * [[BloomFilterMightContain]] expects ([[BloomJoin]] uses the same
    * pair in-plan). Bloom is None when `df` is empty.
    *
    * [[BloomFilterAggregate]] SILENTLY clamps both parameters to
    * `spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}`
    * (defaults 4M items / 8 MB — sized for its join-filter role, not
    * an id corpus): past ~4M ids the sketch would be capped and
    * over-full while the caller believes it got the requested
    * capacity, so the geometric resize never fires and the guard
    * degrades toward confirming every batch. Raise the two confs to
    * cover the request for the duration of the build, and let callers
    * read the REAL capacity off the serialized sketch
    * ([[capacityOf]]) rather than trusting the request. */
  private def bloomAndCount(df: DataFrame, keyCol: String,
                            items: Long): (Option[Array[Byte]], Long) = {
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(keyCol))),
        Literal(items), Literal(numBits(items)))
        .toAggregateExpression())
    val conf = df.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    // the raise/restore is a session-global mutation: serialize
    // builds on one lock so two interleaved guards cannot "restore"
    // each other's raised value and leak the limits to unrelated
    // runtime-filter planning; a non-numeric user-set value reads as
    // 0 (the raise then simply covers the request)
    val row = IdMembership.confLock.synchronized {
      def asLong(s: String): Long =
        try s.toLong catch { case _: NumberFormatException => 0L }
      val (oldItems, oldBits) = (conf.get(itemsKey), conf.get(bitsKey))
      try {
        conf.set(itemsKey, math.max(items, asLong(oldItems)))
        conf.set(bitsKey, math.max(numBits(items), asLong(oldBits)))
        df.select(agg.as("bf"), count(lit(1)).as("n")).head()
      } finally {
        conf.set(itemsKey, oldItems)
        conf.set(bitsKey, oldBits)
      }
    }
    (Option(row.getAs[Array[Byte]](0)), row.getLong(1))
  }

  /** The item capacity the serialized sketch ACTUALLY has, from its
    * bit size under this module's 8-bits/item sizing — the ground
    * truth the resize trigger compares against (a clamped or
    * foreign-built sketch must resize by its real geometry, not the
    * requested one). Read from the 12-byte header (V1 format: int
    * version, int numHashFunctions, int word count), NOT by a full
    * readFrom — deserializing a 16 MB sketch just for its bit size
    * would tax every sidecar load; any unexpected version falls back
    * to the real deserializer. */
  private def capacityOf(bloom: Array[Byte]): Long = {
    if (bloom.length >= 12) {
      val buf = java.nio.ByteBuffer.wrap(bloom)
      val (version, _, words) = (buf.getInt, buf.getInt, buf.getInt)
      if (version == 1 && words >= 0 &&
          bloom.length >= 12 + words.toLong * 8)
        return words.toLong * 64 / 8
    }
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloom)).bitSize() / 8
  }

  private def emptyBloom(items: Long): Array[Byte] = {
    val f = org.apache.spark.util.sketch.BloomFilter
      .create(items, numBits(items))
    val out = new java.io.ByteArrayOutputStream()
    f.writeTo(out)
    out.toByteArray
  }

  private def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(a))
    fa.mergeInPlace(org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(b)))
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }

  private def capacityFor(n: Long): Long =
    math.min(MaxItems, math.max(MinItems, 2 * n))

  /** Windows up to this many rows fold DRIVER-SIDE (collect the ids,
    * putLong into the cached sketch): a distributed fold allocates a
    * CAPACITY-sized bloom buffer per partial-aggregate task — at a
    * 38M-id corpus that is 32 × 76 MB of churn to insert a 5k-row
    * batch. The driver fold is O(window) and the steady-state batch
    * loop never leaves it; only bulk windows pay the distributed
    * aggregate. */
  private val MaxDriverFoldRows = 1L << 18

  /** Atomic sidecar write: stamped version, sketch capacity,
    * approximate item count (24 bytes big-endian), then the bloom
    * bytes. The stamp is the table version whose full id set the
    * bloom is a superset of. */
  private def persist(tableDir: String, s: State): Unit = {
    val f = sidecar(tableDir)
    val tmp = Paths.get(s"$f.tmp")
    val buf = java.nio.ByteBuffer.allocate(24 + s.bloom.length)
    buf.putLong(s.version).putLong(s.capacity).putLong(s.approxItems)
      .put(s.bloom)
    Files.write(tmp, buf.array())
    Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    cache.put(tableDir, s)
  }

  private def load(tableDir: String): Option[State] = {
    val f = sidecar(tableDir)
    if (!Files.exists(f)) None
    else {
      val bytes = Files.readAllBytes(f)
      if (bytes.length <= 24) None // torn/empty → rebuild
      else {
        val buf = java.nio.ByteBuffer.wrap(bytes)
        val (version, _, approx) = (buf.getLong, buf.getLong, buf.getLong)
        val bloom = java.util.Arrays.copyOfRange(bytes, 24, bytes.length)
        // capacity from the sketch's REAL geometry, not the stored
        // request: a sidecar written under a clamped build (the
        // BloomFilterAggregate maxNumBits default) records a capacity
        // its bits cannot honor — trusting it would suppress the
        // resize forever while false positives climb
        try Some(State(version, capacityOf(bloom), approx, bloom))
        catch { case _: java.io.IOException => None } // corrupt → rebuild
      }
    }
  }

  /** Full rebuild from the live id column — the bootstrap, the
    * unrecoverable-window fallback, and the geometric re-size share
    * it. Capacity = 2× the live count, so steady streaming burns half
    * its false-positive budget before the next re-size. */
  private def rebuild(spark: SparkSession, tableDir: String,
                      keyCol: String, live: Long): State = {
    val ids = Snapshot.read(spark, tableDir).select(keyCol)
    val probe = ids.limit(1).count()
    if (probe == 0) State(live, MinItems, 0L, emptyBloom(MinItems))
    else {
      val n = ids.count()
      val cap = capacityFor(n)
      val (bf, _) = bloomAndCount(ids, keyCol, cap)
      val bloom = bf.getOrElse(emptyBloom(cap))
      // record what the sketch REALLY holds (== cap under the raised
      // confs; the honest trigger if anything ever clamps the build)
      State(live, capacityOf(bloom), n, bloom)
    }
  }

  /** Driver-side fold of a SMALL window: collect the ids and putLong
    * their xxhash64 into the sketch — no capacity-sized task buffers.
    * None when the window is too large or the key type has no
    * driver-side hash twin (→ the distributed fold). */
  private def foldDriverSide(win: DataFrame, keyCol: String,
                             bloom: Array[Byte]): Option[(Array[Byte], Long)] = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val dt = win.schema(keyCol).dataType
    if (dt != LongType && dt != IntegerType && dt != StringType)
      return None
    val rows = win.select(keyCol).limit(MaxDriverFoldRows.toInt + 1)
      .collect()
    if (rows.length > MaxDriverFoldRows) return None
    val f = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bloom))
    val X = org.apache.spark.sql.catalyst.expressions.XxHash64Function
    rows.foreach { r =>
      val v = r.get(0)
      if (v != null) {
        // the exact probe protocol: xxhash64(value) with Spark's
        // internal representation (strings hash as UTF8String)
        val internal = v match {
          case s: String =>
            org.apache.spark.unsafe.types.UTF8String.fromString(s)
          case x => x
        }
        f.putLong(X.hash(internal, dt, 42L))
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    f.writeTo(out)
    Some((out.toByteArray, rows.length.toLong))
  }

  /** Bring the sidecar current to the table's live version and return
    * it: fold the commit window's appended ids (O(delta)); rebuild
    * from the full id column only on bootstrap, an unrecoverable
    * window, or when the folded item count outgrows the sketch
    * capacity (geometric — amortized O(1) per row). Deleted ids stay
    * in the bloom — a superset is the safe direction (object doc). */
  private[graft] def ensureCurrent(spark: SparkSession,
                                   tableDir: String,
                                   keyCol: String): State = {
    val live = Snapshot.currentVersion(tableDir).getOrElse(
      throw new IllegalStateException(
        s"no snapshot table at $tableDir — nothing to guard"))
    val stored = cache.get(tableDir).orElse(
      load(tableDir).map { s => cache.put(tableDir, s); s })
    stored.filter(_.version == live).getOrElse {
      val next = stored.filter(_.version < live) match {
        case Some(s) =>
          try {
            val w = IndexDelta.changesSince(spark, tableDir, s.version,
              live, "id membership", keyCol)
            val win = w.appended.select(keyCol)
            val (folded, n) = foldDriverSide(win, keyCol, s.bloom)
              .getOrElse {
                val (bf, m) = bloomAndCount(win, keyCol, s.capacity)
                (bf.map(merge(s.bloom, _)).getOrElse(s.bloom), m)
              }
            val grown = s.approxItems + n
            // geometric re-size ONLY while it can actually grow: at
            // MaxItems a rebuild would produce the same geometry, so
            // an at-cap sketch folds forever (saturation is absorbed
            // by the exact confirm, not by futile per-window rebuilds)
            if (grown > s.capacity && s.capacity < MaxItems)
              rebuild(spark, tableDir, keyCol, live)
            else State(live, s.capacity, grown, folded)
          } catch {
            // compaction/rebase past the stamp: the window is
            // unrecoverable — the amortized full rebuild
            case _: IllegalStateException =>
              rebuild(spark, tableDir, keyCol, live)
            // a legacy sidecar built under the clamped aggregate has
            // geometry a correctly-sized window sketch cannot merge
            // with — heal by rebuilding at the honest size
            case _: org.apache.spark.util.sketch.IncompatibleMergeException =>
              rebuild(spark, tableDir, keyCol, live)
          }
        case _ => rebuild(spark, tableDir, keyCol, live)
      }
      persist(tableDir, next)
      next
    }
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column — false ⇒
    * DEFINITELY absent from the guarded table; true ⇒ confirm
    * exactly. The sketch rides a SCALAR SUBQUERY over a one-row local
    * relation, NOT a binary literal: plan-string rendering (AQE
    * updates, the UI, explain) hex-dumps literals, so a multi-MB
    * bloom literal turns every plan render into minutes of
    * StringBuilder — the subquery form (Spark's own
    * `InjectRuntimeFilter` shape, [[BloomJoin]] too) keeps the bytes
    * out of every plan string and canonicalization. */
  def mightContain(spark: SparkSession, bloom: Array[Byte],
                   key: Column): Column = {
    val bfPlan = {
      import spark.implicits._
      Seq(bloom).toDF("bf").queryExecution.analyzed
    }
    ColumnBridge.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bfPlan),
      ColumnBridge.expression(xxhash64(key))))
  }

  /** The rows of `batch` whose `keyCol` is NOT in the table: bloom
    * negatives pass outright (exact — see [[mightContain]]); bloom
    * positives are confirmed against the id column read under an
    * `IN (suspect ids)` pushdown (min/max / parquet-bloom pruned),
    * touched ONLY when such suspects exist. Result is exactly
    * `batch WHERE keyCol NOT IN (table ids)` — identical to the full
    * anti-join, at O(batch) steady-state cost. */
  def freshOnly(spark: SparkSession, tableDir: String, batch: DataFrame,
                keyCol: String): DataFrame = {
    val s = ensureCurrent(spark, tableDir, keyCol)
    val mc = mightContain(spark, s.bloom, col(keyCol))
    // ONE bloom evaluation per batch (the probe deserializes the
    // sketch per task — materialize the suspects once and derive both
    // the confirm input and the fresh set from the checkpointed frame)
    val suspects = batch.filter(mc).localCheckpoint()
    // driver-bounded: ≤ batch size, list-capped below
    val suspectIds = suspects.select(keyCol).distinct()
      .limit(MaxInListSuspects + 1).collect().map(_.get(0))
    if (suspectIds.isEmpty) batch
    else {
      val corpusIds = Snapshot.read(spark, tableDir).select(keyCol)
      // the IN pushdown lets a manifest-carrying, key-clustered
      // corpus prune the confirm to the files that can hold the
      // suspect ids (StatsPruningFileIndex any-of skipping)
      val confirmSrc =
        if (suspectIds.length > MaxInListSuspects) corpusIds
        else corpusIds.filter(col(keyCol).isin(suspectIds: _*))
      val dups = suspects.join(confirmSrc, Seq(keyCol), "left_semi")
        .select(keyCol).distinct().localCheckpoint()
      batch.join(dups, Seq(keyCol), "left_anti")
    }
  }

  /** Test/ops hook: drop the cached sidecar state (e.g. after a
    * foreign process replaced the table dir wholesale). */
  private[graft] def invalidate(tableDir: String): Unit =
    cache.remove(tableDir)
}
