package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) data layout: interleave the bits of two
  * bucketized dimensions so that rows close in BOTH dimensions land
  * close in the sort order — the clustering that lets a parquet scan's
  * row-group min/max statistics prune a two-dimensional range query
  * (time × value, tenant × date, …), where a lexicographic sort only
  * prunes its leading column. The Iceberg/Delta `ZORDER BY` capability
  * re-expressed as a plain column expression + range-partitioned write.
  *
  * The z-value is exact 64-bit integer arithmetic (a 32-term sum of
  * masked shifts — codegen-able, engine-portable, oracle-checked
  * cell-for-cell), not a UDF.
  */
object Layout {

  /** Bits interleaved per dimension (16 each → 32-bit z-value). */
  val ZBits = 16

  /** Clamp a non-negative long into [0, 2^ZBits). Callers bucketize
    * raw dimensions first (e.g. epoch-seconds / 3600, value / 10). */
  def zClamp(c: Column): Column =
    least(greatest(c.cast("long"), lit(0L)), lit((1L << ZBits) - 1))

  /** Morton z-value of two bucketized dimensions: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Strictly scan-side: a 32-term
    * integer expression, no shuffle, no state. */
  def zValue(a: Column, b: Column): Column = {
    val (ca, cb) = (zClamp(a), zClamp(b))
    (0 until ZBits).map { i =>
      shiftright(ca, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(cb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Inverse of [[zValue]]: recover the two bucketized dimensions from
    * a z-value — (even bits, odd bits). Scan-side like the forward
    * direction; the round-trip is property-tested. */
  def zSplit(z: Column): (Column, Column) = {
    def gather(offset: Int): Column =
      (0 until ZBits).map { i =>
        shiftright(z, 2 * i + offset).bitwiseAND(lit(1L)) * lit(1L << i)
      }.reduce(_ + _)
    (gather(0), gather(1))
  }

  /** DuckDB twin of [[zValue]], generated from the same constants. */
  def zValueSql(a: String, b: String): String = {
    def clamp(x: String) =
      s"least(greatest(CAST($x AS BIGINT), 0), ${(1L << ZBits) - 1})"
    (0 until ZBits).map { i =>
      s"((${clamp(a)} >> $i) & 1) * ${1L << (2 * i)}" +
        s" + ((${clamp(b)} >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")
  }

  /** Query-side twin of the z-ordered layout: decompose the 2-D box
    * [aLo,aHi] × [bLo,bHi] into contiguous z-value ranges — an aligned
    * 2^k square's z-values are one contiguous block of 4^k, so the
    * quad-tree recursion emits exact ranges for fully-covered cells and
    * refines partial ones. A `z BETWEEN lo AND hi OR …` predicate over
    * these ranges prunes z-ordered files/row-groups on BOTH dimensions.
    *
    * `maxRanges` caps the decomposition: when refining would exceed it,
    * the partially-covered cell's WHOLE range is emitted instead — a
    * superset, which is sound for pruning because the reader keeps the
    * exact box predicate as the residual filter (the standard
    * coarse-ranges + exact-residual contract). Pure driver-side
    * arithmetic, deterministic. */
  def zRangesForBox(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
                    maxRanges: Int = 64): Seq[(Long, Long)] = {
    require(maxRanges >= 1, s"maxRanges must be >= 1, got $maxRanges")
    def clampD(x: Long) = math.min(math.max(x, 0L), (1L << ZBits) - 1)
    val (alo, ahi) = (clampD(aLo), clampD(math.max(aLo, aHi)))
    val (blo, bhi) = (clampD(bLo), clampD(math.max(bLo, bHi)))
    def zOf(a: Long, b: Long): Long =
      (0 until ZBits).map { i =>
        ((a >> i) & 1L) * (1L << (2 * i)) + ((b >> i) & 1L) * (1L << (2 * i + 1))
      }.sum
    // cell = aligned square of side 2^k at (aMin, bMin); its z-block is
    // [zOf(aMin,bMin), zOf(aMin,bMin) + 4^k - 1]. Children visited in
    // z-block order, so `out` stays sorted; a GLOBAL budget decides
    // when a partially-covered cell stops refining and emits its whole
    // block (sound superset).
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    def rec(k: Int, aMin: Long, bMin: Long): Unit = {
      val side = 1L << k
      val (aMax, bMax) = (aMin + side - 1, bMin + side - 1)
      if (aMax < alo || aMin > ahi || bMax < blo || bMin > bhi) return
      val z0 = zOf(aMin, bMin)
      val covered = aMin >= alo && aMax <= ahi && bMin >= blo && bMax <= bhi
      if (covered || k == 0 || out.size >= maxRanges - 1)
        out += ((z0, z0 + (1L << (2 * k)) - 1))
      else {
        val h = side / 2
        rec(k - 1, aMin, bMin); rec(k - 1, aMin + h, bMin)
        rec(k - 1, aMin, bMin + h); rec(k - 1, aMin + h, bMin + h)
      }
    }
    rec(ZBits, 0L, 0L)
    out.foldLeft(Vector.empty[(Long, Long)]) { (acc, r) =>
      acc.lastOption match {
        case Some((lo, hi)) if r._1 == hi + 1 =>
          acc.init :+ (lo, math.max(hi, r._2))
        case _ => acc :+ r
      }
    }
  }

  /** Write `df` z-ordered on the two bucketized dimension columns:
    * range-partition on the z-value (so each output file covers a
    * compact z-range → tight per-file and per-row-group min/max on BOTH
    * dimensions), sort within partitions, drop the helper column. The
    * write itself is [[graft.pipeline.Snapshot.createOrReplace]]'s
    * atomic swap. */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    numFiles: Int = 0): Unit = {
    val z = df.withColumn("_z", zValue(a, b))
    val parts =
      if (numFiles > 0) z.repartitionByRange(numFiles, col("_z"))
      else z.repartitionByRange(col("_z"))
    graft.pipeline.Snapshot.createOrReplace(
      parts.sortWithinPartitions("_z").drop("_z"), path)
  }
}
