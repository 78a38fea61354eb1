package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches built from deterministic hashes —
  * unlike HLL (whose register layout is engine-internal), every step
  * here is reproducible in any engine that has md5, so the sketch
  * itself is oracle-checkable cell-for-cell.
  *
  * KMV (k-minimum-values) estimator [Bar-Yossef et al. 2002]: hash the
  * distinct values uniformly into [0, 2^60), keep the k smallest
  * hashes per group; with h_k the k-th smallest, the cardinality
  * estimate is (k-1) · 2^60 / h_k (the classic unbiased KMV form).
  * Groups with fewer than k distinct hashes report the exact count.
  *
  * Scale shape: one shuffle on (group, hash) for the distinct, one on
  * group for the top-k window — both partial-aggregated map-side. The
  * sketch state is k longs per group (vs the full distinct set), which
  * is the point at 100 TB: k=1024 gives ~3% relative error at any
  * cardinality. Expected-error test in SketchesSpec.
  */
object Sketches {

  /** 2^60 as double (exact — dyadic, well under double range). */
  private[graft] val HashSpace = 1152921504606846976.0d

  /** 60-bit uniform hash of a column's string form (15 md5 hex chars —
    * mirrored in DuckDB as `('0x' || md5(x)[1:15])::BIGINT`). */
  def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** The shared KMV core: the k smallest DISTINCT [[hash60]] values of
    * `valueCol` per group — both the [[kmvDistinct]] estimate and a
    * persistable sketch ([[kmvMerge]]/[[kmvEstimate]]) derive from
    * this frame, so the dedup/top-k discipline lives in one place.
    * @return one row per kept hash: groupCols*, _h (long) */
  def kmvTopK(df: DataFrame, groupCols: Seq[String], valueCol: String,
              k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_h"))
    df.select(groupCols.map(col) :+ hash60(col(valueCol)).as("_h"): _*)
      .distinct()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select(groupCols.map(col) :+ col("_h"): _*)
  }

  /** Per-group approximate distinct count of `valueCol`.
    * @return one row per group: groupCols*, est_distinct (double) */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame =
    kmvTopK(df, groupCols, valueCol, k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_m"), max(col("_h")).as("_hk"))
      .select(groupCols.map(col) :+
        when(col("_m") < k, col("_m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("_hk"))
          .as("est_distinct"): _*)

  /** X10d — equi-width histogram quantile sketch: per-group quantile
    * ESTIMATES from a `bins`-row counter table instead of a data-sized
    * ranking window. The mergeable-histogram shape every warehouse's
    * approx-percentile rests on, kept engine-portable (fixed arithmetic
    * bin edges, no t-digest internals) so the estimate itself is
    * oracle-checkable.
    *
    * Two occurrence-sized passes, both partial-aggregated: (1) per-group
    * min/max/count, (2) per-(group, bin) counts — sketch state is ≤
    * `bins` longs per group at any data size, counters mergeable by
    * addition across corpora/days. The cumulative walk and the
    * rank→bin pick run over the SKETCH (≤ bins rows per group), so the
    * only windows in the plan are sketch-sized. Estimate = the lower
    * edge of the first bin whose cumulative count reaches
    * ceil(n·q) — biased low by at most one bin width, the documented
    * resolution knob (`bins`).
    *
    * The exact twin ([[graft.queries]] `q_value_quantiles`) costs a
    * per-group data-sized ranking window — this sketch is what replaces
    * it at 100 TB; the `q_hist_quantiles` query lays est and exact side
    * by side, the same self-audit shape as [[kmvDistinct]].
    *
    * @param qs (label, q) pairs, e.g. ("p50", 0.5)
    * @return groupCols* :+ (quantile, est_value) */
  def histQuantiles(df: DataFrame, groupCols: Seq[String],
                    valueCol: String, bins: Int,
                    qs: Seq[(String, Double)]): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(qs.nonEmpty, "qs must be non-empty")
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val nonNull = df.filter(col(valueCol).isNotNull)
    val stats = nonNull.groupBy(g: _*).agg(
      min(v).as("_mn"), max(v).as("_mx"), count(lit(1)).as("_n"))
    val width = (col("_mx") - col("_mn")) / lit(bins.toDouble)
    val binned = nonNull.join(broadcast(stats), groupCols)
      .withColumn("_bin", least(lit((bins - 1).toLong),
        when(col("_mx") === col("_mn"), lit(0L))
          .otherwise(floor((v - col("_mn")) / width))))
      .groupBy(g :+ col("_bin"): _*).agg(count(lit(1)).as("_c"))
    val wcum = Window.partitionBy(g: _*).orderBy("_bin")
    val cum = binned.withColumn("_cum", sum("_c").over(wcum))
      .join(broadcast(stats), groupCols)
    qs.map { case (label, q) =>
      cum.filter(col("_cum") >= ceil(col("_n") * lit(q)))
        .groupBy(g: _*).agg(min(col("_bin")).as("_qb"),
          min(col("_mn")).as("_m0"), min(col("_mx")).as("_m1"))
        .select(g :+ lit(label).as("quantile") :+
          (col("_m0") + col("_qb").cast("double") *
            ((col("_m1") - col("_m0")) / lit(bins.toDouble)))
            .as("est_value"): _*)
    }.reduce(_ unionByName _)
  }

  /** CMS row-hash: bucket of `value` in sketch row `i` — 32-bit md5
    * prefix of "i:value" mod width. Mirrored in DuckDB as
    * `('0x' || md5(CAST(i AS VARCHAR) || ':' || v)[1:8])::BIGINT % w`. */
  private def cmsBucket(i: Int, value: Column, width: Int): Column =
    conv(substring(md5(concat_ws(":", lit(i).cast("string"),
      value.cast("string"))), 1, 8), 16, 10).cast("long") % width

  /** X10c — count-min sketch [Cormode & Muthukrishnan 2005] build:
    * every occurrence lands in one bucket per row; the sketch is the
    * (row, bucket, cnt) counter table — depth × width rows TOTAL,
    * independent of the data size. One partial-agg shuffle builds it:
    * a hot token collapses map-side, so the 100-TB frequency table
    * costs a scan plus a ~1k-row aggregate. Counters are trivially
    * mergeable across corpora (sum by (row, bucket)). */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int = 4,
                width: Int = 256): DataFrame =
    cmsSketchWeighted(df, valueCol, lit(1L), depth, width)

  /** [[cmsSketch]] over pre-aggregated (value, weight) rows — e.g. an
    * existing frequency table — so a corpus already reduced to counts
    * pays vocabulary-sized work, not occurrence-sized.
    * `cmsSketchWeighted(counts, v, col("cnt"))` ==
    * `cmsSketch(rawOccurrences, v)` by the linearity of the counters. */
  def cmsSketchWeighted(df: DataFrame, valueCol: String, weight: Column,
                        depth: Int = 4, width: Int = 256): DataFrame =
    df.select(weight.cast("long").as("_w"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("row"),
            cmsBucket(i, col(valueCol), width).as("bucket"))): _*))
          .as("_rb"))
      .select(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"),
        col("_w"))
      .groupBy("row", "bucket").agg(sum(col("_w")).as("cnt"))

  /** CMS point estimate for each distinct value of `candidates`:
    * min over rows of the value's bucket counter — an OVERestimate,
    * never under (every occurrence of v increments all of v's
    * buckets; collisions only add). The sketch is broadcast (it is
    * depth × width rows); the candidate side stays distributed.
    * Deterministic md5 arithmetic → the estimates themselves are
    * oracle-checked. */
  def cmsEstimate(candidates: DataFrame, valueCol: String,
                  sketch: DataFrame, depth: Int = 4,
                  width: Int = 256): DataFrame =
    candidates.select(col(valueCol)).distinct()
      .select(col(valueCol), explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"),
          cmsBucket(i, col(valueCol), width).as("bucket"))): _*))
        .as("_rb"))
      .select(col(valueCol), col("_rb.row").as("row"),
        col("_rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col(valueCol))
      .agg(min(col("cnt")).as("est_count"))

  /** NDV estimate from the k smallest DISTINCT [[hash60]] values —
    * the driver-side twin of [[kmvDistinct]]'s estimator (identical
    * formula, so an estimate recomputed from a PERSISTED sketch
    * agrees with the estimate stored beside it). Sketches merge by
    * union-distinct-take-k ([[kmvOverlap]]'s identity: any of the k
    * union minima is in one side's k minima), which is how the
    * incremental ANALYZE column-stats refresh composes per-commit
    * sketches without rescanning the table. */
  def kmvEstimate(hashes: Seq[Long], k: Int): Double = {
    require(k >= 2, s"k must be >= 2, got $k")
    if (hashes.size < k) hashes.size.toDouble
    else (k - 1).toDouble * HashSpace / hashes.max
  }

  /** Merge KMV sketches (k smallest distinct hashes each) into a
    * valid sketch of the union. */
  def kmvMerge(k: Int, sketches: Seq[Long]*): Seq[Long] =
    sketches.flatten.distinct.sorted.take(k)

  /** Corpus-level KMV sketch: the k smallest distinct 60-bit hashes of
    * `valueCol`. `orderBy.limit(k)` plans as TakeOrdered — each
    * partition surfaces its own k smallest and the driver merges k
    * longs per partition; no global sort ever materializes. The
    * distinct before it is partial-aggregated, so a hot value
    * collapses map-side. */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.select(hash60(col(valueCol)).as("h")).distinct()
      .orderBy("h").limit(k)

  /** X10b — KMV set operations [Beyer et al., SIGMOD 2007]: estimate
    * |A∪B|, Jaccard(A,B) and |A∩B| for two corpora from their k-long
    * sketches ALONE. The merged sketch is the k smallest of
    * sketch(A) ∪ sketch(B) (a valid KMV of A∪B, since any of the k
    * union-minima is in one side's k minima); the Jaccard estimator is
    * the fraction of merged hashes present in BOTH per-corpus
    * sketches. With fewer than k distinct union hashes every estimate
    * degrades to exact.
    *
    * Scale shape: each corpus contributes one distinct + TakeOrdered
    * pass; everything after runs on ≤ 2k rows. This is the "compare
    * two crawls without joining them" primitive — overlap of two
    * 100-TB corpora costs two scans and a 2k-row merge, and because
    * every step is deterministic md5 arithmetic the ESTIMATES
    * themselves are oracle-checked cell-for-cell.
    *
    * @return one row: union_est, jaccard_est, intersect_est (doubles)
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, valueCol: String,
                 k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sa = kmvSketch(a, valueCol, k)
      .select(col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
    val sb = kmvSketch(b, valueCol, k)
      .select(col("h"), lit(0).as("in_a"), lit(1).as("in_b"))
    sa.unionByName(sb)
      .groupBy("h").agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .orderBy("h").limit(k)
      .agg(count(lit(1)).as("_m"), max(col("h")).as("_hk"),
        sum(col("in_a") * col("in_b")).as("_nboth"))
      .select(
        when(col("_m") < k, col("_m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("_hk"))
          .as("union_est"),
        (col("_nboth").cast("double") / col("_m")).as("jaccard_est"))
      .withColumn("intersect_est", col("union_est") * col("jaccard_est"))
  }
}
