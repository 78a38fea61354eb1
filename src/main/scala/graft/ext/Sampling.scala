package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, id-stable sampling and dataset splitting — the
  * train/test partitioner a training-data pipeline needs. Spark's
  * `randomSplit` depends on partitioning and a seed-per-partition RNG;
  * re-running it after a repartition reassigns rows. Hash-bucketing on
  * a stable id never does: a document keeps its split across reruns,
  * cluster sizes, and engines (md5 is engine-portable, so assignment
  * is oracle-checkable).
  *
  * Bucket = first 8 md5 hex chars of the id's string form, mod 100 —
  * uniform over buckets; per-row compute only, no shuffle at all.
  */
object Sampling {

  /** Stable bucket in [0, 100) for an id column. */
  def bucket100(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(100))

  /** Adds `bucket` and a `split` label: buckets [0, testPct) → "test",
    * the rest → "train". */
  def trainTestSplit(df: DataFrame, idCol: String, testPct: Int): DataFrame = {
    require(testPct > 0 && testPct < 100, s"testPct in (0,100), got $testPct")
    df.withColumn("bucket", bucket100(col(idCol)))
      .withColumn("split",
        when(col("bucket") < testPct, lit("test")).otherwise(lit("train")))
  }

  /** Deterministic pct% sample: rows whose bucket falls below `pct`. */
  def sample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(bucket100(col(idCol)) < pct)

  /** Deterministic STRATIFIED sample: per-stratum keep-percentage
    * (strata absent from `pcts` keep 0%) — the language/source-mixing
    * knob of a training-data pipeline ("60% en, 30% de, 10% fr"), as a
    * pure per-row filter. Same id-stable bucket as [[sample]], so rows
    * keep their fate across reruns and engines and the per-stratum
    * rates compose with [[trainTestSplit]]; zero shuffle, and the
    * bucket predicate sits directly on the scan. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       pcts: Map[String, Int]): DataFrame = {
    require(pcts.values.forall(p => p >= 0 && p <= 100),
      s"percentages in [0,100], got $pcts")
    val pctCol = pcts.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket100(col(idCol)) < pctCol)
  }

  /** Per-stratum quota cap: keep at most `n` rows per stratum (the
    * "max N documents per domain" de-biasing pass of a web-scale
    * corpus), selected deterministically by (bucket, id) so the kept
    * set is id-stable across reruns and engines.
    *
    * Scale design: a naive `row_number()` window ranks EVERY row of a
    * stratum on one reducer — a hot domain with 10^9 pages serializes
    * on it. Here the full ranking never happens: a tiny
    * (stratum, bucket) histogram (≤100 rows per stratum) decides per
    * stratum which WHOLE buckets fall inside the quota, and only the
    * single boundary bucket (~1% of the stratum) pays an exact per-id
    * rank; everything below the boundary passes through a broadcast
    * semi-filter with no window at all. The data-sized shuffles are one
    * partial-agg histogram pass and the boundary slice's rank.
    *
    * Ties: `idCol` must be unique per stratum — equal ids straddling
    * the boundary would make the kept SET engine-dependent. */
  def quotaSample(df: DataFrame, idCol: String, stratumCol: String,
                  n: Int): DataFrame = {
    require(n > 0, s"quota must be positive, got $n")
    val withB = df.withColumn("_qb", bucket100(col(idCol)))
    val hist = withB.groupBy(col(stratumCol), col("_qb"))
      .agg(count(lit(1)).as("_cnt"))
    val wcum = Window.partitionBy(stratumCol).orderBy("_qb")
    // rows ranked BEFORE this bucket within the stratum
    val cum = hist.withColumn("_prev",
      sum("_cnt").over(wcum) - col("_cnt"))
    val taken = cum.filter(col("_prev") < n)
    val bounds = taken.groupBy(stratumCol).agg(max("_qb").as("_bmax"))
    val boundary = taken.join(bounds, Seq(stratumCol))
      .filter(col("_qb") === col("_bmax"))
      .select(col(stratumCol), col("_bmax"),
        (lit(n.toLong) - col("_prev")).as("_take"))
    val joined = withB.join(broadcast(boundary), Seq(stratumCol))
    val below = joined.filter(col("_qb") < col("_bmax"))
    val wRank = Window.partitionBy(stratumCol).orderBy(idCol)
    val atBoundary = joined.filter(col("_qb") === col("_bmax"))
      .withColumn("_rk", row_number().over(wRank))
      .filter(col("_rk") <= col("_take")).drop("_rk")
    below.unionByName(atBoundary)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
