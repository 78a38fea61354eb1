package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
