package graft.ext

import org.apache.spark.sql.DataFrame
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
  private val HashSpace = 1152921504606846976.0d

  /** 60-bit uniform hash of a column's string form (15 md5 hex chars —
    * mirrored in DuckDB as `('0x' || md5(x)[1:15])::BIGINT`). */
  def hash60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-group approximate distinct count of `valueCol`.
    * @return one row per group: groupCols*, est_distinct (double) */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_h"))
    df.select(groupCols.map(col) :+ hash60(col(valueCol)).as("_h"): _*)
      .distinct()
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_m"), max(col("_h")).as("_hk"))
      .select(groupCols.map(col) :+
        when(col("_m") < k, col("_m").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("_hk"))
          .as("est_distinct"): _*)
  }
}
