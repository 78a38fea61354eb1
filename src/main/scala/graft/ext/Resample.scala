package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X9''''' — time-series resampling with linear interpolation: project
  * each key's irregular (ts, value) series onto a regular grid,
  * interpolating between the surrounding observations — the gap-filling
  * step before any fixed-step rolling statistic, forecast feature, or
  * tensor export (pandas `resample().interpolate()`, TimescaleDB
  * `time_bucket_gapfill` + `interpolate`).
  *
  * Mechanism: per key, the grid points (one `sequence`/`explode`, no
  * join) union with the observations; ONE exchange on the key then two
  * ordered passes — `last(value) ignoreNulls` ascending gives the
  * previous observation at-or-before each grid point, `first(...)` over
  * the following frame gives the next strictly-after. Interpolation is
  * the single IEEE expression `v0 + (v1 − v0) · (t − t0)/(t1 − t0)`
  * with the division mirrored in the oracle, so values hash-compare.
  * Grid points at/after the last observation carry it forward
  * (`coalesce` to the previous side; leading points before the first
  * observation are dropped — no extrapolation backwards).
  *
  * Ordering contract: observations at the same timestamp break ties by
  * `idCol` (last wins); grid rows sort AFTER same-ts observations, so
  * an exactly-hit grid point reports that observation (ratio 0).
  *
  * Scale: the grid is generated per key (`sequence` bounded by the
  * key's own span / `stepMicros`); the only row-scaled cost is the one
  * key-shuffle + two in-partition sorted passes — the same class as any
  * per-key window. Skewed keys are bounded by events-per-key.
  */
object Resample {

  /** @param df      (keys..., tsCol long micros, valueCol double, idCol)
    * @param keys    series key column(s)
    * @param stepMicros grid step
    * @return (keys..., grid_ts, value) — one row per key per grid point
    *         inside `[ceil(min/step)·step, floor(max/step)·step]` */
  def interpolate(df: DataFrame, keys: Seq[String], tsCol: String,
                  valueCol: String, idCol: String,
                  stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"stepMicros must be positive: $stepMicros")
    val k = keys.map(col)
    val step = lit(stepMicros)
    // per-key grid: one row per aligned step inside the observed span
    // ceil spelled with positive operands only: Spark's `div` truncates
    // toward zero while DuckDB's `//` floors — they agree iff nothing
    // goes negative (timestamps are positive micros)
    val grid = df.groupBy(k: _*)
      .agg(min(col(tsCol)).as("_lo"), max(col(tsCol)).as("_hi"))
      .withColumn("_g0",
        expr(s"((_lo + $stepMicros - 1) div $stepMicros) * $stepMicros"))
      .withColumn("_g1", expr(s"(_hi div $stepMicros) * $stepMicros"))
      // a key whose span contains no aligned step has no grid rows
      // (Spark's sequence raises on start > stop; DuckDB's
      // generate_series returns empty — filter for both)
      .filter(col("_g0") <= col("_g1"))
      .select(k :+ explode(sequence(col("_g0"), col("_g1"), step))
        .as("_t"): _*)
      .select(k :+ col("_t") :+ lit(null).cast("double").as("_v") :+
        lit(null).cast("long").as("_id") :+ lit(1).as("_is_grid"): _*)
    val obs = df.select(k :+ col(tsCol).as("_t") :+
      col(valueCol).cast("double").as("_v") :+
      col(idCol).cast("long").as("_id") :+ lit(0).as("_is_grid"): _*)

    val order = Seq(col("_t").asc, col("_is_grid").asc,
      col("_id").asc_nulls_last)
    val back = Window.partitionBy(k: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(k: _*).orderBy(order: _*)
      .rowsBetween(1, Window.unboundedFollowing)

    obs.unionByName(grid)
      .withColumn("_v0", last(col("_v"), ignoreNulls = true).over(back))
      .withColumn("_t0", last(when(col("_v").isNotNull, col("_t")),
        ignoreNulls = true).over(back))
      .withColumn("_v1", first(col("_v"), ignoreNulls = true).over(fwd))
      .withColumn("_t1", first(when(col("_v").isNotNull, col("_t")),
        ignoreNulls = true).over(fwd))
      .filter(col("_is_grid") === 1 && col("_v0").isNotNull)
      .select(k :+ col("_t").as("grid_ts") :+
        when(col("_v1").isNull || col("_t1") === col("_t0"), col("_v0"))
          .otherwise(col("_v0") + (col("_v1") - col("_v0")) *
            ((col("_t") - col("_t0")).cast("double") /
              (col("_t1") - col("_t0")).cast("double")))
          .as("value"): _*)
  }
}
