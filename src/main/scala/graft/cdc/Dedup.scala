package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-writer-wins dedup over a change stream.
  *
  * W1 (`/root/reference/jobs/merge_orders_silver.py:112-118`): rank by
  * `row_number()` over `partitionBy(key).orderBy(ordering desc...)`,
  * keep rank 1. Deterministic given a unique tie-break column (the
  * reference uses `kafka_offset`).
  *
  * W2 (`/root/reference/jobs/build_orders_silver.py:74-78`):
  * `orderBy(...).dropDuplicates(key)` — same intent but depends on
  * sort-order retention through dropDuplicates, which Spark does not
  * guarantee across partitions. Implemented for surface parity; W1 is
  * what the library uses internally.
  *
  * Scale: one hash-shuffle on the key; no global sort. Skewed keys are
  * bounded by events-per-key, not table size.
  */
object Dedup {

  /** Keep the newest row per key, ordering DESC by `ordering` columns
    * (last column must be a unique tie-break for determinism). */
  def latestByKey(df: DataFrame, keys: Seq[String],
                  ordering: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering.map(c => col(c).desc): _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** W2 variant — reference's sort-then-dropDuplicates. Fragile by
    * construction (documented, not used internally). */
  def sortDropDuplicates(df: DataFrame, keys: Seq[String],
                         ordering: Seq[String]): DataFrame =
    df.orderBy(ordering.map(c => col(c).desc): _*).dropDuplicates(keys)
}
