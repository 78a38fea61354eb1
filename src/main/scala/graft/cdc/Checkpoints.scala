package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manual offset checkpointing — the reference's "exactly-once-ish"
  * incremental mechanism (`/root/reference/jobs/merge_orders_silver.py:41-66,149-165`).
  *
  * Table: `monitoring.cdc_checkpoints(pipeline string, last_offset bigint,
  * updated_at timestamp)`. Read = filter + global `max(last_offset)`
  * (an action returning a driver-side scalar spliced into the next scan's
  * predicate — that predicate is what Iceberg/parquet prunes files with).
  * Advance = 1-row MERGE upsert.
  *
  * Scale: the checkpoint table is tiny (one row per pipeline); the
  * `offset > lo` bronze filter is the piece that matters — it pushes to
  * the parquet scan so an incremental run never rereads history.
  */
object Checkpoints {

  val schema: StructType = StructType(Seq(
    StructField("pipeline", StringType),
    StructField("last_offset", LongType),
    StructField("updated_at", TimestampType)
  ))

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** `merge_orders_silver.py:50-55`: max offset for a pipeline, 0 if none. */
  def lastOffset(checkpoints: DataFrame, pipeline: String): Long = {
    val row = checkpoints
      .filter(col("pipeline") === lit(pipeline))
      .agg(max(col("last_offset")))
      .collect()(0)
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** `merge_orders_silver.py:149-165`: upsert (pipeline → offset) — the
    * same MERGE shape as the silver merge, on a 1-row source. Emulated
    * with the same full-outer-join resolution. `updatedAt` is injected so
    * tests/oracles stay deterministic (reference uses current_timestamp).
    */
  def advance(checkpoints: DataFrame, pipeline: String, newOffset: Long,
              updatedAt: java.sql.Timestamp): DataFrame = {
    val spark = checkpoints.sparkSession
    import spark.implicits._
    val src = Seq((pipeline, newOffset, updatedAt))
      .toDF("pipeline", "last_offset", "updated_at")
      .withColumn("op", lit("u"))
    Merge.mergeCdc(checkpoints, src, Seq("pipeline"))
  }
}
