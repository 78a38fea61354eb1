package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables — the storage-level half of the 100-TB join
  * strategy. A fact table bucketed on its join key is pre-shuffled ON
  * DISK: every join or aggregation on that key reads co-located buckets
  * and Spark's EnsureRequirements inserts NO exchange (asserted in
  * BucketedJoinSpec). At cluster scale this is how the silver snapshot
  * and its staging batches would be laid out so the nightly MERGE join
  * never shuffles the big side.
  *
  * Pair with [[Snapshot]]: Snapshot swaps plain parquet directories for
  * table-replace semantics; this writes through the session catalog
  * (`saveAsTable`) because bucket metadata lives in the catalog, not in
  * the files.
  */
object Bucketed {

  /** Write `df` as a bucketed (and optionally sorted) managed parquet
    * table, replacing any previous version. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
