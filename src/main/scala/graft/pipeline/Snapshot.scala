package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Snapshot-replace sink: the reference's `writeTo(t).createOrReplace()`
  * (`/root/reference/jobs/build_orders_silver.py:95`,
  * `build_privacy_table.py:37`) re-expressed over plain parquet.
  *
  * `mode("overwrite")` on the live path is not atomic (readers can see a
  * half-deleted directory); instead: write to `<path>.tmp-<epoch>`, then
  * atomically swap directories — the same commit shape as an Iceberg
  * snapshot commit, minus the catalog. Also the append sink (bronze,
  * `ingest_orders_raw.py:53`).
  */
object Snapshot {

  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Atomic create-or-replace of a parquet table directory. */
  def createOrReplace(df: DataFrame, path: String): Unit = {
    val live = Paths.get(path)
    val tmp = Paths.get(path + ".tmp-swap")
    val old = Paths.get(path + ".old-swap")
    deleteRecursively(tmp); deleteRecursively(old)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (Files.exists(live))
      Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Hive-style partitioned variant: one subdirectory per value of
    * `partitionCols`, so a filter on those columns prunes whole
    * directories at planning time (PartitionFilters on the scan,
    * asserted in SnapshotSpec) — the layout a 100-TB event table uses
    * for its date/hour columns. Same atomic directory swap. */
  def createOrReplacePartitioned(df: DataFrame, path: String,
                                 partitionCols: Seq[String]): Unit = {
    val live = Paths.get(path)
    val tmp = Paths.get(path + ".tmp-swap")
    val old = Paths.get(path + ".old-swap")
    deleteRecursively(tmp); deleteRecursively(old)
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(tmp.toString)
    if (Files.exists(live))
      Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
