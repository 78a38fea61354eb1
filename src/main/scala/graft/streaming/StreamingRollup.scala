package graft.streaming

import graft.pipeline.{Rollup, Snapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** ST10 — streaming gold-layer maintenance: the [[StreamingIndex]]
  * loop pointed at an aggregate instead of an ANN index. Each
  * micro-batch of fact rows fast-appends to the fact snapshot and
  * [[Rollup.refresh]] folds exactly that commit window into the
  * maintained `GROUP BY → (count, sums)` — at 100 TB the gold table
  * is maintained by the stream that feeds the facts, not by the
  * nightly recompute the reference runs.
  *
  * Exactly-once under at-least-once replay is layered:
  *  - the fact commit carries the micro-batch id in its operation
  *    marker, scoped to the CHECKPOINT identity
  *    ([[StreamingIndex.batchOp]] — a fresh checkpoint's batch 0 is
  *    never mistaken for the old stream's), so a redelivered batch
  *    skips the append O(1);
  *  - [[Rollup.refresh]] runs UNCONDITIONALLY per batch (it is
  *    version-checked and marker-idempotent), healing a crash between
  *    the fact commit and the refresh;
  *  - fact rows carry no unique key, so there is NO cross-batch
  *    content dedup — the marker is the idempotence boundary
  *    (key-disciplined sources can dedup upstream), the same contract
  *    Delta's (appId, version) transactional writes give.
  * The first batch bootstraps fact table AND rollup. */
object StreamingRollup {

  def start(spark: SparkSession, factsDir: String, schema: StructType,
            tableDir: String, rollupDir: String, checkpointDir: String,
            groupCols: Seq[String], measures: Seq[String],
            maxFilesPerTrigger: Int = 4,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(factsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.localCheckpoint()
        if (!new java.io.File(tableDir).exists) {
          Snapshot.createOrReplace(batch, tableDir, keepVersions = 2)
          Rollup.build(spark, tableDir, rollupDir, groupCols, measures)
        } else {
          val live = Snapshot.currentVersion(tableDir).getOrElse(0L)
          val replayed = Snapshot.operationOf(tableDir, live)
            .contains(StreamingIndex.batchOp(checkpointDir, batchId))
          if (!replayed && !batch.isEmpty)
            Snapshot.morCommit(spark, tableDir, deletes = None,
              appends = Some(batch),
              operation = StreamingIndex.batchOp(checkpointDir, batchId))
          // unconditional: marker-idempotent, version-checked no-op
          // when current — heals a crash between commit and refresh,
          // and a crash before the rollup ever built re-bootstraps
          if (Rollup.meta(rollupDir).isDefined)
            Rollup.refresh(spark, tableDir, rollupDir)
          else
            Rollup.build(spark, tableDir, rollupDir, groupCols, measures)
        }
        ()
      }
      .start()
}
