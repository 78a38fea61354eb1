package graft.streaming

import graft.ext.{IvfPqIndex, PqIndex}
import graft.pipeline.Snapshot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** ST9 — streaming ANN-index maintenance: the CDC loop for an
  * embeddings corpus. Each micro-batch of vectors appends to the
  * corpus snapshot as a fast-append MOR sidecar and the persisted PQ
  * index refreshes from the corpus's COMMIT WINDOW
  * ([[graft.ext.IndexDelta]]) — the refresh reads exactly the
  * appended sidecar rows, never the corpus: at 100 TB the index is
  * maintained by the stream that feeds the corpus, not by nightly
  * rebuilds.
  *
  * Idempotence under at-least-once replay is layered:
  *  - **replay of a committed batch** (crash between the corpus
  *    commit and the checkpoint advance) is recognized O(1): the
  *    corpus commit carries the micro-batch id in its operation
  *    marker, so a redelivered batch whose id matches the newest
  *    commit skips the append without reading anything.
  *  - **source overlap** (the stream re-delivering vec_ids the corpus
  *    already holds in OLDER commits) is exact-deduped by an id
  *    anti-join with the SMALL batch on the probe side against the
  *    column-pruned corpus id column — the documented cost of exact
  *    global dedup; id-disciplined sources can drop it by keying
  *    upstream.
  *  - [[PqIndex.refresh]] runs UNCONDITIONALLY on every non-bootstrap
  *    batch (it is a version-checked O(delta)/no-op), so a crash
  *    between the corpus commit and the index refresh heals on the
  *    replay instead of leaving the index stale until new data
  *    arrives.
  * The first batch bootstraps corpus AND index (the codebook trains
  * on it; later batches extend codes under that book — [[PqIndex]]'s
  * standard no-retrain contract, rebuild to retrain). */
object StreamingIndex {

  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** The identity a batch-id sequence is RELATIVE to — the checkpoint
    * (Delta keys idempotent writes by (appId, version) for the same
    * reason). A stream restarted on a FRESH checkpoint restarts its
    * batch ids at 0; an unscoped marker would mistake its first batch
    * for a replay of the old stream's batch 0 and silently drop every
    * new vector in it. */
  private[streaming] def streamId(checkpointDir: String): String =
    java.util.UUID.nameUUIDFromBytes(
      java.nio.file.Paths.get(checkpointDir).toAbsolutePath
        .normalize.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

  /** Operation marker a streamed corpus commit carries — the O(1)
    * replay detector, scoped to the CHECKPOINT identity. */
  private[streaming] def batchOp(checkpointDir: String,
                                 batchId: Long): String =
    s"stream-append-${streamId(checkpointDir)}-b$batchId"

  def startPq(spark: SparkSession, vectorsDir: String,
              corpusDir: String, indexDir: String, checkpointDir: String,
              m: Int, dsub: Int, ksub: Int,
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startMaintained(spark, vectorsDir, corpusDir, checkpointDir, trigger,
      indexExists = PqIndex.meta(indexDir).isDefined,
      bootstrap = PqIndex.build(spark, corpusDir, indexDir, m, dsub, ksub),
      refresh = PqIndex.refresh(spark, corpusDir, indexDir))

  /** ST9's IVFADC arm: the same per-batch loop maintaining a
    * persisted [[IvfPqIndex]] — the micro-batch cell-assigns (+
    * residualizes) and PQ-encodes through `IvfPqIndex.refresh`'s
    * commit-window delta, landing as a fast-append sidecar on the
    * cell-clustered codes table. A streamed index is
    * search-identical to one batch-built on the bootstrap wave and
    * refreshed with the rest (StreamingIndexSpec pins it). */
  def startIvfPq(spark: SparkSession, vectorsDir: String,
                 corpusDir: String, indexDir: String,
                 checkpointDir: String, nlist: Int,
                 m: Int, dsub: Int, ksub: Int,
                 trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    startMaintained(spark, vectorsDir, corpusDir, checkpointDir, trigger,
      indexExists = IvfPqIndex.meta(indexDir).isDefined,
      bootstrap = IvfPqIndex.build(spark, corpusDir, indexDir, nlist,
        m, dsub, ksub),
      refresh = IvfPqIndex.refresh(spark, corpusDir, indexDir))

  /** The shared per-batch maintenance loop: bootstrap on the first
    * batch, then batch-id-marked fast-appends + an unconditional
    * version-checked index refresh. `indexExists` re-evaluates per
    * batch: a crash between the bootstrap corpus write and the index
    * build would otherwise wedge every replay on a meta-less refresh —
    * instead the next batch re-runs the bootstrap build against the
    * corpus as it stands. */
  private def startMaintained(spark: SparkSession, vectorsDir: String,
                              corpusDir: String, checkpointDir: String,
                              trigger: Trigger,
                              indexExists: => Boolean,
                              bootstrap: => Long,
                              refresh: => Long): StreamingQuery = {
    spark.readStream
      .schema(vectorSchema)
      .option("maxFilesPerTrigger", 4)
      .parquet(vectorsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.localCheckpoint()
        if (!new java.io.File(corpusDir).exists) {
          Snapshot.createOrReplace(batch, corpusDir, keepVersions = 2)
          bootstrap
        } else {
          val live = Snapshot.currentVersion(corpusDir).getOrElse(0L)
          val replayed = Snapshot.operationOf(corpusDir, live)
            .contains(batchOp(checkpointDir, batchId))
          if (!replayed) {
            val fresh = batch.join(
              Snapshot.read(spark, corpusDir).select("vec_id"),
              Seq("vec_id"), "left_anti")
            if (!fresh.isEmpty)
              Snapshot.morCommit(spark, corpusDir, deletes = None,
                appends = Some(fresh),
                operation = batchOp(checkpointDir, batchId))
          }
          // unconditional: heals a crash that landed the corpus commit
          // but not the refresh (O(1) no-op when versions agree) — and
          // a crash BEFORE the index ever built re-runs the bootstrap
          if (indexExists) refresh else bootstrap
        }
        ()
      }
      .start()
  }
}
