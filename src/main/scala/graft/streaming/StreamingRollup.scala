package graft.streaming

import graft.pipeline.Rollup
import org.apache.spark.sql.SparkSession
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
  * Exactly-once under at-least-once replay is
  * [[StreamingIndex.applyBatch]]'s shared protocol — the fact commit
  * (INCLUDING the bootstrap) carries the checkpoint-scoped micro-batch
  * marker, so a redelivered batch skips the append O(1), and
  * [[Rollup.refresh]] runs unconditionally per batch
  * (version-checked, marker-idempotent), healing a crash between the
  * fact commit and the refresh. Fact rows carry no unique key, so
  * there is NO cross-batch content dedup (`dedupKey = None`) — the
  * marker is the idempotence boundary (key-disciplined sources can
  * dedup upstream), the same contract Delta's (appId, version)
  * transactional writes give. The first batch bootstraps fact table
  * AND rollup. */
object StreamingRollup {

  /** `dims` makes it a streamed STAR rollup (the fact stream joins
    * pinned snapshot dimensions; a dim that moves between batches is
    * priced incrementally by [[Rollup.refresh]]'s dim-window terms)
    * and `exprCols` adds derived keys/measures — both ride the meta,
    * so only the bootstrap needs them. */
  def start(spark: SparkSession, factsDir: String, schema: StructType,
            tableDir: String, rollupDir: String, checkpointDir: String,
            groupCols: Seq[String], measures: Seq[String],
            maxFilesPerTrigger: Int = 4,
            trigger: Trigger = Trigger.AvailableNow(),
            dims: Seq[Rollup.DimSpec] = Nil,
            exprCols: Seq[(String, String)] = Nil): StreamingQuery =
    StreamingIndex.startMaintained(spark, factsDir, schema, tableDir,
      checkpointDir, trigger, maxFilesPerTrigger, dedupKey = None,
      artifactExists = Rollup.meta(rollupDir).isDefined,
      bootstrap =
        Rollup.build(spark, tableDir, rollupDir, groupCols, measures,
          dims = dims, exprCols = exprCols),
      refresh =
        try Rollup.refresh(spark, tableDir, rollupDir)
        catch {
          // a window the incremental maintenance cannot price exactly
          // (an out-of-band equality delete on fact or dim, a
          // copy-on-write rebase, a pruned as-of version) would
          // otherwise terminate the stream — and every restart
          // replays the batch and raises again, wedging it
          // permanently. Fall back to the full recompute, exactly as
          // REFRESH MATERIALIZED VIEW does; the rebuild re-pins dims
          // at their live versions and the stream resumes O(delta).
          // Dispatch on the TYPE every window-pricing path throws —
          // a reworded message must neither re-wedge the stream nor
          // let an unrelated IllegalStateException trigger a rebuild.
          case e: graft.pipeline.UnpriceableWindowException =>
            val m = Rollup.meta(rollupDir).getOrElse(throw e)
            Rollup.build(spark, tableDir, rollupDir, m.groupCols,
              m.measures, m.minMax, m.ndv, m.ndvK, m.filter, m.dims,
              m.exprCols)
        })
}
