package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 build over a CDC change stream —
  * the dimension-history materialization a CDC lakehouse keeps NEXT TO
  * the current-state silver table.
  *
  * The reference materializes only the current state (`orders_current`,
  * `/root/reference/jobs/merge_orders_silver.py:30-38`), discarding the
  * history its own bronze log carries. SCD2 is the standard way to keep
  * it queryable: one row per (key, version) with a `[valid_from,
  * valid_to)` interval, `valid_to IS NULL` marking the open (current)
  * version. A delete event closes the open interval without opening a
  * new one, so a deleted key has history but no current row — the same
  * tombstone semantics as the reference's MERGE `WHEN MATCHED AND
  * op='d' THEN DELETE`.
  *
  * Interval semantics (half-open, the Kimball convention):
  *   - every non-delete event opens a version at its own `ts`
  *   - a version's `valid_to` is the NEXT event's `ts` for that key
  *     (update or delete alike) — `lead()` over the per-key event order
  *   - as-of-T state = rows with `valid_from <= T < coalesce(valid_to, ∞)`
  *
  * Ordering contract: like the reference's LWW dedup, correctness needs
  * a total per-key order — `(tsCol, tieCols...)` with a unique final
  * tie-break (the pipeline uses the Kafka offset; a key's events live in
  * one Kafka partition, so offsets totally order them).
  *
  * Scale shape:
  *   - [[build]] is ONE key-shuffle (the `lead` window) over the event
  *     log — the same exchange the silver rebuild already pays; no join,
  *     no second pass.
  *   - [[merge]] never windows the dimension: the batch (micro-batch
  *     sized) is windowed alone, and the dimension is LEFT-joined to the
  *     batch's per-key first-event frame — batch-keyed and broadcast-able,
  *     so a 100-TB dimension table is scanned once and shuffled never.
  *     Same batch-vs-table asymmetry as [[Merge.mergeCdc]]'s design.
  */
object Scd2 {

  /** Full-history SCD2 dimension from a parsed change stream.
    *
    * @param changes  parsed events: `valueCols` + `op` + `tsCol` + `tieCols`
    * @param keys     natural-key column(s)
    * @param tsCol    event-time column (epoch ms in the pipeline)
    * @param tieCols  order tie-breaks after `tsCol` (last must be unique)
    * @param valueCols dimension attribute columns to carry (must include
    *                  the keys)
    * @return `valueCols` + (`valid_from_ms`, `valid_to_ms` nullable,
    *         `is_current`), one row per version
    */
  def build(changes: DataFrame, keys: Seq[String], tsCol: String,
            tieCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tieCols).map(c => col(c).asc): _*)
    changes
      .withColumn("valid_to_ms", lead(col(tsCol), 1).over(w))
      .filter(col("op") =!= "d")
      .select(valueCols.map(col) ++ Seq(
        col(tsCol).as("valid_from_ms"),
        col("valid_to_ms"),
        col("valid_to_ms").isNull.as("is_current")): _*)
  }

  /** Apply one change micro-batch to an existing SCD2 dimension.
    *
    * A key's open version is closed at the batch's FIRST event ts for
    * that key; the batch's own versions are appended via [[build]] on
    * the batch alone. Batches must arrive in event-time order per key
    * (the Kafka-offset contract the whole pipeline rests on); like the
    * reference's MERGE there is no late-event guard across batches.
    *
    * Equivalence (spec-pinned): folding any in-order batch split of the
    * log through `merge` ≡ one-shot [[build]] of the whole log.
    */
  def merge(dim: DataFrame, batchChanges: DataFrame, keys: Seq[String],
            tsCol: String, tieCols: Seq[String],
            valueCols: Seq[String]): DataFrame = {
    val firstTs = batchChanges.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("_batch_first_ts"))
    val closed = dim.join(broadcast(firstTs), keys, "left")
      .withColumn("valid_to_ms",
        when(col("is_current") && col("_batch_first_ts").isNotNull,
          col("_batch_first_ts")).otherwise(col("valid_to_ms")))
      .withColumn("is_current",
        col("is_current") && col("_batch_first_ts").isNull)
      .drop("_batch_first_ts")
    closed.unionByName(build(batchChanges, keys, tsCol, tieCols, valueCols))
  }

  /** Temporal join (Flink's temporal-table join / SQL:2011
    * `FOR SYSTEM_TIME AS OF`): enrich each probe row with the
    * dimension VERSION valid at the probe's own event time —
    * `valid_from <= probe_ts < coalesce(valid_to, ∞)` — so a fact
    * stream joins the dimension as it WAS, not as it is (the lookup
    * every event-time-correct enrichment needs; a plain join against
    * current state silently rewrites history).
    *
    * Plan shape: an equi-join on the key with the interval predicate
    * as join condition — per-key version counts are bounded (a key's
    * change rate), so this is one key-shuffle with tiny per-key
    * fan-out, never a range-join blowup. Probes with no valid version
    * at their ts (before the insert, after a delete) keep NULL
    * dimension columns (left join — the fact row is never dropped).
    *
    * @param probes  fact rows: `keys` + `probeTsCol` + payload
    * @param dim     [[build]]/[[merge]] output
    * @param probeTsCol probe event-time column (same unit as the
    *        dimension's interval bounds) */
  def temporalJoin(probes: DataFrame, dim: DataFrame, keys: Seq[String],
                   probeTsCol: String): DataFrame = {
    val d = dim.select(dim.columns.map(c => col(c).as(s"_dim_$c")): _*)
    val cond = keys.map(k => col(k) === col(s"_dim_$k")).reduce(_ && _) &&
      col(s"_dim_valid_from_ms") <= col(probeTsCol) &&
      (col("_dim_valid_to_ms").isNull ||
        col("_dim_valid_to_ms") > col(probeTsCol))
    probes.join(d, cond, "left")
      .drop(keys.map(k => s"_dim_$k"): _*)
  }

  /** [[merge]] committed MERGE-ON-READ to a snapshot-backed dimension:
    * the open versions of touched keys are equality-deleted and
    * re-appended closed, the batch's own versions append — ONE sidecar
    * commit of O(touched keys + batch) rows, the base dimension files
    * byte-untouched. THIS is the flat-cost arm at 100 TB: a [[merge]]
    * + copy-on-write snapshot rewrites the whole dimension every
    * micro-batch (SoakScd2 measures both), while this pays the
    * predicate scan plus a batch-sized delta, and
    * `CALL rewrite_position_delete_files` clears the read tax on the
    * usual maintenance cadence.
    *
    * Result contract (spec-pinned): reading the dimension back after
    * `mergeMor` equals [[merge]]'s frame. @return the new version */
  def mergeMor(spark: org.apache.spark.sql.SparkSession, dimDir: String,
               batchChanges: DataFrame, keys: Seq[String], tsCol: String,
               tieCols: Seq[String], valueCols: Seq[String]): Long = {
    import graft.pipeline.Snapshot
    val dim = Snapshot.read(spark, dimDir)
    val firstTs = batchChanges.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("_batch_first_ts"))
    // open versions of touched keys — batch-keyed, materialized once
    // (feeds both the delete and the closed re-append)
    val open = dim.filter(col("is_current"))
      .join(broadcast(firstTs), keys, "inner")
      .localCheckpoint()
    val closed = open
      .withColumn("valid_to_ms", col("_batch_first_ts"))
      .withColumn("is_current", lit(false))
      .drop("_batch_first_ts")
    Snapshot.morCommit(spark, dimDir,
      deletes = Some(open.drop("_batch_first_ts")),
      appends = Some(closed.unionByName(
        build(batchChanges, keys, tsCol, tieCols, valueCols))),
      operation = "merge")
  }
}
