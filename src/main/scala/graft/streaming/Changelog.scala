package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A parsed CDC change event (the [[graft.pipeline.Silver.changes]]
  * row shape). Image columns are Options: a delete's image comes from
  * the before-row and may be partial. */
case class ChangeEvent(order_id: Int, user_id: Option[Int],
                       amount_eur: Option[Double], status: Option[String],
                       op: String, ts_ms: Long, offset: Long)

/** One row-level MERGE action: `action` ∈ I (insert), U (update),
  * D (delete) plus the post-image (last known image for D). */
case class MergeAction(order_id: Int, action: String, user_id: Option[Int],
                       amount_eur: Option[Double], status: Option[String],
                       ts_ms: Long, offset: Long)

/** ST2 — stateful CDC→changelog compaction with
  * `flatMapGroupsWithState`: the streaming-native form of the MERGE
  * sink (`/root/reference/jobs/merge_orders_silver.py:135-147`), where
  * Spark's state store replaces the silver table as the per-key current
  * state and the output is the stream of row-level actions MERGE would
  * have performed.
  *
  * Exact reference semantics, held per micro-batch:
  *  - within a batch, last-writer-wins on (ts_ms, offset) — the W1
  *    dedup (`merge_orders_silver.py:112-118`);
  *  - the batch winner overwrites unconditionally (MERGE has no ts
  *    guard — the cross-batch late-data quirk, SURVEY §2.5, preserved);
  *  - `op='d'` on an existing key → D and state removal; on an absent
  *    key → silently nothing (MERGE only deletes MATCHED rows);
  *  - non-delete on absent key → I, on existing key → U (`NOT MATCHED
  *    AND op<>'d' → INSERT` / `MATCHED → UPDATE`) — a deleted key is
  *    revived by a later insert, exactly as MERGE would.
  *
  * Scale: state is one small row per LIVE key (removed on delete), hash
  * partitioned by key across executors — no global structure; each
  * micro-batch shuffles only its own events. The downstream gets a
  * compacted changelog (one action per key per batch) instead of the
  * raw event stream. Batch mode works too (state starts empty ⇒ pure
  * compaction: every surviving key emits I).
  */
object Changelog {

  /** Compact parsed change rows ([[graft.pipeline.Silver.changes]]
    * output, batch or streaming) into MERGE actions. */
  def fromChanges(changes: DataFrame): Dataset[MergeAction] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select("order_id", "user_id", "amount_eur", "status", "op",
        "ts_ms", "offset")
      .as[ChangeEvent]
      .groupByKey(_.order_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(apply)
  }

  /** Bronze (raw JSON envelopes) → MERGE actions. */
  def fromBronze(bronze: DataFrame): Dataset[MergeAction] =
    fromChanges(graft.pipeline.Silver.changes(bronze))

  private[streaming] def apply(key: Int, events: Iterator[ChangeEvent],
      state: GroupState[MergeAction]): Iterator[MergeAction] = {
    val staged = events.maxBy(e => (e.ts_ms, e.offset))
    if (staged.op == "d") {
      if (state.exists) {
        state.remove()
        Iterator(MergeAction(key, "D", staged.user_id, staged.amount_eur,
          staged.status, staged.ts_ms, staged.offset))
      } else Iterator.empty
    } else {
      val action = if (state.exists) "U" else "I"
      val cur = MergeAction(key, action, staged.user_id, staged.amount_eur,
        staged.status, staged.ts_ms, staged.offset)
      state.update(cur)
      Iterator(cur)
    }
  }
}
