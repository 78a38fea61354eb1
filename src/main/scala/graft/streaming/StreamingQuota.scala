package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One admitted document (the streaming-quota output row shape). */
case class QuotaAdmit(doc_id: Long, source: String, admitted_rank: Long)

/** ST4 — streaming per-source QUOTA admission: admit at most `n`
  * documents per source over the LIFE of the stream — the on-ingest
  * twin of the batch X11c quota cap ("≤N docs per domain"), for the
  * case where the corpus arrives as a stream and over-represented
  * sources must be cut off as they arrive rather than in a nightly
  * batch.
  *
  * `flatMapGroupsWithState` keyed by source; state is ONE long counter
  * per source — bounded by the number of distinct sources at any
  * stream length (vs. the unbounded per-doc state a dropDuplicates
  * approach would keep). Within a micro-batch, admission order is the
  * deterministic (doc_id) order, so replaying the same batched input
  * admits the same set.
  *
  * Scale: state is hash-partitioned by source across executors; each
  * micro-batch shuffles only its own rows, on the source key. A hot
  * source's counter saturates at `n` and every later row short-circuits
  * to a drop — the state store never grows with volume. One residual
  * cost: a saturated source's batch slice still co-locates on its state
  * task before being dropped (inherent to keyed state); a cluster
  * deployment with mega-hot sources prefilters each batch with a
  * broadcast already-saturated-source list (collected from the previous
  * batch's state) so those rows die scan-side.
  */
object StreamingQuota {

  /** @param docs batch or streaming frame with `doc_id` and `sourceCol`
    * @param n lifetime per-source admission cap
    * @return admitted rows only, with their per-source admission rank */
  def admitStream(docs: DataFrame, sourceCol: String, n: Int): Dataset[QuotaAdmit] = {
    require(n > 0, s"quota must be positive, got $n")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .selectExpr("doc_id", s"$sourceCol AS source")
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(admit(n))
  }

  private def admit(n: Int)(source: String,
      rows: Iterator[(Long, String)],
      state: GroupState[Long]): Iterator[QuotaAdmit] = {
    var taken = state.getOption.getOrElse(0L)
    if (taken >= n) { Iterator.empty }
    else {
      // deterministic in-batch order; the batch is bounded, the sort is
      // per (source, micro-batch)
      val admitted = rows.map(_._1).toArray.sorted.iterator
        .takeWhile(_ => taken < n)
        .map { id => taken += 1; QuotaAdmit(id, source, taken) }
        .toVector
      state.update(taken)
      admitted.iterator
    }
  }
}
