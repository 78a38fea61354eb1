package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One per-trigger quantile estimate (the streaming-stats output row). */
case class QuantileEstimate(group: String, quantile: String,
                            est_value: Double, n: Long)

/** ST8 — streaming quantile sketch: the live-dashboard twin of the
  * batch histogram sketch ([[graft.ext.Sketches.histQuantiles]]). Each
  * micro-batch folds its values into a per-group equi-width counter
  * array held in the state store; every trigger emits the group's
  * CURRENT p50/p90/… estimates over everything seen so far (Update
  * mode) — running percentiles without retaining a single raw value.
  *
  * State is `bins` longs per group — bounded at any stream length, the
  * same mergeable-counter argument as the batch sketch (and unlike a
  * sorted-values approach, whose state grows with volume). Bin bounds
  * `[lo, hi)` are FIXED parameters here rather than derived min/max:
  * a stream can't rescale its bins without re-binning history, so the
  * deployment passes the expected range and out-of-range values clamp
  * to the edge bins (the standard fixed-range histogram contract;
  * widen `bins` to buy back resolution). With `[lo, hi]` set to the
  * data's true min/max, the final-trigger estimates are IDENTICAL to
  * the batch sketch's — StreamingStatsSpec proves that equivalence
  * across micro-batches.
  */
object StreamingStats {

  /** @param events batch or streaming frame
    * @param qs (label, q) pairs, e.g. ("p50", 0.5)
    * @return per-trigger (group, quantile, est_value, n) estimates */
  def quantileStream(events: DataFrame, groupCol: String,
                     valueCol: String, lo: Double, hi: Double, bins: Int,
                     qs: Seq[(String, Double)]): Dataset[QuantileEstimate] = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(qs.nonEmpty, "qs must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr(s"CAST($groupCol AS STRING) AS g",
        s"CAST($valueCol AS DOUBLE) AS v")
      .filter("v IS NOT NULL")
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update(lo, hi, bins, qs))
  }

  private def update(lo: Double, hi: Double, bins: Int,
                     qs: Seq[(String, Double)])(
      g: String, rows: Iterator[(String, Double)],
      state: GroupState[Array[Long]]): Iterator[QuantileEstimate] = {
    val counts = state.getOption.getOrElse(Array.fill(bins)(0L))
    val width = (hi - lo) / bins
    rows.foreach { case (_, v) =>
      val raw = math.floor((v - lo) / width)
      val b = math.min((bins - 1).toDouble, math.max(0.0, raw)).toInt
      counts(b) += 1L
    }
    state.update(counts)
    val n = counts.sum
    qs.iterator.map { case (label, q) =>
      val target = math.ceil(n * q)
      var cum = 0L
      var qb = bins - 1
      var found = false
      var i = 0
      while (i < bins && !found) {
        cum += counts(i)
        if (cum >= target) { qb = i; found = true }
        i += 1
      }
      QuantileEstimate(g, label, lo + qb * width, n)
    }
  }
}
