package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST6/ST7 — the two streaming join shapes.
  *
  * ST6 stream-static: every micro-batch equi-joins the static
  * dimension; the dim is broadcast (it is re-resolved per batch, so a
  * dim table updated between batches is picked up — Spark's documented
  * stream-static semantics). No watermark and no join state: the
  * static side is not a stream, so nothing accumulates.
  *
  * ST7 stream-stream interval join — the streaming twin of the batch
  * X12 `RangeJoin.intervalJoin` (same attribution contract, proven
  * equivalent on the same input in StreamingJoinsSpec): purchases
  * attribute to a preceding click by the same user within the window.
  * BOTH sides carry a watermark and the join condition bounds event
  * time in both directions, so Spark's state store can evict a row as
  * soon as no future match is possible — bounded state at any stream
  * length. Omitting either watermark or either time bound makes state
  * grow forever; this operator hard-codes the bounded shape.
  *
  * Scale: both joins hash-exchange on the user key only (plus the
  * broadcast for ST6); state is partitioned by key across executors.
  */
object StreamingJoins {

  /** ST6 — enrich a stream with a static dimension by broadcast.
    * @return stream columns + dim columns (left outer: unmatched
    *         stream rows survive with nulls) */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")

  /** ST7 — watermarked stream-stream interval join: each purchase
    * matches clicks of the same user within [click_ts, click_ts +
    * windowSec]. Column contract: clicks (user_id, click_id,
    * click_ts TIMESTAMP), purchases (p_user_id, purchase_id,
    * p_ts TIMESTAMP).
    * @return one row per (click, purchase) attribution pair */
  def attributeStream(clicks: DataFrame, purchases: DataFrame,
                      windowSec: Int = 3600,
                      watermark: String = "1 hour"): DataFrame =
    clicks.withWatermark("click_ts", watermark)
      .join(purchases.withWatermark("p_ts", watermark),
        expr(s"""
          user_id = p_user_id AND
          p_ts >= click_ts AND
          p_ts <= click_ts + INTERVAL $windowSec SECONDS"""))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("p_ts"))
}
