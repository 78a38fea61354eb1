package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X1's exact dedup as a streaming operator (ST3): watermarked
  * `dropDuplicatesWithinWatermark` on the content hash. The state store
  * keeps one hash per first-seen document and EVICTS it once the
  * watermark passes — bounded state at any stream length, where a plain
  * streaming `dropDuplicates` grows its state forever. The right shape
  * for continuous ingestion dedup at 100 TB: within-horizon duplicates
  * are exact-dropped, archival dedup across horizons is the batch X1
  * pass ([[graft.ext.DedupOps.exactDedup]]).
  */
object StreamingDedup {

  /** @param docs streaming frame with an event-time and a text column
    * @return first-seen rows only (per content hash, within watermark)
    *
    * The hash is [[graft.ext.TextOps.fingerprint]] — the SAME
    * trim+lowercase normalization the batch X1 pass uses, so the
    * streaming and archival dedup horizons agree on what counts as a
    * duplicate for case/whitespace variants. */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash",
        graft.ext.TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
