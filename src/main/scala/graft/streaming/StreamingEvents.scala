package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST5 — watermarked tumbling-window aggregation over the analytics
  * event stream (the streaming twin of the batch `q_events_window`
  * query in `graft.queries.RelationalQueries`).
  *
  * Append-mode semantics: a window's row is emitted exactly once,
  * when the watermark passes the window end — downstream sinks see
  * finalized counts only, never retractions. Rows later than the
  * watermark are dropped by Spark's state store (proven in
  * StreamingEventsSpec), which is what bounds state: at any stream
  * length the store holds only the windows inside the watermark
  * horizon, each a single count per (window, event_type).
  *
  * Scale shape: the groupBy is a hash exchange on (window,
  * event_type) with partial aggregation map-side — a hot event type
  * collapses per task before the shuffle, and state is partitioned
  * across executors by the same key.
  */
object StreamingEvents {

  /** @param events streaming (or batch) frame with `ts` TIMESTAMP and
    *               `event_type` columns
    * @return (window_start, event_type, n_events), append-mode ready */
  def windowedEventCounts(events: DataFrame,
                          watermark: String = "10 minutes",
                          window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))
}
