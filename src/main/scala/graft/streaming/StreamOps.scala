package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counters — HBase `Increment` at pipeline scale, re-expressed
  * as Structured Streaming windowed aggregation.
  *
  * The SAME transform serves both paths: applied to a batch DataFrame it
  * is the oracle-checked query; applied to a readStream DataFrame (with
  * the event-time watermark) it is the incremental view Structured
  * Streaming maintains. StreamingSpec drives the streaming path through
  * a MemoryStream and asserts it converges to the batch answer —
  * which is exactly the guarantee that matters when the counter table
  * is maintained continuously at 100 TB/day ingest.
  */
object StreamOps {

  /** Per-(day window, event_type) counters. */
  def windowedCounters(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_v"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_v"))

  /** Streaming form: 1-day tumbling windows with a 1-day watermark —
    * state for a window is dropped once the watermark passes, so state
    * size is bounded by (windows in flight × event types), not by the
    * stream length. */
  def streamingCounters(events: DataFrame): DataFrame =
    windowedCounters(events.withWatermark("ts", "1 day"))
}
