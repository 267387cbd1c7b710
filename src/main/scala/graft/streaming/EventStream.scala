package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-time aggregation — the incremental form of the
  * engine's frequency aggregations (the cross-page boilerplate count,
  * q_word_freq/q_running_head's shape) over an unbounded stream.
  *
  * Scale shape: partial aggregation per micro-batch feeds the state
  * store keyed by (window, key); the watermark bounds state (windows
  * older than it finalize, emit once in Append mode, and are evicted),
  * so state size is O(active windows x keys), independent of stream
  * length — the property that matters at 10^12 events.
  */
object EventStream {

  /** Tumbling-window counts + value sums per key column. `ts` must be a
    * timestamp column; events later than the watermark are dropped. */
  def windowedCounts(events: DataFrame, keyCol: String = "event_type",
      windowDur: String = "10 minutes", watermark: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(keyCol), col("n"), col("sum_value"))

  /** The batch oracle for [[windowedCounts]]: same plan over a bounded
    * table (no watermark — batch sees everything). */
  def windowedCountsBatch(events: DataFrame, keyCol: String = "event_type",
      windowDur: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(keyCol), col("n"), col("sum_value"))
}
