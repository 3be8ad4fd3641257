package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-shaped transforms. The reference is pure batch (SURVEY.md
  * §2.11) so streaming here is additive surface: the same windowed
  * aggregation works over a batch DataFrame and a readStream source —
  * asserted equivalent in ScalaTest via a memory-sink run.
  */
object StreamOps {

  /** Hourly tumbling-window aggregate per event type — usable both in
    * batch (q_events_hourly) and as a Structured Streaming query (with
    * a watermark added by the caller for append mode).
    *
    * The value sum is emitted as BIGINT micro-units: a decimal SUM's
    * result precision is engine-specific (Spark decimal(28,6) vs DuckDB
    * decimal(38,6) — physical-type hash mismatch even when every value
    * is identical), while floor-to-micros is one exact integer per row
    * in both engines. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000L).cast("long")).as("sum_value_micros"),
        min(col("user_id")).as("min_user"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
        col("event_type"), col("n"), col("sum_value_micros"), col("min_user"))

  /** Watermarked variant for append-mode streaming sinks. */
  def hourlyAggStreaming(events: DataFrame): DataFrame =
    hourlyAgg(events.withWatermark("ts", "2 hours"))
}
