package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators: gap sessionization and tumbling windows, in
  * both batch (window-function) and Structured Streaming forms. Times
  * are carried as epoch-milliseconds BIGINT so results are engine- and
  * timezone-stable (parquet ns → Spark µs → ms floor == DuckDB ns → ms).
  */
object Events {

  /** Normalize `ts` to epoch-ms. The testdata parquet stores
    * TIMESTAMP(NANOS), which Spark only reads as LONG nanos (via
    * `spark.sql.legacy.parquet.nanosAsLong=true`); epoch nanos exceed
    * 2^53, so use integer `div` — double division would lose ms. */
  def withMs(events: DataFrame): DataFrame = {
    val msCol = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => expr("unix_micros(ts) div 1000")
    }
    events.withColumn("ts_ms", msCol)
  }

  /** Gap-based sessionization (batch): a new session starts when the gap
    * from the previous event of the same user exceeds `gapMs`. One
    * shuffle on user_id; the running sum stays within the partition. */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    withMs(events)
      .withColumn("prev", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("ts_ms") - col("prev") > gapMs, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Tumbling-window aggregation (batch): bucket = floor(ms / widthMs). */
  def windowAggBatch(events: DataFrame, widthMs: Long = 300000L): DataFrame =
    withMs(events)
      .groupBy(floor(col("ts_ms") / widthMs).cast("long").as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Streaming tumbling window with watermark — same aggregation as
    * [[windowAggBatch]] expressed on an unbounded stream. */
  def windowAggStream(events: DataFrame, width: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Streaming gap sessionization via session_window (Spark's native
    * state-store sessionizer — the flatMapGroupsWithState shape without
    * hand-rolled state). */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
}
