package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Bounded drains of the streaming operators for the BENCH surface:
  * replay a batch events frame through the real Structured Streaming
  * path (MemoryStream → watermark → state store → memory sink) in
  * event-time-ordered chunks, flush with one far-future event so every
  * pending state emits, and return the drained sink as a DataFrame.
  *
  * Purpose: the streaming forms otherwise run only inside specs, so a
  * state-store regression (state that stops pruning, a watermark bar
  * that stops emitting) would never move a benched number. These
  * drains give the state-store path a timed, rows-checkable entry.
  * Bench-only contract: the feed COLLECTS the events frame to the
  * driver — that is the MemoryStream harness's requirement (same as
  * the specs), not a library pattern; the library operators themselves
  * ([[Events.sessionizeWithState]], [[Events.windowAggStream]]) stay
  * fully distributed, and the collected frame is bounded by the graded
  * events table (~100k rows at sf0.1). Non-oracle: DuckDB has no
  * streaming semantics to compare against; the batch equivalences are
  * pinned in StreamingSpec, and the drained row content here is
  * deterministic (event-time-ordered feed, fixed chunking).
  */
object StreamDrain {

  private val seq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Empty frame in [[Events.windowAggStream]]'s output shape — the
    * empty-input escape (an empty events slice must drain to an empty
    * result, not crash on `rows.last`). */
  private def windowAggDrainedSchema(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val win = StructType(Seq(
      StructField("start", TimestampType), StructField("end", TimestampType)))
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("window", win),
        StructField("event_type", StringType),
        StructField("n", LongType, nullable = false),
        StructField("total_value", DoubleType))))
  }

  /** Drain [[Events.sessionizeWithState]] (flatMapGroupsWithState — the
    * custom-state path) over the whole events frame. The flush event's
    * own open session is excluded from the returned frame. */
  def sessionizeDrained(events: DataFrame, gapMs: Long = 1800000L,
      chunks: Int = 8): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Events.toSessionEvents(events).orderBy("ts").collect()
    if (rows.isEmpty)
      return s.emptyDataset[ClosedSession].toDF()
    val mem = MemoryStream[SessionEvent]
    val name = s"graft_drain_sess_${seq.incrementAndGet()}"
    val q = Events.sessionizeWithState(
        mem.toDS().withWatermark("ts", "1 hour"), gapMs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val step = math.max(1, math.ceil(rows.length / chunks.toDouble).toInt)
      rows.grouped(step).foreach { g =>
        mem.addData(g.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // far-future flush: the watermark must pass last + gap for every
      // open session's event-time timeout to fire
      val flushTs = new java.sql.Timestamp(
        rows.last.ts.getTime + 1000L * 24 * 3600 * 1000)
      mem.addData(SessionEvent(-1L, flushTs, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).filter(col("user_id") =!= -1L)
  }

  /** Drain [[Events.windowAggStream]] (watermarked declarative
    * aggregation — the built-in state-store path). Windows touched by
    * the flush event are excluded. */
  def windowAggDrained(events: DataFrame, width: String = "5 minutes",
      chunks: Int = 8): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = Events.withEventTime(events)
      .select(col("event_id").cast("long"), col("ts"),
        col("event_type").cast("string"), col("value").cast("double"))
      .orderBy("ts")
      .as[(Long, java.sql.Timestamp, String, Double)].collect()
    if (rows.isEmpty)
      return windowAggDrainedSchema(s)
    val flushTs = new java.sql.Timestamp(
      rows.last._2.getTime + 1000L * 24 * 3600 * 1000)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val name = s"graft_drain_win_${seq.incrementAndGet()}"
    // windowAggStream attaches its own watermark through withEventTime
    val q = Events.windowAggStream(
        mem.toDF().toDF("event_id", "ts", "event_type", "value"), width)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      val step = math.max(1, math.ceil(rows.length / chunks.toDouble).toInt)
      rows.grouped(step).foreach { g =>
        mem.addData(g.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      mem.addData((-1L, flushTs, "__flush", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).filter(col("event_type") =!= "__flush")
  }
}
