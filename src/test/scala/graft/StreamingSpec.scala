package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Events

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private lazy val batchDf = Seq(
    (1L, 1L, ts(0), "click", 1.0),
    (1L, 2L, ts(5), "click", 2.0),
    (1L, 3L, ts(60), "view", 3.0),  // > 30min gap → new session
    (2L, 4L, ts(0), "view", 4.0)
  ).toDF("user_id", "event_id", "ts", "event_type", "value")

  test("sessionizeBatch: gap splits sessions, aggregates per session") {
    val out = Events.sessionizeBatch(batchDf)
      .select("user_id", "session_seq", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 3.0), (2L, 1L, 1L, 4.0)))
  }

  test("windowAggBatch: tumbling buckets") {
    val out = Events.windowAggBatch(batchDf)
      .select("bucket", "event_type", "n").as[(Long, String, Long)].collect()
    assert(out.map(_._3).sum == 4)
  }

  test("windowAggStream over MemoryStream matches the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("user_id", "event_id", "ts", "event_type", "value")
    val q = Events.windowAggStream(sdf, width = "5 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("winagg")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, 1L, ts(0), "click", 1.0), (1L, 2L, ts(5), "click", 2.0),
      (1L, 3L, ts(60), "view", 3.0), (2L, 4L, ts(0), "view", 4.0))
    q.processAllAvailable()
    // advance watermark far enough to close all windows
    mem.addData((9L, 9L, ts(1000), "view", 0.0))
    q.processAllAvailable()
    val got = spark.table("winagg")
      .select(col("event_type"), col("n"), col("total_value"))
      .as[(String, Long, Double)].collect().toSet
    q.stop()
    assert(got.contains(("click", 1L, 1.0)))  // minute 0 window
    assert(got.contains(("click", 1L, 2.0)))  // minute 5 window
    assert(got.contains(("view", 1L, 4.0)))
  }

  test("sessionizeStream: session_window groups events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("user_id", "event_id", "ts", "event_type", "value")
    val q = Events.sessionizeStream(sdf, gap = "30 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    mem.addData((1L, 1L, ts(0), "click", 1.0), (1L, 2L, ts(5), "click", 2.0),
      (1L, 3L, ts(60), "view", 3.0))
    q.processAllAvailable()
    mem.addData((9L, 9L, ts(5000), "view", 0.0)) // push watermark
    q.processAllAvailable()
    val got = spark.table("sess").select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().filter(_._1 == 1L).toSet
    q.stop()
    assert(got == Set((1L, 2L, 3.0), (1L, 1L, 3.0)))
  }
}
