package graft

import java.time.{Instant, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.functions._
import graft.streaming.Events

/** Pins `Events.withMs` across every timestamp encoding the testdata
  * has shipped with — LONG epoch-nanos, TIMESTAMP (instant), and
  * TIMESTAMP_NTZ (UTC wall clock) — to the SAME epoch-ms output on the
  * same instants, including a pre-epoch instant where truncation and
  * floor diverge. The seam has broken once per encoding change (r10:
  * NTZ); this matrix makes the next drift a red test, not a dark query.
  */
class EventsEncodingSpec extends SparkSpec {

  // instants chosen so sub-ms digits are non-zero (floor actually bites)
  // and one is pre-epoch (div-truncate would round toward zero, off by 1)
  private val micros = Seq(
    1709296496789123L, //  2024-03-01T12:34:56.789123Z
    1700000000000001L,
    -1L,               //  1969-12-31T23:59:59.999999Z → ms floor = -1
    -1234567L)         //  pre-epoch, ms floor = -1235
  private val expectedMs = micros.map(us => Math.floorDiv(us, 1000L))

  private def msOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    Events.withMs(df).orderBy("event_id").select("ts_ms")
      .collect().map(_.getLong(0)).toSeq

  test("LONG nanos, TIMESTAMP, and TIMESTAMP_NTZ encodings agree on epoch-ms") {
    val s = spark; import s.implicits._
    val idx = micros.indices.map(_.toLong)

    val asNanos = idx.zip(micros.map(_ * 1000L)).toDF("event_id", "ts")
    val asTimestamp = idx.zip(micros.map(us =>
        java.sql.Timestamp.from(Instant.EPOCH.plusNanos(us * 1000L))))
      .toDF("event_id", "ts")
    // LocalDateTime encodes as TIMESTAMP_NTZ; build the UTC wall clock
    val asNtz = idx.zip(micros.map(us =>
        LocalDateTime.ofInstant(Instant.EPOCH.plusNanos(us * 1000L), ZoneOffset.UTC)))
      .toDF("event_id", "ts")

    assert(asNtz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType, "encoder drift: expected NTZ")

    assert(msOf(asNanos) == expectedMs, "LONG-nanos path diverged")
    assert(msOf(asTimestamp) == expectedMs, "TIMESTAMP path diverged")
    assert(msOf(asNtz) == expectedMs, "TIMESTAMP_NTZ path diverged")
  }

  test("withEventTime LONG branch floors pre-epoch nanos like withMs (ADVICE r11)") {
    val s = spark; import s.implicits._
    // nanos with non-zero sub-µs digits, incl. negative: `div` truncates
    // toward zero, which would land pre-epoch events 1µs later than the
    // batch epoch-ms contract and shift watermark/window membership
    val nanos = Seq(1709296496789123456L, -1L, -999L, -1001L, -1234567891L)
    val expectedUs = nanos.map(ns => Math.floorDiv(ns, 1000L))
    val df = nanos.indices.map(_.toLong).zip(nanos).toDF("event_id", "ts")
    val got = Events.withEventTime(df)
      .orderBy("event_id").select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == expectedUs, "LONG→timestamp µs floor diverged from batch contract")
  }

  test("withMs refuses TIMESTAMP_NTZ under a non-UTC session timezone") {
    val s = spark; import s.implicits._
    val ntz = Seq((1L, LocalDateTime.of(2024, 3, 1, 12, 0, 0)))
      .toDF("event_id", "ts")
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] { Events.withMs(ntz) }
      assert(e.getMessage.contains("session.timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("sessionizeBatch runs end-to-end on an NTZ events frame") {
    val s = spark; import s.implicits._
    val base = LocalDateTime.of(2024, 3, 1, 12, 0, 0)
    val ntz = Seq(
      (1L, 7L, base, 1.0, "click"),
      (2L, 7L, base.plusMinutes(5), 2.0, "click"),
      (3L, 7L, base.plusHours(2), 3.0, "view"))
      .toDF("event_id", "user_id", "ts", "value", "event_type")
    val out = Events.sessionizeBatch(ntz).orderBy("session_start_ms").collect()
    assert(out.length == 2, "gap of 2h must split into two sessions")
    assert(out(0).getAs[Long]("n_events") == 2L)
  }
}
