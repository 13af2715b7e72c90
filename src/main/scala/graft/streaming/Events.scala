package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Input row for the stateful sessionizer (event time as a real
  * timestamp so watermarks apply). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** Open-session state carried between triggers. */
case class OpenSession(start: Long, last: Long, n: Long, total: Double)

/** A closed session — emitted when the gap passes or event-time
  * timeout fires. */
case class ClosedSession(user_id: Long, session_start_ms: Long,
    session_end_ms: Long, n_events: Long, total_value: Double)

/** One tagged row of the unioned as-of input stream: side 0 = right
  * (the versioned lookup: `value` is real, `event_id` ignored), side 1
  * = left (the event to enrich: `event_id` is real, `value` ignored). */
case class AsofEvent(key: Long, ts: java.sql.Timestamp, side: Int,
    event_id: Long, value: Double)

/** Per-key as-of buffer: right versions not yet superseded below the
  * watermark, and left events still waiting for their emission bar. */
case class AsofPending(rights: List[(Long, Double)],
    lefts: List[(Long, Long)])

/** A left event enriched with the latest right value at-or-before its
  * event time — the same row batch [[Events.asofJoin]] produces. */
case class AsofJoined(key: Long, event_id: Long, ts_ms: Long,
    value: Option[Double])

/** Event-stream operators: gap sessionization and tumbling windows, in
  * both batch (window-function) and Structured Streaming forms. Times
  * are carried as epoch-milliseconds BIGINT so results are engine- and
  * timezone-stable (parquet ns → Spark µs → ms floor == DuckDB ns → ms).
  */
object Events {

  /** Normalize `ts` to epoch-ms across every encoding the testdata has
    * shipped with: LONG epoch-nanos (parquet TIMESTAMP(NANOS) read via
    * `spark.sql.legacy.parquet.nanosAsLong=true` — epoch nanos exceed
    * 2^53, so integer division; double division would lose ms),
    * TIMESTAMP (instant — unix_micros is timezone-independent), and
    * TIMESTAMP_NTZ (parquet `timestamp[us]` with no zone — a wall
    * clock; the corpus writes UTC wall clocks, so it is cast to an
    * instant through the session timezone, which every graft entry
    * point pins to UTC; a non-UTC session would silently shift every
    * event, so that contract is enforced, not assumed).
    * `div` truncates toward zero while the oracle's epoch_ms floors, so
    * pre-epoch (negative) timestamps are floor-adjusted to keep the
    * cross-engine contract bit-for-bit. */
  def withMs(events: DataFrame): DataFrame = {
    def floorDiv(e: String, d: Long) =
      expr(s"$e div $d - (CASE WHEN $e % $d < 0 THEN 1 ELSE 0 END)")
    val msCol = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => floorDiv("ts", 1000000L)
      case org.apache.spark.sql.types.TimestampNTZType =>
        val tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "Z",
          s"ts is TIMESTAMP_NTZ (UTC wall clock by corpus contract) but " +
          s"spark.sql.session.timeZone=$tz — the cast to an instant would " +
          "shift every event; pin the session timezone to UTC")
        floorDiv("unix_micros(cast(ts as timestamp))", 1000L)
      case _ => floorDiv("unix_micros(ts)", 1000L)
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

  /** Backward as-of join: for every left row, attach `valueCols` from
    * the LATEST right row of the same `key` with right ts <= left ts
    * (inclusive) — the point-in-time lookup (as of this event, what was
    * the user's last profile update?) that Spark has no native operator
    * for. Implemented as union + running `last(ignoreNulls)` window:
    * ONE shuffle on the key, rows merge-sorted once — a range-condition
    * join would enumerate O(left×right) pairs per key and die at scale.
    *
    * Contract: `rightTs` must be union-compatible with `leftTs`;
    * `valueCols` must not collide with left column names; right rows
    * should be unique per (key, ts) — equal-ts duplicates make the
    * winner order-dependent (pre-aggregate the right side, as the
    * reference query does). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val rSchema = right.schema
    // value columns travel wrapped in a single-field struct: a right
    // row whose value is legitimately NULL still carries a NON-null
    // struct, so last(ignoreNulls) picks the latest matched right row
    // (true as-of semantics) instead of skipping to an older one
    def wrapType(c: String) = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", rSchema(c).dataType)))
    val lSide = valueCols.foldLeft(
        left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(wrapType(c)))
    }
    val rBase = valueCols.foldLeft(
        right.select(Seq(col(key), col(rightTs).as("__ts"),
          lit(0).as("__side")) ++ valueCols.map(col): _*)) {
      (df, c) => df.withColumn(c, struct(col(c).as("v")))
    }
    val rSide = left.columns.filterNot(_ == key).foldLeft(rBase) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    // right sorts before left at equal ts (side 0 < 1) → inclusive match
    val w = Window.partitionBy(col(key)).orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(
        lSide.unionByName(rSide.select(lSide.columns.map(col): _*))) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    valueCols.foldLeft(filled.filter(col("__side") === 1)) {
      (df, c) => df.withColumn(c, col(c).getField("v"))
    }.drop("__ts", "__side")
  }

  /** Range join: attach to each point row the range row(s) of the same
    * `key` containing its timestamp (start <= ts <= end). Spark plans a
    * raw range predicate as broadcast-nested-loop — O(points·ranges)
    * per key. Instead both sides bucketize to `bucketMs` cells (ranges
    * explode to every cell they overlap), the join becomes an equi-join
    * on (key, cell), and the exact BETWEEN filter runs only within
    * cells. A point matches a multi-cell range exactly once — the point
    * lives in one cell. Choose bucketMs near the typical range length:
    * the explode factor is ~rangeLen/bucketMs. */
  def rangeJoin(points: DataFrame, ranges: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      bucketMs: Long = 3600000L): DataFrame = {
    val p = points.withColumn("__cell", floor(col(tsCol) / bucketMs))
    val r = ranges.withColumn("__cell",
      explode(sequence(floor(col(startCol) / bucketMs), floor(col(endCol) / bucketMs))))
    p.join(r, Seq(key, "__cell"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__cell")
  }

  /** Normalize `ts` to a watermarkable TIMESTAMP (instant) in place.
    * Spark refuses event-time watermarks on TIMESTAMP_NTZ
    * (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and on LONG — both
    * encodings the events table has shipped with — so the streaming
    * operators route through this seam before `withWatermark`. Same
    * UTC contract as [[withMs]] for the NTZ wall clock; LONG nanos
    * truncate to µs (sub-µs is noise at watermark granularity). A
    * TIMESTAMP column passes through untouched. */
  def withEventTime(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // floor (not truncate) pre-epoch nanos like withMs does: `div`
        // rounds toward zero, so a negative ts would land 1µs later
        // than the batch epoch-ms contract and shift window membership
        events.withColumn("ts", timestamp_micros(
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        val tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "Z",
          s"ts is TIMESTAMP_NTZ (UTC wall clock by corpus contract) but " +
          s"spark.sql.session.timeZone=$tz — the cast to an instant would " +
          "shift every event; pin the session timezone to UTC")
        events.withColumn("ts", col("ts").cast("timestamp"))
      case _ => events
    }

  /** Streaming tumbling window with watermark — same aggregation as
    * [[windowAggBatch]] expressed on an unbounded stream. */
  def windowAggStream(events: DataFrame, width: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    withEventTime(events).withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** Streaming gap sessionization via session_window (Spark's native
    * state-store sessionizer — the declarative form; see
    * [[sessionizeWithState]] for the custom-state form). */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    withEventTime(events).withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))

  /** Adapt a raw events frame (any `ts` encoding [[withEventTime]]
    * accepts) to the typed input [[sessionizeWithState]] consumes.
    * Watermark is NOT attached here — the caller owns the lateness
    * policy (`toSessionEvents(df).withWatermark("ts", …)`). */
  def toSessionEvents(events: DataFrame): Dataset[SessionEvent] = {
    val s = events.sparkSession
    import s.implicits._
    withEventTime(events).select(
      col("user_id").cast("long").as("user_id"),
      col("ts"),
      col("value").cast("double").as("value")).as[SessionEvent]
  }

  /** Streaming backward as-of join — the point-in-time enrichment
    * (feature-store lookup) form of [[asofJoin]] for live streams:
    * each left event picks up the LATEST right version of its key with
    * right ts <= left ts (inclusive, same contract as batch).
    *
    * Input is the two streams unioned and tagged ([[AsofEvent]]; build
    * each side with the same watermark on `ts` before the union).
    * Event-time correctness, not processing-time approximation: a left
    * event is held in state until the watermark passes its timestamp —
    * only then can no earlier-or-equal right version still arrive — and
    * is emitted with the right value that was current as of its ts.
    * Out-of-order arrivals within the watermark are therefore joined
    * exactly as batch would.
    *
    * State per key is bounded: buffered lefts drain as the watermark
    * advances (late lefts beyond the watermark are dropped by the
    * engine before the state fn runs, like any watermarked stateful
    * op), and right versions at-or-below the watermark collapse to the
    * single latest one (the only version a future left can still
    * match). Contract (same as batch): rights unique per (key, ts) —
    * pre-aggregate the right side.
    *
    * Scale shape: one shuffle on the key; state = O(in-flight lefts +
    * 1 right version + post-watermark rights) per key, O(batch·log)
    * work per trigger. */
  def asofJoinStream(in: Dataset[AsofEvent]): Dataset[AsofJoined] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[AsofPending, AsofJoined](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, it, state) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(AsofPending(Nil, Nil))
          val arrivals = it.toIndexedSeq
          val rights = (st0.rights ++ arrivals.filter(_.side == 0)
              .map(e => (e.ts.getTime, e.value))).sortBy(_._1)
          val lefts = (st0.lefts ++ arrivals.filter(_.side == 1)
              .map(e => (e.ts.getTime, e.event_id))).sorted
          // a left at t is final once wm > t STRICTLY: rows at the
          // watermark are not late, so a right with rts == t == wm can
          // still arrive — emitting at equality would race it
          val (ready, pending) = lefts.partition(_._1 < wm)
          val out = ready.map { case (t, id) =>
            val m = rights.takeWhile(_._1 <= t).lastOption
            AsofJoined(key, id, t, m.map(_._2))
          }
          // rights at-or-below the watermark collapse to the latest one —
          // the only version a future (post-watermark) left can match
          val keepFrom = rights.lastIndexWhere(_._1 <= wm)
          val prunedRights = if (keepFrom <= 0) rights else rights.drop(keepFrom)
          if (pending.isEmpty && prunedRights.isEmpty) state.remove()
          else {
            state.update(AsofPending(prunedRights.toList, pending.toList))
            // pending heads are >= wm; the timeout must be strictly
            // above the watermark, so floor it at wm+1 — it fires once
            // the watermark passes the head, exactly when it turns final
            pending.headOption.foreach { case (t, _) =>
              state.setTimeoutTimestamp(math.max(t, wm + 1L))
            }
          }
          out.iterator
      }
  }

  /** Streaming gap sessionization with hand-rolled state via
    * flatMapGroupsWithState: the open session per user lives in the
    * state store; a session closes (and is emitted) when a later event
    * arrives past the gap, or when the event-time watermark passes
    * last + gap. Input must already carry a watermark on `ts`. This is
    * the form to extend when a session needs custom state beyond
    * aggregates (e.g. carrying the first/last event payloads). */
  def sessionizeWithState(events: Dataset[SessionEvent],
      gapMs: Long = 1800000L): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, it, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.start, s.last, s.n, s.total))
          } else {
            // events within a trigger arrive unordered — sort before folding
            val evs = it.toIndexedSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  out += ClosedSession(user, s.start, s.last, s.n, s.total)
                  cur = Some(OpenSession(t, t, 1L, e.value))
                case Some(s) =>
                  cur = Some(OpenSession(s.start, t, s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.iterator
          }
      }
  }
}
