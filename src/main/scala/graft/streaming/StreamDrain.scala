package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

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

  /** The flush sentinel key. Long.MinValue, not a plausible id like -1:
    * a corpus row carrying the sentinel would have its output silently
    * swallowed by the sentinel filter, so the drains REJECT input that
    * collides instead (loud beats wrong). */
  private[streaming] val FlushKey = Long.MinValue

  /** Hard cap on rows a drain will collect to the driver. The
    * MemoryStream harness REQUIRES a driver-side feed (same as the
    * specs), which is fine for the graded events table (~100k rows at
    * sf0.1) but would silently become a driver OOM if the corpus grew
    * 100× — so like the FlushKey collision, an oversized feed is
    * rejected loudly instead of attempted. Benchmark a larger corpus
    * by draining a bounded slice, not by raising the cap. */
  private[graft] val MaxDrainRows = 2000000

  private[graft] def requireDrainable(n: Long): Unit =
    require(n <= MaxDrainRows,
      s"drain feed would collect $n rows to the driver (cap $MaxDrainRows); " +
      "the MemoryStream bench harness is bounded by design — drain a " +
      "bounded slice of the corpus instead of raising the cap")

  /** Rows of state work per partition the auto-sizer aims for. */
  private val RowsPerStatePartition = 25000

  /** A streaming query's state-partition count is `spark.sql.shuffle
    * .partitions` AT QUERY START, fixed for the stream's life by the
    * checkpoint — AQE never resizes it, and every micro-batch pays a
    * state-store commit PER PARTITION. At drain scale (100k events, 9
    * micro-batches) the session's batch-tuned 32 partitions mean ~290
    * near-empty state commits per drain — measured ~2× the drain's
    * wall. So each drain runs its streaming query on an ISOLATED
    * `newSession()` (same SparkContext, private conf) sized by its
    * own feed: ~[[RowsPerStatePartition]] rows of state work per
    * partition, clamped to [1, session setting] — a bigger feed scales
    * back up to the session ceiling, exactly how one sizes a
    * checkpointed production stream for expected peak (state
    * partitions can only be chosen once, at start). `statePartitions
    * > 0` overrides the auto-size — [[graft.Scale.streamLifecycle]]
    * pins it so 1× vs N× comparisons measure state growth, not
    * partition-count choices. Partition count never changes drained
    * CONTENT (spec'd alongside chunk-insensitivity). */
  private def drainSession(s: SparkSession, feedRows: Int,
      statePartitions: Int): SparkSession = {
    val ceiling = s.conf.get("spark.sql.shuffle.partitions").toInt
    val p =
      if (statePartitions > 0) statePartitions
      else math.max(1, math.min(ceiling,
        math.ceil(feedRows.toDouble / RowsPerStatePartition).toInt))
    val ns = s.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", p.toString)
    // the instant-semantics contract rides the session timezone; copy
    // it so a drain never reads differently from its caller
    ns.conf.set("spark.sql.session.timeZone",
      s.conf.get("spark.sql.session.timeZone"))
    if (s.conf.getOption(RocksDbFlag).contains("true"))
      ns.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ns
  }

  /** Set `graft.stream.rocksdb=true` on the calling session to run the
    * drains' streaming queries on the RocksDB state store instead of
    * the default in-heap HDFS-backed provider. The default keeps every
    * partition's live state in executor memory — fine for the graded
    * feeds, but a 100 TB stream's state (hundreds of millions of open
    * sessions) must spill; RocksDB keeps state on local disk with an
    * in-memory working set, which is the provider a production
    * deployment of [[Events.sessionizeWithState]]/[[Events.asofJoinStream]]
    * would run. Results are provider-invariant (spec'd — state stores
    * change where bytes live, never what the operator emits). */
  private[graft] val RocksDbFlag = "graft.stream.rocksdb"

  /** The one drain protocol both entries share: event-time-ordered
    * chunked feed, a far-future flush so every pending state emits
    * (watermark = flush − delay passes every real timestamp; the
    * engine's no-data batch then fires event-time timeouts — pinned in
    * StreamingSpec), stop, read the sink. */
  private def drain[T](mem: MemoryStream[T], q: StreamingQuery,
      rows: IndexedSeq[T], chunks: Int, flush: T): Unit =
    try {
      val step = math.max(1, math.ceil(rows.length / chunks.toDouble).toInt)
      rows.grouped(step).foreach { g =>
        mem.addData(g: _*)
        q.processAllAvailable()
      }
      mem.addData(flush)
      q.processAllAvailable()
    } finally q.stop()

  private def flushTsAfter(lastMs: Long): java.sql.Timestamp =
    new java.sql.Timestamp(lastMs + 1000L * 24 * 3600 * 1000)

  /** Empty frame in [[Events.windowAggStream]]'s output shape — the
    * empty-input escape (an empty events slice must drain to an empty
    * result, not crash on the flush-horizon lookup). */
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
      chunks: Int = 8, statePartitions: Int = 0): DataFrame = {
    val s0 = events.sparkSession
    // limit(cap+1) bounds the collect itself: an oversized corpus fetches
    // one row past the cap and is rejected, never materialized in full
    val rows: IndexedSeq[SessionEvent] =
      Events.toSessionEvents(events).orderBy("ts")
        .limit(MaxDrainRows + 1).collect().toIndexedSeq
    requireDrainable(rows.length)
    val s: SparkSession = drainSession(s0, rows.length, statePartitions)
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    if (rows.isEmpty)
      return s.emptyDataset[ClosedSession].toDF()
    require(!rows.exists(_.user_id == FlushKey),
      s"events carry user_id=$FlushKey — the drain's flush sentinel; " +
      "its sessions would be silently dropped from the result")
    val mem = MemoryStream[SessionEvent]
    val name = s"graft_drain_sess_${seq.incrementAndGet()}"
    val q = Events.sessionizeWithState(
        mem.toDS().withWatermark("ts", "1 hour"), gapMs)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    drain(mem, q, rows, chunks,
      SessionEvent(FlushKey, flushTsAfter(rows.last.ts.getTime), 0.0))
    s.table(name).filter(col("user_id") =!= FlushKey)
  }

  /** Drain [[Events.windowAggStream]] (watermarked declarative
    * aggregation — the built-in state-store path). The flush rides its
    * own far-future sentinel key and is excluded from the result;
    * NULL event_type rows pass through like the batch form (the
    * sentinel filter is null-safe). */
  def windowAggDrained(events: DataFrame, width: String = "5 minutes",
      chunks: Int = 8, statePartitions: Int = 0): DataFrame = {
    val s0 = events.sparkSession
    // Option-encoded event_type/value: a regenerated corpus may carry
    // NULLs, and the batch form tolerates them (NULL group, sum skips)
    val rows: IndexedSeq[(java.sql.Timestamp, Option[String], Option[Double])] = {
      import s0.implicits._
      Events.withEventTime(events)
        .select(col("ts"), col("event_type").cast("string"),
          col("value").cast("double"))
        .orderBy("ts")
        .as[(java.sql.Timestamp, Option[String], Option[Double])]
        .limit(MaxDrainRows + 1).collect().toIndexedSeq
    }
    requireDrainable(rows.length)
    val s: SparkSession = drainSession(s0, rows.length, statePartitions)
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    if (rows.isEmpty)
      return windowAggDrainedSchema(s)
    val sentinel = "__graft_flush"
    require(!rows.exists(_._2.contains(sentinel)),
      s"events carry event_type=$sentinel — the drain's flush sentinel; " +
      "its windows would be silently dropped from the result")
    val mem = MemoryStream[(java.sql.Timestamp, Option[String], Option[Double])]
    val name = s"graft_drain_win_${seq.incrementAndGet()}"
    // windowAggStream attaches its own watermark through withEventTime
    val q = Events.windowAggStream(
        mem.toDF().toDF("ts", "event_type", "value"), width)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    drain(mem, q, rows, chunks,
      (flushTsAfter(rows.last._1.getTime), Some(sentinel), Some(0.0)))
    // null-safe: `=!=` on a NULL event_type yields NULL (dropped) —
    // the batch form keeps the NULL group, so the drain must too
    s.table(name).filter(!(col("event_type") <=> sentinel))
  }

  /** Drain [[Events.asofJoinStream]] (flatMapGroupsWithState with the
    * most state-management logic of the three stream drains: per-key
    * right-version pruning + buffered-left finality) over the same
    * sides the batch `q_asof_join` uses — left = every event, right =
    * the `event_id % 10 == 0` events pre-aggregated to unique
    * (key, ts) versions. Event-time-ordered feed keeps every left
    * inside the 1 h watermark, so nothing is dropped and the drained
    * result equals the batch as-of join (equivalence pinned in
    * StreamingSpec at spec scale). Output is flat scalars
    * (key, event_id, ts_ms, value). */
  def asofJoinDrained(events: DataFrame, chunks: Int = 8,
      statePartitions: Int = 0): DataFrame = {
    val s0 = events.sparkSession
    val e: DataFrame = Events.withEventTime(events)
      .select(col("user_id").cast("long").as("key"), col("ts"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
    val lefts: DataFrame = e.select(col("key"), col("ts"), lit(1).as("side"),
      col("event_id"), lit(0.0).as("value"))
    // rights unique per (key, ts) — the asofJoinStream contract; same
    // max(round(value,2)) pre-aggregation as the batch q_asof_join
    val rights = e.filter(col("event_id") % 10 === 0)
      .groupBy(col("key"), col("ts"))
      .agg(max(round(col("value"), 2)).as("value"))
      .select(col("key"), col("ts"), lit(0).as("side"),
        lit(0L).as("event_id"), col("value"))
    val rows: IndexedSeq[AsofEvent] = {
      import s0.implicits._
      lefts.unionByName(rights)
        .orderBy(col("ts"), col("side"))
        .select(col("key"), col("ts"), col("side"), col("event_id"), col("value"))
        .as[AsofEvent]
        .limit(MaxDrainRows + 1).collect().toIndexedSeq
    }
    requireDrainable(rows.length)
    val s: SparkSession = drainSession(s0, rows.length, statePartitions)
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    if (rows.isEmpty)
      return s.emptyDataset[AsofJoined].toDF()
    require(!rows.exists(_.key == FlushKey),
      s"events carry user_id=$FlushKey — the drain's flush sentinel; " +
      "its joined rows would be silently dropped from the result")
    val mem = MemoryStream[AsofEvent]
    val name = s"graft_drain_asof_${seq.incrementAndGet()}"
    val q = Events.asofJoinStream(
        mem.toDS().withWatermark("ts", "1 hour").as[AsofEvent])
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    drain(mem, q, rows, chunks,
      AsofEvent(FlushKey, flushTsAfter(rows.last.ts.getTime), 0, 0L, 0.0))
    s.table(name).filter(col("key") =!= FlushKey)
  }
}
