package graft

import org.apache.spark.sql.types._
import graft.streaming.Events

/** Contract tests against the REAL graded parquet under /root/testdata.
  *
  * Every other spec builds frames in memory with `toDF`, which means a
  * driver-side regeneration of the testdata (schema/encoding drift) is
  * invisible to the suite: in round 10 the events table moved from
  * TIMESTAMP(NANOS) to TIMESTAMP_NTZ and 188/188 tests stayed green
  * while four graded queries crashed. This spec closes that blind spot
  * by loading each table from disk and driving one row through the
  * type-sensitive seams. Skips cleanly when the testdata tree is absent
  * (e.g. a bare checkout).
  */
class TablesContractSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
  private def present = new java.io.File(sfDir).isDirectory

  test("every table loads from the graded parquet with rows > 0") {
    assume(present, s"$sfDir absent — skipping on-disk contract checks")
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n)
      assert(df.limit(1).count() == 1L, s"table $n is empty or unreadable")
    }
  }

  test("Events.withMs accepts the on-disk events encoding and yields sane epoch-ms") {
    assume(present, s"$sfDir absent — skipping on-disk contract checks")
    val events = Tables.load(spark, sfDir, "events")
    // the seam that broke in r10: whatever encoding the driver writes
    // (LONG nanos / TIMESTAMP / TIMESTAMP_NTZ), withMs must plan AND run
    val row = Events.withMs(events.limit(5)).select("ts_ms").collect()
    assert(row.nonEmpty)
    // sanity band: epoch-ms between 2000-01-01 and 2100-01-01 — a
    // unit-scale mistake (s vs ms vs µs) lands orders of magnitude out
    row.foreach { r =>
      val ms = r.getLong(0)
      assert(ms > 946684800000L && ms < 4102444800000L,
        s"ts_ms=$ms outside the plausible epoch-ms band — unit drift?")
    }
  }

  test("embeddings.embedding is an array of float consumable by the vector seams") {
    assume(present, s"$sfDir absent — skipping on-disk contract checks")
    val emb = Tables.load(spark, sfDir, "embeddings")
    emb.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => ()
      case other => fail(s"embeddings.embedding is $other, expected array<float>")
    }
    // drive one row through the same arithmetic the ANN operators use
    import org.apache.spark.sql.functions._
    val norm = emb.limit(1).select(
      sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x * x)).as("l2")).collect()(0).getDouble(0)
    assert(norm > 0.0, "zero-norm first embedding — generator drift?")
  }

  test("lineitem/orders date columns compare against string date literals (q1/q3/q5 seam)") {
    assume(present, s"$sfDir absent — skipping on-disk contract checks")
    import org.apache.spark.sql.functions._
    // the TPC-H queries filter NTZ/timestamp/date-encoded columns against
    // string literals — whatever encoding the driver writes, the implicit
    // cast must plan AND produce a sane split (not 0/all from a bad cast)
    val li = Tables.load(spark, sfDir, "lineitem")
    val n = li.count()
    val before = li.filter(col("l_shipdate") <= lit("1998-09-02")).count()
    assert(before > 0 && before <= n, s"shipdate filter kept $before of $n")
    val od = Tables.load(spark, sfDir, "orders")
    assert(od.filter(col("o_orderdate") < lit("1995-03-15")).limit(1).count() == 1L,
      "orderdate literal comparison selected nothing — encoding drift?")
  }

  test("windowAggStream accepts the on-disk events encoding end-to-end (readStream)") {
    assume(present, s"$sfDir absent — skipping on-disk contract checks")
    import org.apache.spark.sql.functions._
    // the batch NTZ break hid behind toDF specs; the streaming forms
    // watermark/window on `ts` directly — drive them from the REAL file
    // so a watermark-incompatible encoding fails here, not in production
    val batch = Tables.load(spark, sfDir, "events")
    // the file stream source requires a DIRECTORY; stage the real file
    // (same bytes, same encoding) into one
    val dir = java.nio.file.Files.createTempDirectory("contract_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    val sdf = spark.readStream.schema(batch.schema).parquet(dir.toString)
    val q = Events.windowAggStream(sdf, width = "5 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("contract_ev_win")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("contract_ev_win")
        .agg(sum("n").cast("long")).collect()(0).getLong(0)
      assert(got == batch.count(), s"streamed window n=$got != event count")
    } finally q.stop()
    // the custom-state sessionizer through the typed adapter: the NTZ
    // seam must survive groupByKey/flatMapGroupsWithState end-to-end
    val q2 = Events.sessionizeWithState(
        Events.toSessionEvents(sdf).withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("contract_ev_sess")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      q2.processAllAvailable()
      // real data spans days at a 30-min gap — sessions must close
      assert(spark.table("contract_ev_sess").limit(1).count() == 1L,
        "no sessions closed from the real events stream")
    } finally q2.stop()
  }

  test("documents carries non-null text/lang and events carries the query-contract columns") {
    assume(present, s"$sfDir absent — skipping on-disk contract checks")
    val docs = Tables.load(spark, sfDir, "documents")
    Seq("doc_id", "text", "lang", "n_chars").foreach(c =>
      assert(docs.columns.contains(c), s"documents missing column $c"))
    val ev = Tables.load(spark, sfDir, "events")
    Seq("event_id", "ts", "user_id", "event_type", "value").foreach(c =>
      assert(ev.columns.contains(c), s"events missing column $c"))
  }
}
