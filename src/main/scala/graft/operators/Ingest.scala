package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V, HashFunctions => H}

/** The reference's whole ingest flow (embed_to_milvus.py:52-141) as ONE
  * declarative plan:
  *
  *   docs → id lookup (broadcast dim join)
  *        → existence check (left-anti join — the check_exists skip)
  *        → reformat ([标题]/[时间]/[来源] doc)
  *        → chunk (block_id per doc)
  *        → dense embed + sparse embed (stub embedder behind the seam)
  *        → Milvus bulk-row assembly → segment write
  *
  * Every reference thread/lock/queue maps to Spark machinery: batches =
  * partitions, back-pressure = shuffle, retry = task retry. Narrow
  * transforms end-to-end — the ONLY shuffle is the optional final
  * repartition for segment sizing, so 100 TB ingest scales linearly.
  */
object Ingest {

  /** file_name/key → id against an external dimension table
    * (vector_database/mysql_connector.py:40-56). The MySQL pool becomes
    * a broadcast hash join: no connection churn, no per-row RPC. */
  def idLookup(docs: DataFrame, dim: DataFrame, key: String): DataFrame =
    docs.join(broadcast(dim), key)

  /** Skip documents already in the collection
    * (milvus_connector.py:163-173, the check_exists early-continue):
    * a left-anti join pushed BEFORE the expensive chunk/embed stages. */
  def existsCheck(docs: DataFrame, existing: DataFrame,
      docKey: Column, existKey: Column): DataFrame =
    docs.join(existing, docKey === existKey, "left_anti")

  /** Predicate delete (milvus_connector.py:190-198 delete-by-expr):
    * keep the complement. */
  def deleteWhere(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!predicate)

  /** All files under a knowledge-base id, ordered by file id
    * (mysql_connector.py:58-86 get_files_by_knowledge): the per-request
    * SELECT becomes a filter the optimizer pushes to the scan. The sort
    * is part of the reference contract (ORDER BY id ASC) — dim tables
    * are small, so the global sort is one tiny shuffle. */
  def filesByKnowledge(dim: DataFrame, knowledgeCol: String,
      knowledgeId: Column, orderCol: String): DataFrame =
    dim.filter(col(knowledgeCol) === knowledgeId).orderBy(col(orderCol).asc)

  /** Milvus-style upsert — the reference's re-ingest flow is delete-by-
    * key then insert (milvus_connector.py:190-198): rows of `updates`
    * replace base rows sharing the key. The anti-join moves only the
    * key column of updates (broadcast when small; co-located when the
    * base is bucketed by the key). */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame =
    base.join(updates.select(col(key)).distinct(), Seq(key), "left_anti")
      .unionByName(updates)

  /** Batch resume bookkeeping. The reference persists reader offsets and
    * writer metadata so a restarted run skips work already done
    * (load_data/json_batch_reader.py start/end slices +
    * parquet_manager's metadata files). The Spark-native form derives
    * the done-set from the OUTPUT itself — the file_ids already present
    * in the segment directory — and anti-joins the input, so a rerun
    * after a crash re-chunks/re-embeds only the missing documents. No
    * offset ledger to keep consistent: the output is the ledger, which
    * stays correct under task retries and speculative execution, and
    * the scan of it reads only the file_id column (column pruning). */
  def resumeFrom(docs: DataFrame, segmentDir: String,
      docKey: String = "doc_id"): DataFrame =
    if (!ledgerHasData(docs.sparkSession, segmentDir)) docs
    else docs.join(ledgerIds(docs, segmentDir, docKey),
      docs(docKey) === col("file_id"), "left_anti")

  /** The Milvus check_exists surface against the segment ledger
    * (milvus_connector.py:163-173's check_exists, answered from the
    * written output instead of a collection query): which of `probe`'s
    * ids are already present in the segments. Same ranged-manifest
    * pruning as [[resumeFrom]] — a narrow probe (the common case:
    * today's batch against months of history) reads only the segments
    * whose [min_id, max_id] overlap it, not the whole ledger. */
  def existsInSegments(probe: DataFrame, segmentDir: String,
      docKey: String = "doc_id"): DataFrame =
    if (!ledgerHasData(probe.sparkSession, segmentDir))
      probe.filter(lit(false))
    else probe.join(ledgerIds(probe, segmentDir, docKey),
      probe(docKey) === col("file_id"), "left_semi")

  /** False when the dir holds no data files (absent, or killed
    * mid-write leaving only _temporary/ or _MANIFEST.json) — nothing
    * was durably written, so there is no ledger to consult. */
  private def ledgerHasData(spark: SparkSession, segmentDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(segmentDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** The distinct file_ids of every ledger segment that could contain
    * one of `probe`'s ids — the range-pruned scan behind [[resumeFrom]]
    * and [[existsInSegments]]. */
  private def ledgerIds(probe: DataFrame, segmentDir: String,
      docKey: String): DataFrame =
    probe.sparkSession.read
      .parquet(resumeLedgerPaths(probe.sparkSession, probe, segmentDir,
        docKey): _*)
      .select(col("file_id")).distinct()

  /** The ledger files [[resumeFrom]] actually needs to read: when the
    * manifest carries per-segment id ranges (BulkFileInfo parity,
    * [[graft.sources.SegmentWriter.writeManifest]]) and the doc key is
    * integral, segments whose [min_id, max_id] cannot intersect the
    * batch's own id range are pruned AT THE FILE LIST — a resume of
    * a bounded batch then reads only the overlapping segments instead
    * of the whole output history. The batch's bounds cost one
    * column-pruned min/max pass over the input, cheap beside the
    * re-chunk/re-embed work a resume exists to skip. Falls back to the
    * full directory when the manifest is absent or unranged. */
  private def resumeLedgerPaths(spark: SparkSession, docs: DataFrame,
      segmentDir: String, docKey: String): Seq[String] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = docs.schema(docKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral) return Seq(segmentDir)
    val manifest =
      try graft.sources.SegmentWriter.readManifest(spark, segmentDir)
      catch { case _: java.io.FileNotFoundException => Seq.empty }
    if (manifest.isEmpty || manifest.exists(s => s.minId.isEmpty))
      return Seq(segmentDir)
    // the manifest is only a valid pruning index if it covers every
    // data file actually present: segments appended after the last
    // writeManifest (a crash before the manifest rewrite, a bare
    // mode("append") caller) are ranged NOWHERE, and pruning by a
    // stale manifest would hide their file_ids from the ledger —
    // silently re-ingesting their docs as duplicates. One listStatus
    // (the same call writeManifest does) detects staleness; fall back
    // to the full directory, which is always correct.
    val ranged = manifest.map(_.path).toSet
    val p = new org.apache.hadoop.fs.Path(segmentDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val unranged = fs.listStatus(p).exists(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet") && !ranged(f.getPath.toString))
    if (unranged) return Seq(segmentDir)
    val bounds = docs.agg(min(col(docKey)).cast("long"),
      max(col(docKey)).cast("long")).head()
    if (bounds.isNullAt(0)) return Seq(segmentDir) // empty batch: any file does
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val overlapping = manifest
      .filter(s => s.minId.get <= hi && s.maxId.get >= lo)
      .map(_.path)
    // every segment pruned → nothing ingested overlaps: read one file
    // for the schema, the anti-join keeps everything anyway
    if (overlapping.isEmpty) manifest.take(1).map(_.path)
    else overlapping
  }

  /** Milvus-style query-by-expr with output-field selection
    * (milvus_connector.py:160-166: `collection.query(expr,
    * output_fields=…)`, the reverse-lookup surface behind
    * check_exists/get_name_by_id). The expr string goes through Spark
    * SQL's parser, so the predicate pushes down to the scan and the
    * field list prunes columns — both visible in the physical plan. */
  def queryByExpr(df: DataFrame, predicate: String,
      outputFields: Seq[String]): DataFrame =
    df.filter(expr(predicate)).select(outputFields.map(col): _*)

  /** One page of a cursor-paged scan — the Milvus `query_iterator`
    * surface (pymilvus QueryIterator walks all rows matching an expr in
    * pk order, batch by batch; the reference's check_exists/query calls
    * sit on the same collection.query plumbing, milvus_connector
    * .py:160-166). `afterId` is the exclusive cursor: the last id of
    * the previous page, None for the first. Each page is an independent
    * O(page) job — predicate AND id range both push down to the parquet
    * scan (min/max row-group pruning skips everything at-or-before the
    * cursor on id-sorted data), and the order-by-limit executes as
    * TakeOrderedAndProject (per-partition top-pageSize, driver merge of
    * pageSize rows) — so iterating a 100 TB table never materializes
    * more than one page. */
  def queryPage(df: DataFrame, predicate: String, idCol: String,
      pageSize: Int, afterId: Option[Long] = None,
      outputFields: Seq[String] = Nil): DataFrame = {
    require(pageSize > 0, s"pageSize must be > 0, got $pageSize")
    val base = df.filter(expr(predicate))
    val cursored = afterId.fold(base)(a => base.filter(col(idCol) > lit(a)))
    val paged = cursored.orderBy(col(idCol)).limit(pageSize)
    if (outputFields.isEmpty) paged else paged.select(outputFields.map(col): _*)
  }

  /** Drain [[queryPage]] lazily: each `next()` runs one page job plus a
    * two-long cursor probe (max id + row count in one aggregate), so
    * driver state is O(1) regardless of table size. A short page ends
    * the iteration. `outputFields` must include `idCol` when set (the
    * cursor is read from the page). */
  def queryIterator(df: DataFrame, predicate: String, idCol: String,
      pageSize: Int, outputFields: Seq[String] = Nil): Iterator[DataFrame] =
    new Iterator[DataFrame] {
      require(outputFields.isEmpty || outputFields.contains(idCol),
        s"outputFields must carry the cursor column $idCol")
      private var cursor: Option[Long] = None
      private var staged: Option[DataFrame] = None
      private var done = false
      private def fetch(): Unit = {
        if (staged.nonEmpty || done) return
        val page = queryPage(df, predicate, idCol, pageSize, cursor,
          outputFields)
        // functions.max/count by full name: the enclosing Iterator has
        // same-named members that would shadow the sql aggregates
        val probe = page.agg(
          org.apache.spark.sql.functions.max(col(idCol)).cast("long"),
          org.apache.spark.sql.functions.count(lit(1))).head()
        val n = probe.getLong(1)
        if (n == 0) { done = true; return }
        if (n < pageSize) done = true // short page: emit it, then stop
        cursor = Some(probe.getLong(0))
        staged = Some(page)
      }
      override def hasNext: Boolean = { fetch(); staged.nonEmpty }
      override def next(): DataFrame = {
        fetch()
        val p = staged.getOrElse(throw new NoSuchElementException("iterator drained"))
        staged = None
        p
      }
    }

  /** Sparse (SPLADE-ish) embedding as exploded rows: hashed-token term
    * frequencies. (tokenize → 32-bit hash bucket → tf weight). */
  def sparseTerms(df: DataFrame, idCols: Seq[String], textCol: String,
      buckets: Int = 1 << 18): DataFrame =
    df.select(idCols.map(col) :+ explode(T.wsTokens(T.normText(col(textCol)))).as("tok"): _*)
      .groupBy(idCols.map(col) :+ pmod(H.hash32(11, col("tok")), lit(buckets)).as("term"): _*)
      .agg(count(lit(1)).cast("double").as("weight"))

  /** Full pipeline. `existing`: (file_id) rows already ingested — the
    * Milvus check_exists set. `dim`: dense embedding width. */
  def pipeline(docs: DataFrame, existing: DataFrame, dim: Int = 64,
      chunkSize: Int = 200, overlap: Int = 40): DataFrame = {
    val reformatted = docs
      .join(existing.select(col("file_id")).distinct(),
        docs("doc_id") === col("file_id"), "left_anti")
      .select(
        col("doc_id").as("file_id"),
        T.fileName(substring(col("text"), 1, 40), col("doc_id")).as("file_name"),
        col("source"),
        T.reformatDoc(substring(col("text"), 1, 40), lit("2025-08-12"),
          col("source"), col("text")).as("doc"))
    val chunks = Chunker.fixedChunks(reformatted, "doc", chunkSize, overlap)
    val embedded = chunks
      .withColumn("dense_embedding", V.fakeDenseEmbed(col("content"), dim))
      // distinct AFTER hashing: two distinct tokens can collide into one
      // bucket, and map_from_entries throws on duplicate keys under the
      // default spark.sql.mapKeyDedupPolicy=EXCEPTION — at corpus scale a
      // collision per ~1k chunks is a certainty, so dedupe the buckets.
      .withColumn("sparse_embedding",
        map_from_entries(transform(
          array_distinct(transform(
            T.wsTokens(T.normText(col("content"))),
            t => pmod(H.hash32(11, t), lit(1 << 18)).cast("int"))),
          b => struct(b, lit(1.0)))))
    embedded.select(
      lit(0L).as("qa_id"), lit("").as("question"), lit("").as("answer"),
      col("file_id"), col("block_id").cast("long"), col("file_name"),
      col("content"), col("dense_embedding"), col("sparse_embedding"),
      col("source"), lit("0").as("flag"))
  }
}
