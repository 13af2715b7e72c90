package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One written segment, as a downstream bulk-insert consumer needs it.
  * `minId`/`maxId` are the segment's id-column bounds from the parquet
  * footer statistics (the reference's BulkFileInfo tracks min_id/max_id
  * per file the same way, load_data/milvus_bulk_writer.py:20-28) —
  * present when the id column exists, is integral, and every block
  * carries stats; consumers use them to prune segment reads to the id
  * range they care about instead of scanning the whole ledger. */
case class SegmentInfo(path: String, rows: Long, bytes: Long,
    minId: Option[Long] = None, maxId: Option[Long] = None)

/** Rotating parquet segment writer — the Spark form of the reference's
  * ParquetFileManager / MilvusBulkWriterManager (load_data/
  * parquet_manager.py:44-, config.json MilvusBulkWriter: segment_size_mb,
  * max_records_per_file).
  *
  * The reference hand-rotates files under locks; Spark expresses the
  * same contract declaratively: `maxRecordsPerFile` bounds records per
  * segment, and a byte-budget repartition bounds segment size — both
  * hold per-executor with no coordination, which is what survives
  * 1000 executors.
  */
object SegmentWriter {

  /** Estimate rows-per-byte from a sample-free schema heuristic is
    * wrong at 100 TB; instead let the caller pass expected avg row bytes
    * (the pipeline knows: content chars + dim·8). Returns the segment
    * manifest (also persisted as `_MANIFEST.json` under `path`). */
  def write(df: DataFrame, path: String, maxRecordsPerFile: Long = 10000,
      segmentSizeMb: Long = 512, avgRowBytes: Long = 16 * 1024): Seq[SegmentInfo] = {
    val rowsBySize = math.max(1L, segmentSizeMb * 1024L * 1024L / avgRowBytes)
    val rowsPerFile = math.min(maxRecordsPerFile, rowsBySize)
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(path)
    writeManifest(df.sparkSession, path)
  }

  /** Bucketed segment layout for downstream co-located joins: segments
    * written bucketed + sorted by `keyCol` through the table catalog
    * (bucket metadata lives in the catalog, hence the table name). A
    * downstream join/groupBy on the key — the exists-check against
    * yesterday's segments, the id_lookup backfill — then reads both
    * sides pre-partitioned and shuffles NOTHING, which at 100 TB is the
    * difference between a metadata operation and re-moving the corpus. */
  def writeBucketed(df: DataFrame, path: String, table: String,
      keyCol: String, numBuckets: Int = 32,
      maxRecordsPerFile: Long = 10000): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Segment manifest — the MilvusBulkWriterManager metadata/log role
    * (load_data/milvus_bulk_writer.py `metadata_file`/`log_file`,
    * consumed by the uploader at embed_to_milvus.py:258-268): one
    * (path, rows, bytes) entry per segment, persisted as
    * `_MANIFEST.json` alongside the data. Row counts come from the
    * parquet footers — metadata-only reads, no data scan — and the
    * footer reads run as a small Spark job over the file list, so the
    * driver's work is the listing plus one tiny JSON write no matter
    * how many segments exist (at 100 TB / 512 MB that's ~200k footers —
    * a driver loop of 200k storage round trips, but seconds for a
    * cluster). */
  def writeManifest(spark: SparkSession, dir: String,
      idCol: String = "file_id"): Seq[SegmentInfo] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.toString, f.getLen))
      .sortBy(_._1).toSeq
    // Hadoop Configuration is not serializable — ship its entries and
    // rebuild executor-side (loadDefaults=false: the driver's iterator
    // already includes the defaults)
    val confKv = conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    val slices = math.max(1, math.min(files.length,
      spark.sparkContext.defaultParallelism))
    val infos =
      if (files.isEmpty) Seq.empty[SegmentInfo]
      else spark.sparkContext.parallelize(files, slices).map {
        case (path, bytes) =>
          val c = new org.apache.hadoop.conf.Configuration(false)
          confKv.foreach { case (k, v) => c.set(k, v) }
          val reader =
            ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), c))
          val (rows, minMax) = try {
            // id bounds straight off the block statistics — the same
            // metadata-only read as the row count, no data pages touched
            val colStats = reader.getFooter.getBlocks.asScala
              .flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == idCol)
              .map(_.getStatistics)
            val bounds =
              if (colStats.isEmpty || colStats.exists(s =>
                  s == null || s.isEmpty ||
                  !s.isInstanceOf[org.apache.parquet.column.statistics.LongStatistics]))
                (None, None)
              else {
                val ls = colStats
                  .map(_.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics])
                (Some(ls.map(_.getMin).min), Some(ls.map(_.getMax).max))
              }
            (reader.getRecordCount, bounds)
          } finally reader.close()
          SegmentInfo(path, rows, bytes, minMax._1, minMax._2)
      }.collect().toSeq.sortBy(_.path)
    val json = infos.map { i =>
      val range = (i.minId, i.maxId) match {
        case (Some(lo), Some(hi)) => s""","min_id":$lo,"max_id":$hi"""
        case _ => ""
      }
      s"""{"path":"${escJson(i.path)}","rows":${i.rows},"bytes":${i.bytes}$range}"""
    }.mkString("\n")
    val out = fs.create(new Path(p, "_MANIFEST.json"), true)
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
    infos
  }

  /** Compact undersized segments in place — the maintenance half of the
    * rotate-append lifecycle. Repeated appends (parquet_manager.py:320's
    * rotate-on-size, [[write]] called per batch, the index appends)
    * accumulate files far below the segment budget, and at 100 TB the
    * small-file tax is real: every scan pays a task + a footer read per
    * file, so 1M 5 MB files cost 200× the scheduling of 10k 512 MB ones.
    * Segments below `minBytes` (default: half the target) are read back
    * — ONLY those; right-sized segments are never rewritten — coalesced
    * (narrow, no shuffle) into ⌈total/targetBytes⌉ files, staged under a
    * `_`-prefixed temp dir (invisible to concurrent scans), moved in,
    * and the originals deleted; the manifest is rewritten last. Not
    * atomic under job failure between the move and the deletes — a
    * crash there leaves duplicate rows visible, same stage-and-move
    * caveat as the index appends; a table format buys the missing
    * transaction at production scale. Returns the refreshed manifest. */
  def compactSegments(spark: SparkSession, dir: String,
      targetBytes: Long = 512L * 1024 * 1024,
      minBytes: Long = -1L): Seq[SegmentInfo] = {
    val threshold = if (minBytes > 0) minBytes else targetBytes / 2
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val small = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .filter(_.getLen < threshold)
    // one undersized file can't merge with anything — leave it be
    if (small.length >= 2) {
      val total = small.map(_.getLen).sum
      val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
      val staging = new Path(p, "_compact_tmp")
      spark.read.parquet(small.map(_.getPath.toString).toIndexedSeq: _*)
        .coalesce(nOut)
        .write.mode("overwrite").parquet(staging.toString)
      fs.listStatus(staging)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .foreach { f =>
          // part file names carry a fresh UUID — no collision with data
          // files from earlier writes or compactions
          require(fs.rename(f.getPath, new Path(p, f.getPath.getName)),
            s"rename ${f.getPath} into $dir failed")
        }
      // a failed delete would leave the original BESIDE its compacted
      // copy — permanent duplicate rows on every later scan; fail loud
      small.foreach(f => require(fs.delete(f.getPath, false),
        s"delete ${f.getPath} failed — remove it manually before the " +
          "next scan (its rows are duplicated in the compacted files)"))
      fs.delete(staging, true)
      // a cached plan over this directory would keep referencing the
      // deleted originals — same invalidation Spark's INSERT paths do
      spark.catalog.refreshByPath(dir)
    }
    writeManifest(spark, dir)
  }

  /** Read a manifest back (the consumer side of the contract). Goes
    * through the filesystem, not spark.read — Spark's file listing
    * skips `_`-prefixed files, which is exactly why the manifest name
    * can't collide with a data scan of the directory. */
  def readManifest(spark: SparkSession, dir: String): Seq[SegmentInfo] = {
    val p = new Path(dir, "_MANIFEST.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Line =
      """\{"path":"((?:[^"\\]|\\.)*)","rows":(\d+),"bytes":(\d+)(?:,"min_id":(-?\d+),"max_id":(-?\d+))?\}""".r
    txt.linesIterator.filter(_.nonEmpty).map {
      case Line(path, rows, bytes, minId, maxId) =>
        SegmentInfo(unescJson(path), rows.toLong, bytes.toLong,
          Option(minId).map(_.toLong), Option(maxId).map(_.toLong))
      case bad =>
        // a manifest the consumer can't trust is worse than no manifest —
        // fail loudly instead of silently dropping the line
        throw new IllegalStateException(s"corrupt manifest line in $p: $bad")
    }.toSeq.sortBy(_.path)
  }

  /** Minimal JSON string escape for the manifest's path field (quotes,
    * backslashes, control chars) — paths are filesystem strings and may
    * legally contain any of them. */
  private def escJson(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case c if c < ' '  => "\\u%04x".format(c.toInt)
    case c             => c.toString
  }

  private def unescJson(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) s(i + 1) match {
        case 'u' =>
          sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
        case c => sb += c; i += 2
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }
}
