package graft.sources

import org.apache.spark.sql.DataFrame

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
    * (the pipeline knows: content chars + dim·8). */
  def write(df: DataFrame, path: String, maxRecordsPerFile: Long = 10000,
      segmentSizeMb: Long = 512, avgRowBytes: Long = 16 * 1024): Unit = {
    val rowsBySize = math.max(1L, segmentSizeMb * 1024L * 1024L / avgRowBytes)
    val rowsPerFile = math.min(maxRecordsPerFile, rowsBySize)
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(path)
  }
}
