package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Compact `dir/ids` sidecar shared by the persisted IVF and minhash
  * indexes: one row per indexed doc id, written at build and extended
  * at append, so the append-time replayed-id guard scans O(corpus docs)
  * of bare ids instead of the index's payload tables (full-width cell
  * rows for IVF; doc-shingle pairs — many× corpus rows — for minhash).
  * At 100 TB that turns the guard from an O(history-payload) scan per
  * append into a read of the smallest column the index owns, and the
  * sidecar's byte size is what a daily append actually touches.
  *
  * Indexes built before the sidecar existed are backfilled lazily:
  * [[ensureIds]] materializes the fallback projection once on the first
  * append, then every later guard reads the sidecar.
  */
private[operators] object IndexFiles {

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(s"$dir/ids")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Overwrite the sidecar at build time. `ids` must be one row per
    * distinct indexed id. */
  def writeIds(ids: DataFrame, dir: String): Unit =
    ids.write.mode("overwrite").parquet(s"$dir/ids")

  /** Extend the sidecar with an appended batch's ids. */
  def appendIds(ids: DataFrame, dir: String): Unit =
    ids.write.mode("append").parquet(s"$dir/ids")

  /** The stored id set, reading the sidecar when present and falling
    * back to `fallback` (the index's own id column, already distinct)
    * for pre-sidecar indexes. Read-only — use [[ensureIds]] on paths
    * that will extend the sidecar afterwards. */
  def storedIds(spark: SparkSession, dir: String,
      fallback: => DataFrame): DataFrame =
    if (exists(spark, dir)) spark.read.parquet(s"$dir/ids") else fallback

  /** Like [[storedIds]], but backfills a missing sidecar from the
    * fallback first, so a subsequent [[appendIds]] leaves it complete.
    * Must be called BEFORE the batch's payload is appended (the
    * fallback projection would otherwise include the batch). */
  def ensureIds(spark: SparkSession, dir: String,
      fallback: => DataFrame): DataFrame = {
    if (!exists(spark, dir)) writeIds(fallback, dir)
    spark.read.parquet(s"$dir/ids")
  }
}
