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

  /** Extend the sidecar with an appended batch's ids. Runs LAST in
    * every guarded append, so the refresh also covers the payload
    * files the append just wrote. */
  def appendIds(ids: DataFrame, dir: String): Unit = {
    ids.write.mode("append").parquet(s"$dir/ids")
    refresh(ids.sparkSession, dir)
  }

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

  /** Invalidate (and rebuild) any cached plan reading under `dir`.
    * Every mutation of a persisted index MUST call this: Spark's
    * CacheManager matches by logical plan, so a search fragment cached
    * before a compaction/append/delete (operators legitimately cache
    * branching sub-plans) would otherwise keep serving the OLD file
    * set forever — the same reason Spark's own INSERT paths call
    * refreshByPath after writing. */
  def refresh(spark: SparkSession, dir: String): Unit =
    spark.catalog.refreshByPath(dir)

  /** Tombstone ids into `dir/deleted` — the shared delete model of
    * every persisted index (Milvus materializes deletes the same way:
    * tombstones merged away at compaction): O(batch) per call, no
    * payload rewrite; searches anti-join the set out; each index's
    * compact() purges physically and re-opens the ids. */
  def writeTombstones(ids: DataFrame, dir: String): Unit = {
    ids.select(org.apache.spark.sql.functions.col("id")).distinct()
      .write.mode("append").parquet(s"$dir/deleted")
    refresh(ids.sparkSession, dir)
  }

  /** The tombstone set, None when none were ever written. */
  def tombstones(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(s"$dir/deleted")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      Some(spark.read.parquet(s"$dir/deleted"))
    else None
  }

  /** Drop tombstoned rows from a search-side payload scan. */
  def dropTombstones(spark: SparkSession, dir: String,
      payload: DataFrame): DataFrame =
    tombstones(spark, dir).map(d =>
      payload.join(org.apache.spark.sql.functions.broadcast(d),
        Seq("id"), "left_anti")).getOrElse(payload)

  /** Swap a freshly staged table into place without a data-loss
    * window: the live table is renamed ASIDE first, the staged copy
    * renamed in, then the old copy deleted. A crash between the two
    * renames leaves the data intact under `<path>_old` (an outage a
    * human can repair by renaming back — never a loss); a crash after
    * rename-in leaves at worst the `_old` leftover, deleted on the
    * next compact. Leftovers are handled by explicit existence checks
    * — Hadoop rename into an existing directory NESTS the source
    * inside it and returns true, so a rename would never surface them
    * (single concurrent compactor assumed, as everywhere here): an
    * `_old` beside an intact live table is the benign crash-after-
    * rename-in window and self-heals (deleted, compact proceeds); an
    * `_old` with the live table MISSING is the crash-between-renames
    * window — fail with the rename-back repair instruction. */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem,
      staged: Path, live: Path): Unit = {
    val old = new Path(live.getParent, live.getName + "_old")
    if (fs.exists(old)) {
      require(fs.exists(live),
        s"crashed compact: $live is missing and its data sits at $old — " +
          "rename it back before compacting")
      require(fs.delete(old, true), s"delete leftover $old failed")
    }
    require(fs.rename(live, old), s"rename $live aside failed")
    require(fs.rename(staged, live), s"swap $staged into place failed")
    require(fs.delete(old, true), s"delete $old failed")
  }

  /** Physically purge tombstones: rewrite each payload table under
    * `dir` without the dead ids (staged, then swapped via [[swapIn]] —
    * no crash window loses data), shrink the ids sidecar when the
    * index keeps one, drop `dir/deleted`. `payloads` maps table name →
    * partition columns (empty for unpartitioned). No-op when nothing
    * was deleted. */
  def compact(spark: SparkSession, dir: String,
      payloads: Map[String, Seq[String]]): Unit =
    tombstones(spark, dir).foreach { dead =>
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Surface the crash-between-renames window HERE, where a re-run
      // lands first: the payload read below would otherwise fail with a
      // raw PATH_NOT_FOUND and no pointer to the `_old` rename-back
      // repair (swapIn's own message is unreachable then — it only runs
      // after this read succeeds).
      payloads.keys.foreach { name =>
        val live = new Path(s"$dir/$name")
        val old = new Path(s"$dir/${name}_old")
        require(fs.exists(live) || !fs.exists(old),
          s"crashed compact: $live is missing and its data sits at $old — " +
            "rename it back before compacting")
      }
      payloads.foreach { case (name, partCols) =>
        val kept = spark.read.parquet(s"$dir/$name")
          .join(org.apache.spark.sql.functions.broadcast(dead),
            Seq("id"), "left_anti")
        val w = kept.write.mode("overwrite")
        (if (partCols.isEmpty) w else w.partitionBy(partCols: _*))
          .parquet(s"$dir/${name}_tmp")
        swapIn(fs, new Path(s"$dir/${name}_tmp"), new Path(s"$dir/$name"))
      }
      // indexes without an append guard (LSH) keep no sidecar — don't
      // invent one here that later appends would silently let go stale
      if (exists(spark, dir)) {
        val keptIds = spark.read.parquet(s"$dir/ids")
          .join(org.apache.spark.sql.functions.broadcast(dead),
            Seq("id"), "left_anti")
        writeIds(keptIds, s"$dir/ids_staging")
        swapIn(fs, new Path(s"$dir/ids_staging/ids"), new Path(s"$dir/ids"))
        fs.delete(new Path(s"$dir/ids_staging"), true)
      }
      fs.delete(new Path(s"$dir/deleted"), true)
      refresh(spark, dir)
    }
}
