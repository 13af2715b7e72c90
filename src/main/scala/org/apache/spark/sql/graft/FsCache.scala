package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.FileStatusCache

/** Session file-listing cache control — needed by maintenance ops that
  * DELETE a hive partition directory which may later be re-created
  * under the same path (segment retirement): the shared
  * [[FileStatusCache]] keeps per-directory leaf listings keyed by
  * path, `Catalog.refreshByPath` only re-plans cached datasets, and a
  * re-created directory resurfaces the stale pre-delete listing —
  * reads then reference files that no longer exist. Appends never hit
  * this (they only ever create new directories or add files that the
  * next fresh top-level listing discovers); deletion followed by
  * re-creation is the one lifecycle that must drop the cache. Lives in
  * the spark.sql package tree for the private[sql] accessor, like the
  * sibling expression registrations. */
object FsCache {
  def invalidate(spark: SparkSession): Unit =
    FileStatusCache.getOrCreate(spark).invalidateAll()
}
