package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache hand-off for operators whose returned plan depends on
  * internal persist() sites (the containment family, crawlTriage,
  * tokenDrift): materialize the result ONCE — so every internal cache
  * has served its fan-out purpose — release the internals immediately,
  * and hand the caller the result as its own persisted release handle:
  * `result.unpersist()` is the one-call cleanup, and nothing else
  * stays pinned.
  *
  * Without this, the internal frames were pinned for the life of the
  * session with no caller-reachable release — correct per call (Spark
  * evicts under pressure), but a slow accumulation in a long-lived
  * driver, the streaming drivers' natural host. [[graft.operators.Dedup
  * .dupClusters]] solves the same problem for its checkpoint rounds
  * with an explicit diff-and-free; this is the single-shot form.
  *
  * persist(MEMORY_AND_DISK)+count, NOT localCheckpoint: a LogicalRDD
  * has no size statistics, so downstream broadcast joins over a
  * checkpointed frame silently degrade to shuffles (measured 2.4× on
  * the curation flagship).
  */
private[graft] object CacheLifecycle {

  /** Persist and materialize `result`, then unpersist `internals`.
    * The returned frame IS the caller's release handle. */
  def handOff(result: DataFrame, internals: Seq[DataFrame]): DataFrame = {
    val out = result.persist()
    out.count()
    internals.foreach(_.unpersist())
    out
  }
}
