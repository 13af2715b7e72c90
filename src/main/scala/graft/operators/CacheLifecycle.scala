package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache release for operators whose returned plan depends on internal
  * persist() sites (the containment family, crawlTriage, tokenDrift):
  * each such operator registers its pinned internals against the frame
  * it returns, and [[release]] on that frame unpersists them in one
  * call — the caller-visible release handle the operator API lacked.
  * Without a release, behavior is unchanged from before (the internals
  * stay pinned until Spark evicts under memory pressure) — correct
  * per call, but a slow accumulation in a long-lived driver, the
  * streaming drivers' natural host; [[graft.streaming.StreamIngest
  * .applyContainmentBatch]] releases per micro-batch.
  *
  * Deliberately NOT an eager materialize-and-release: persisting the
  * RESULT would defeat count-pruning and pay a full-width cache write
  * on every call (measured +27% on the three heaviest bench queries),
  * and the internals genuinely must outlive the call — the returned
  * plan reads them. The registry holds the result WEAKLY, so an
  * unreleased frame's entry dies with the frame instead of keeping it
  * alive. [[graft.operators.Dedup.dupClusters]] solves the same
  * problem for its checkpoint rounds with an in-call diff-and-free —
  * possible there because its result is already materialized.
  */
object CacheLifecycle {

  private val pins = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, Seq[DataFrame]]())

  /** Register `internals` as the pinned frames behind `result` and
    * return `result` — the operator-side half of the contract.
    * ABSORBING: any pins already registered on an internal frame (a
    * helper like shingleSetHashed caching inside its own return)
    * transfer to `result`, so one [[release]] at the operator surface
    * frees the whole chain. Note `df.cache()`/`df.persist()` return
    * the SAME instance, so registrations survive caller-side
    * re-caching of a handed-off frame. */
  private[graft] def handOff(result: DataFrame,
      internals: Seq[DataFrame]): DataFrame = {
    val absorbed = internals.flatMap(f => Option(pins.remove(f))
      .getOrElse(Seq.empty))
    pins.put(result, internals ++ absorbed)
    result
  }

  /** Unpersist the internal caches registered behind `result` (the
    * exact frame an operator returned). Call once the output is fully
    * consumed; releasing earlier only costs recomputation, never
    * correctness. No-op for frames with nothing registered. */
  def release(result: DataFrame): Unit = {
    val internals = pins.remove(result)
    if (internals != null) internals.foreach(_.unpersist())
  }
}
