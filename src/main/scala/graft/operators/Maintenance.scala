package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scheduled index maintenance — the ONE nightly call a long-lived
  * ingestion driver makes after a day's appends land: age out every
  * segment beyond each index's retention window, uniformly across
  * every persisted history/index family this engine ships (the
  * reference's analog is load_data/parquet_manager.py's rotating
  * segment design, applied store-wide).
  *
  * Declarative: the caller lists (dir, family, keep) specs; the
  * driver dispatches each to that family's `retire*Window` and
  * returns the audit trail a scheduled job logs — one row per
  * RETIRED segment, (dir, family, keep, tag), tags in the retirement
  * (oldest-first) order. Idempotent by composition: each window call
  * retires only segments beyond its window, so the steady state of a
  * daily run is one retired tag per spec (or none). Failures are
  * loud and ordered: specs run in the given order and a failing
  * family aborts the run BEFORE later specs touch their indexes —
  * each family's own retire leaves its index consistent (heal-first,
  * sidecars rebuilt), so a crashed nightly resumes by re-running.
  */
object Maintenance {

  /** Every family with a rolling-window retirement driver, by the
    * name a maintenance spec uses. */
  val families: Map[String, (SparkSession, String, Int) => Seq[String]] =
    Map(
      "exact" -> ((s, d, k) => Dedup.retireExactWindow(s, d, k)),
      "linedf" -> ((s, d, k) => Dedup.retireLineDfWindow(s, d, k)),
      "containment" -> ((s, d, k) => Dedup.retireContainmentWindow(s, d, k)),
      "minhash" -> ((s, d, k) => Dedup.retireMinhashWindow(s, d, k)),
      "domain_cap" -> ((s, d, k) => Dedup.retireDomainCapWindow(s, d, k)),
      "phash" -> ((s, d, k) => Multimodal.retirePhashWindow(s, d, k)),
      "ivf" -> ((s, d, k) => Ann.retireIvfWindow(s, d, k)),
      "ivf_sq8" -> ((s, d, k) => Ann.retireIvfSq8Window(s, d, k)),
      "ivf_pq" -> ((s, d, k) => Ann.retireIvfPqWindow(s, d, k)),
      "sparse" -> ((s, d, k) => Ann.retireSparseWindow(s, d, k)),
      "binary" -> ((s, d, k) => Ann.retireBinaryWindow(s, d, k)),
      "lsh" -> ((s, d, k) => Ann.retireLshWindow(s, d, k)))

  /** Run the windows. `specs` = (indexDir, family, keep) — family one
    * of [[families]]; unknown names are loud BEFORE any retirement
    * runs (a typo'd nightly must not half-age the store). The report
    * is driver-sized by construction (one row per retired segment). */
  def nightly(spark: SparkSession,
      specs: Seq[(String, String, Int)]): DataFrame = {
    import spark.implicits._
    val unknown = specs.map(_._2).filterNot(families.contains).distinct
    require(unknown.isEmpty,
      s"unknown maintenance families ${unknown.mkString(", ")} — " +
        s"expected one of ${families.keys.toSeq.sorted.mkString(", ")}")
    specs.flatMap { case (dir, family, keep) =>
      families(family)(spark, dir, keep)
        .map(tag => (dir, family, keep, tag))
    }.toDF("dir", "family", "keep", "tag")
  }
}
