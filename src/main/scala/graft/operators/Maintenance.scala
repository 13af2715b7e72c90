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

  /** Every family with a tombstone model: its physical-compaction
    * entry plus (tombstoneTable, liveTable, livePayload) — what
    * [[tombstoneFraction]] reads. line-df and domain-cap are absent by
    * design (no delete model: their histories mutate only by segment
    * retirement). */
  val compactors: Map[String,
      ((SparkSession, String) => Unit, String, String)] =
    Map(
      "exact" -> (((s, d) => Dedup.compactExactIndex(s, d),
        "deleted_fps", "fps")),
      "containment" -> (((s, d) => Dedup.compactContainmentIndex(s, d),
        "deleted", "shingles")),
      "minhash" -> (((s, d) => Dedup.compactMinhashIndex(s, d),
        "deleted", "shingles")),
      "phash" -> (((s, d) => Multimodal.compactPhashIndex(s, d),
        "deleted", "bands")),
      "ivf" -> (((s, d) => Ann.compactIvfIndex(s, d), "deleted", "cells")),
      "ivf_sq8" -> (((s, d) => Ann.compactIvfSq8Index(s, d),
        "deleted", "cells")),
      "ivf_pq" -> (((s, d) => Ann.compactIvfPqIndex(s, d),
        "deleted", "codes")),
      "sparse" -> (((s, d) => Ann.compactSparseIndex(s, d),
        "deleted", "postings")),
      "binary" -> (((s, d) => Ann.compactBinaryIndex(s, d),
        "deleted", "bits")),
      "lsh" -> (((s, d) => Ann.compactLshIndex(s, d),
        "deleted", "buckets")))

  /** Fraction of an index's live identity set currently tombstoned —
    * the compaction trigger a scheduled job thresholds on (Milvus's
    * own compaction heuristic shape: deletes accumulate as tombstone
    * segments until a ratio trips a rewrite). Exact counts both sides
    * of the fp table; the id families count the tombstone set against
    * the ids sidecar (falling back to the payload's distinct ids for
    * pre-sidecar indexes). 0.0 when nothing is tombstoned — including
    * when the tombstone table does not exist. */
  def tombstoneFraction(spark: SparkSession, dir: String,
      family: String): Double = {
    val (_, deadTable, liveTable) = compactors.getOrElse(family,
      throw new IllegalArgumentException(
        s"family $family has no tombstone model — " +
          s"expected one of ${compactors.keys.toSeq.sorted.mkString(", ")}"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$deadTable")))
      return 0.0
    // DISTINCT: delete entries append per-batch-distinct rows, so a
    // re-issued takedown list duplicates tombstones — raw row counts
    // would inflate the fraction (past 1.0, even) and trigger rewrites
    // that are not due
    val dead = spark.read.parquet(s"$dir/$deadTable").distinct().count()
    if (dead == 0L) return 0.0
    val live =
      if (family == "exact") spark.read.parquet(s"$dir/$liveTable").count()
      else IndexFiles.storedIds(spark, dir,
        spark.read.parquet(s"$dir/$liveTable").select("id").distinct())
        .count()
    if (live == 0L) 1.0 else dead.toDouble / live
  }

  /** The compaction half of the scheduled nightly: `specs` = (indexDir,
    * family, threshold) — compact when [[tombstoneFraction]] reaches
    * the threshold (Milvus-style ratio trigger; 0.0 compacts on any
    * tombstone at all, large values effectively disable). Unknown families are loud BEFORE any
    * compaction runs, like [[nightly]]. Returns one row per spec:
    * (dir, family, fraction, compacted) — the audit trail records the
    * measured fraction that drove each decision. Compaction is the one
    * honest O(index) rewrite, so the threshold is the knob that
    * amortizes it: a 100 TB store compacts an index when takedowns
    * have actually accumulated, not on every nightly. */
  def nightlyCompact(spark: SparkSession,
      specs: Seq[(String, String, Double)]): DataFrame = {
    import spark.implicits._
    val unknown = specs.map(_._2).filterNot(compactors.contains).distinct
    require(unknown.isEmpty,
      s"unknown compaction families ${unknown.mkString(", ")} — " +
        s"expected one of ${compactors.keys.toSeq.sorted.mkString(", ")}")
    // every spec validated BEFORE anything compacts — a bad threshold
    // mid-list must not leave the store half-compacted with the audit
    // of the applied half never returned (the nightly() contract)
    specs.foreach { case (dir, _, threshold) =>
      require(threshold >= 0.0, s"negative threshold $threshold for $dir")
    }
    specs.map { case (dir, family, threshold) =>
      val frac = tombstoneFraction(spark, dir, family)
      // HALF_UP like Spark's and DuckDB's round(), NOT math.rint's
      // half-even — the audited fraction must hash-match the oracle.
      // The decision compares the SAME rounded value the audit row
      // records, so the report always explains the decision.
      val frac4 = BigDecimal(frac)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val due = frac4 > 0.0 && frac4 >= threshold
      if (due) compactors(family)._1(spark, dir)
      (dir, family, frac4, due)
    }.toDF("dir", "family", "fraction", "compacted")
  }
}
