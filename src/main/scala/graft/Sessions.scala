package graft

import org.apache.spark.sql.SparkSession

/** The ONE local SparkSession recipe Bench, Verify, and Scale share.
  * These three mains must run identical session configs or their
  * numbers stop being comparable (nanosAsLong and the UTC pin were each
  * added in a past round — a main left behind would silently read
  * different data). `SPARK_GRAFT_CPUS` sizes both the master and
  * `spark.sql.shuffle.partitions` (32 on the graded box, not Spark's
  * default 200 — at local scale 200 tiny partitions cost more
  * scheduling than they buy parallelism). */
object Sessions {
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
