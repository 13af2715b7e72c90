package graft
import org.apache.spark.sql.SparkSession

/** Dev timing probe: run named SparkEntry queries against a given sf
  * dir, print per-query seconds (and the formatted plan with -explain). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val clear = args.contains("-clear")
    names.foreach { name =>
      if (clear) spark.catalog.clearCache()
      val fn = SparkEntry.queries(name)
      // build INSIDE the timing: iterative operators (dupClusters) run
      // actions during construction, same contract as Bench. With
      // -explain the query is built (and for iterative operators,
      // executed) once for the plan dump — timings in that mode measure
      // a second run and are only indicative.
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (explain) df.explain("formatted")
      val n = df.count()
      println(f"PROBE $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
