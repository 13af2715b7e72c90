package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev-only): comma-separated query-name filter
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // ADVICE r11: stale _FAILED markers from a previous run must not
    // outlive the failure — a fixed query would otherwise report both OK
    // (fresh parquet) and FAIL (old marker). Wipe the dir up front; the
    // per-query delete below covers filtered (`only`) re-runs too.
    val failDirPath = Paths.get(s"$outDir/_FAILED")
    if (Files.isDirectory(failDirPath)) {
      val entries = Files.list(failDirPath)
      try entries.forEach { p =>
        if (only.forall(_.contains(p.getFileName.toString)))
          Files.deleteIfExists(p)
      } finally entries.close()
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // operators cache() internal sub-plans; drop them between queries
      // so 40 queries' worth of cache blocks don't accumulate in one JVM
      spark.catalog.clearCache()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // a failed query must leave a VISIBLE artifact: with stderr alone
        // the driver's correctness report simply has no row for it, and a
        // shrinking query set looks identical to a never-registered query
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val failDir = Paths.get(s"$outDir/_FAILED")
        Files.createDirectories(failDir)
        Files.writeString(failDir.resolve(name),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
