package graft
import org.apache.spark.sql.SparkSession

/** Dev smoke: runs the flagship `SparkEntry.entry` pipeline (the same
  * call the driver's t1 smoke makes) and prints the row count + schema. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.printSchema()
    df.show(3, 40)
    // the SQL surface injected by GraftExtensions
    println("SQL_EXT=" + spark.sql(
      "SELECT dot_product(array(1d,2d), array(3d,4d)) AS d, " +
      "size(recursive_split('aa。bb。cc', 6, 0)) AS n").collect().mkString)
    spark.stop()
  }
}
