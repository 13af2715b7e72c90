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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.printSchema()
    df.show(3, 40)
    spark.stop()
  }
}
