package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** JSONL corpus source with the reference's row-range semantics
  * (load_data/json_batch_reader.py:16-86): read [start, end] (1-based,
  * inclusive), and synthesize `file_name = clean_title(title)_{row}.pdf`
  * keyed by the global row number.
  *
  * Global row numbers need a total order; JSONL has none, so we derive
  * it from (file, byte offset) via a zipWithIndex over the textual
  * lines — deterministic for a single file, which is the reference's
  * contract. Batch iteration disappears: partitions are the batches.
  */
object JsonlSource {

  def read(spark: SparkSession, path: String, start: Long = 1,
      end: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val numbered = lines.rdd.zipWithIndex().map { case (l, i) => (i + 1, l) }
      .toDF("row_num", "line")
    val ranged = numbered.filter(col("row_num") >= start &&
      end.map(e => col("row_num") <= e).getOrElse(lit(true)))
    val parsed = spark.read.json(ranged.select("line").as[String](org.apache.spark.sql.Encoders.STRING))
    // re-join parsed fields with row numbers via a second parse pass that
    // keeps the pairing (from_json on the numbered lines)
    val schema = parsed.schema
    ranged.select(col("row_num"), from_json(col("line"), schema).as("j"))
      .select(col("row_num"), col("j.*"))
      .withColumn("file_name",
        TextFunctions.fileName(col("title"), col("row_num")))
  }
}
