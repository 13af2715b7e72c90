package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** `schema`: pass the corpus schema when known — inference costs one
    * extra full pass over the range, which is prohibitive at corpus
    * scale (the reference's JSON layout is fixed, so production callers
    * always know it). */
  def read(spark: SparkSession, path: String, start: Long = 1,
      end: Option[Long] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    val numbered = lines.rdd.zipWithIndex().map { case (l, i) => (i + 1, l) }
      .toDF("row_num", "line")
    val ranged = numbered.filter(col("row_num") >= start &&
      end.map(e => col("row_num") <= e).getOrElse(lit(true)))
    val lineSchema = schema.getOrElse(
      spark.read.json(ranged.select("line")
        .as[String](org.apache.spark.sql.Encoders.STRING)).schema)
    ranged.select(col("row_num"), from_json(col("line"), lineSchema).as("j"))
      .select(col("row_num"), col("j.*"))
      .withColumn("file_name",
        TextFunctions.fileName(col("title"), col("row_num")))
  }
}
