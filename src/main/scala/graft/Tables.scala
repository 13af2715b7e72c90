package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-provided parquet star schema.
  *
  * The reference reads JSONL / HDFS directories batch-by-batch with
  * hand-rolled prefetch threads (load_data/hdfs_batch_reader.py:12-60);
  * on Spark a multi-file `spark.read.parquet` already schedules and
  * prefetches splits per-partition, so the "batch reader" collapses to
  * a plain scan whose batches are Spark partitions.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
