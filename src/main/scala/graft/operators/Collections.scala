package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Milvus partition surface (create_partition / partition_names on
  * search and query), mapped onto the construct Spark already optimizes
  * end-to-end: directory partitioning. A Milvus partition is a named
  * shard of one collection that inserts target and searches prune to;
  * a parquet table partitioned by the same key IS that — the partition
  * value lives in the directory name, a `partition_names` restriction
  * becomes an `isin` filter the scan turns into PartitionFilters, and
  * the files of unnamed partitions are never opened. At 100 TB this is
  * the difference between reading one tenant/day/language slice and
  * reading the corpus; no custom machinery survives contact with a
  * simpler plan, so none is used.
  *
  * (The reference's collection is unpartitioned — pymilvus defaults to
  * `_default` — so this surface is Milvus-parity beyond the reference's
  * own usage, not a reference behavior.)
  */
object Collections {

  /** Write `df` as a partitioned collection: one directory per
    * distinct `partCol` value. Inserts into a partition are appends of
    * new files under its directory — concurrent writers to DIFFERENT
    * partitions never touch the same files. */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)

  /** The collection's partition names — Milvus list_partitions. Reads
    * the directory structure only (a partition-column-only scan plans
    * against file metadata, no data pages). */
  def listPartitions(spark: SparkSession, dir: String,
      partCol: String): DataFrame =
    spark.read.parquet(dir).select(partCol).distinct()

  /** Read a collection restricted to `parts` — the partition_names
    * parameter of Milvus query/search. The `isin` filter on the
    * partition column compiles to PartitionFilters: pruning happens at
    * the file listing, before any read. Empty `parts` = all partitions
    * (the Milvus default). */
  def readPartitions(spark: SparkSession, dir: String, partCol: String,
      parts: Seq[Any]): DataFrame = {
    val all = spark.read.parquet(dir)
    if (parts.isEmpty) all else all.filter(col(partCol).isin(parts: _*))
  }

  /** Insert rows into one named partition — collection.insert(...,
    * partition_name=...). The batch lands as new files under that
    * partition's directory only; concurrent inserts into different
    * partitions never touch the same files, and no existing file is
    * rewritten. `df` must not already carry the partition column (the
    * name names the partition; a conflicting column would be
    * ambiguous). */
  def insertIntoPartition(df: DataFrame, dir: String, partCol: String,
      value: Any): Unit = {
    require(!df.columns.contains(partCol),
      s"batch already carries $partCol — drop it; partition is named by `value`")
    df.withColumn(partCol, lit(value))
      .write.mode("append").partitionBy(partCol).parquet(dir)
  }

  /** Drop one partition — Milvus drop_partition: delete its directory,
    * leave every other partition's files untouched. The directory name
    * is derived with Spark's own partition-path escaping, so values
    * containing '/', ':', spaces, etc. — and null (which Spark writes
    * as `__HIVE_DEFAULT_PARTITION__`) — resolve to the directory the
    * writer actually produced. */
  def dropPartition(spark: SparkSession, dir: String, partCol: String,
      value: Any): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val leaf = ExternalCatalogUtils.getPartitionPathString(
      partCol, Option(value).map(_.toString).orNull)
    val p = new org.apache.hadoop.fs.Path(dir, leaf)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.catalog.refreshByPath(dir)
    require(fs.delete(p, true) || !fs.exists(p),
      s"failed to delete partition $p")
  }

  /** Exact top-k search over named partitions — collection.search(...,
    * partition_names=parts). Identical ranking semantics to
    * [[Ann.bruteForceTopK]]; the corpus side is the partition-pruned
    * scan, so per-query work is |named partitions|, not |collection|. */
  def searchPartitions(spark: SparkSession, dir: String, partCol: String,
      parts: Seq[Any], queries: DataFrame, k: Int,
      metric: String = "cosine"): DataFrame =
    Ann.bruteForceTopK(
      readPartitions(spark, dir, partCol, parts).select("id", "v"),
      queries, k, metric)
}
