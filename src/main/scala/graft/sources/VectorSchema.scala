package graft.sources

import org.apache.spark.sql.types._

/** The reference's Milvus collection schema (embed_to_milvus.py:233-247,
  * vector_database/milvus_connector.py:49-63): the bulk-load row layout
  * every ingest segment must carry. dense_embedding is FLOAT_VECTOR
  * (dim configurable; reference uses 1024), sparse_embedding is
  * SPARSE_FLOAT_VECTOR → map<int,float> after util/clean_data.py:27's
  * key int-ification.
  */
object VectorSchema {
  val denseDim = 1024

  val schema: StructType = StructType(Seq(
    StructField("qa_id", LongType, nullable = false),
    StructField("question", StringType, nullable = false),
    StructField("answer", StringType, nullable = false),
    StructField("file_id", LongType, nullable = false),
    StructField("block_id", LongType, nullable = false),
    StructField("file_name", StringType, nullable = false),
    StructField("content", StringType, nullable = false),
    StructField("dense_embedding", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("sparse_embedding", MapType(IntegerType, DoubleType, valueContainsNull = false), nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("flag", StringType, nullable = false)))
}
