package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.operators.Ingest

/** Structured Streaming variant of the ingest pipeline
  * (reference: embed_to_milvus.py:52-141 — the batch loop becomes an
  * unbounded query; the pending-file back-pressure becomes micro-batch
  * scheduling; restarts resume from the checkpoint instead of the
  * reference's manual start/end offsets).
  *
  * The transform stack is literally [[Ingest.pipeline]]: every stage is
  * stateless and narrow, and the exists-check is a stream-static
  * left-anti join, so the same declarative plan runs bounded or
  * unbounded.
  */
object StreamIngest {

  /** The ingest transforms over an unbounded docs stream. */
  def pipeline(docsStream: DataFrame, existing: DataFrame, dim: Int = 64,
      chunkSize: Int = 200, overlap: Int = 40): DataFrame =
    Ingest.pipeline(docsStream, existing, dim, chunkSize, overlap)

  /** File-source → rotating parquet segments, exactly-once via the
    * checkpoint; AvailableNow drains what exists then stops (swap the
    * trigger for continuous micro-batching in production). */
  def run(spark: SparkSession, srcDir: String, schema: StructType,
      existing: DataFrame, outDir: String, checkpointDir: String,
      maxRecordsPerFile: Int = 100000): StreamingQuery =
    pipeline(spark.readStream.schema(schema).parquet(srcDir), existing)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .trigger(Trigger.AvailableNow())
      .start()
}
