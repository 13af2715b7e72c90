package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM tagging stage (llm/qwen_api.py): the reference calls a Qwen HTTP
  * endpoint per batch of texts to label them. The model is external, so
  * here the call sits behind the same batched per-partition seam as the
  * embedder: partition iterator → fixed-size batches → one "model call"
  * per batch → labels zipped back. Batch size bounds in-flight request
  * payload; task retries replace the reference's hand-rolled retry loop.
  */
object Tag {

  val labels: Seq[String] = Seq("news", "tech", "finance", "sports", "other")

  /** STUB model call — one batch in, one label per text out.
    * Deterministic (md5 of the text picks the label) so specs are exact;
    * a real client swaps in an HTTP POST here and nothing else changes.
    * Null text labels as "other" — the same row SQL NULL semantics
    * produce (md5(NULL) → NULL → CASE falls through), not a crash. */
  def stubModelCall(batch: Seq[String]): Seq[String] =
    batch.map {
      case null => labels.last
      case t =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        labels(math.floorMod(d(0).toInt, labels.size))
    }

  /** Tag each row's `textCol` with a label via the batched model seam. */
  def tag(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("label", StringType, nullable = false)))
    val in = df.select(col(idCol).cast("long"), col(textCol))
    val rdd = in.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(_.getString(1))
        val tags = stubModelCall(texts)
        batch.iterator.zip(tags.iterator).map { case (r, tg) => Row(r.getLong(0), tg) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
