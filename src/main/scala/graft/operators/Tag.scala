package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** The reference's default system prompt (qwen_api.py:23). */
  val DefaultSystem: String = "你是一个数据处理打标专家。"

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

  /** The batched per-partition model seam over (id, prompt) rows —
    * shared by [[tag]] (bare text prompts) and [[chatTag]] (assembled
    * chat requests). */
  private def tagPrompts(in: DataFrame, batchSize: Int): DataFrame = {
    val spark = in.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("label", StringType, nullable = false)))
    val rdd = in.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(_.getString(1))
        val tags = stubModelCall(texts)
        batch.iterator.zip(tags.iterator).map { case (r, tg) => Row(r.getLong(0), tg) }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Tag each row's `textCol` with a label via the batched model seam. */
  def tag(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 32): DataFrame =
    tagPrompts(df.select(col(idCol).cast("long"), col(textCol)), batchSize)

  /** The (role, content) message array for one chat call — the
    * reference's request assembly (qwen_api.py:29-41) as a pure Catalyst
    * expression, so it runs as a narrow columnar pass beside the rows it
    * labels: an explicit `system` else [[DefaultSystem]]; each history
    * (q, a) pair expands to user+assistant messages UNLESS its q IS the
    * row's query (the reference skips the self-pair, null-safe here);
    * the query is the final user message. `history` is
    * array<struct<q, a>> and may be null (no history). */
  def chatMessages(query: Column, system: Column, history: Column): Column = {
    def msg(role: String, content: Column) =
      struct(lit(role).as("role"), content.as("content"))
    val hist = coalesce(history, array().cast("array<struct<q:string,a:string>>"))
    val histMsgs = flatten(transform(
      filter(hist, h => !(h.getField("q") <=> query)),
      h => array(msg("user", h.getField("q")), msg("assistant", h.getField("a")))))
    concat(
      array(msg("system", coalesce(system, lit(DefaultSystem)))),
      histMsgs,
      array(msg("user", query)))
  }

  /** Canonical serialization of a message array for the deterministic
    * stub: role, unit separator (U+001F), content, record separator
    * (U+001E) per message — separators no document text contains, and
    * byte-reproducible in SQL (chr(31)/chr(30)), so the WHOLE assembled
    * request is oracle-checked end to end, not just the query text. */
  def chatDigestInput(messages: Column): Column =
    aggregate(messages, lit(""), (acc, m) =>
      concat(acc, m.getField("role"), lit("\u001f"),
        m.getField("content"), lit("\u001e")))

  /** Chat-tag each row: assemble the full request ([[chatMessages]]) —
    * system override, history expansion, req params — and label it
    * through the same batched seam as [[tag]]. `params` are the
    * per-call constants the reference's req_dic carries
    * (qwen_api.py:14-21, merged with caller req_params); the stub is a
    * function of the messages alone, exactly as the reference's
    * temperature-0 call is, while a real client would POST
    * (params, messages) per batch. */
  def chatTag(df: DataFrame, idCol: String, queryCol: String,
      systemCol: Option[String] = None, historyCol: Option[String] = None,
      params: Map[String, String] = Map(
        "model" -> "qwen3-14b", "max_tokens" -> "1000",
        "temperature" -> "0", "frequency_penalty" -> "0.1", "top_p" -> "0.1"),
      batchSize: Int = 32): DataFrame = {
    require(params.nonEmpty, "chat params must carry the model name")
    val sys = systemCol.map(col).getOrElse(lit(null).cast("string"))
    val hist = historyCol.map(col)
      .getOrElse(lit(null).cast("array<struct<q:string,a:string>>"))
    tagPrompts(
      df.select(col(idCol).cast("long"),
        chatDigestInput(chatMessages(col(queryCol), sys, hist)).as("prompt")),
      batchSize)
  }
}
