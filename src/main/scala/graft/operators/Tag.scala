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

  /** Rerank mode-score weights [dense, sparse, colbert] — the
    * reference's rerank_weights (baai_m3_simple_server/
    * m3_server_v2.py:24), applied as FlagEmbedding's
    * weights_for_different_modes: the fused 'colbert+sparse+dense'
    * score is the weighted mean of the three mode scores. */
  val RerankWeights: Seq[Double] = Seq(0.4, 0.2, 0.4)

  /** STUB cross-encoder call — one batch of (query, passage) sentence
    * pairs in, one fused relevance score per pair out (the reference's
    * m3Wrapper.rerank, m3_server_v2.py:63-77: BAAI-M3 compute_score
    * with weights_for_different_modes). Deterministic: each mode score
    * (dense, sparse, colbert) is an exact md5 function of the pair —
    * tag + '#' + query + U+001F + passage, first 8 hex digits mod
    * 1000001 over 10⁶ → [0, 1] — so the fused weighted mean is
    * bit-reproducible in SQL and the whole rerank path oracles like
    * q_llm_tag; a real client swaps in one HTTP POST per batch here
    * and nothing else changes. A null query or passage scores null
    * (md5(NULL) → NULL — row SQL semantics), never a crash. */
  def stubRerankCall(pairs: Seq[(String, String)],
      weights: Seq[Double] = RerankWeights): Seq[java.lang.Double] = {
    require(weights.size == 3, s"need [dense, sparse, colbert] weights, got $weights")
    val Seq(wd, ws, wc) = weights
    val denom = wd + ws + wc
    require(denom > 0, s"rerank weights must not sum to zero: $weights")
    // one digest instance per call — digest() resets it, so the three
    // mode hashes per pair reuse it instead of allocating 3×|batch|
    val md = java.security.MessageDigest.getInstance("MD5")
    pairs.map {
      case (q, p) if q != null && p != null =>
        val key = q + "\u001f" + p
        def mode(tag: String): Double = {
          val d = md.digest((tag + "#" + key).getBytes("UTF-8"))
          val hex = d.take(4).map("%02x".format(_)).mkString
          (java.lang.Long.parseLong(hex, 16) % 1000001L) / 1000000.0
        }
        java.lang.Double.valueOf(
          (wd * mode("d") + ws * mode("s") + wc * mode("c")) / denom)
      case _ => null
    }
  }

  /** The batched per-partition pair-scoring seam: (qid, id, query,
    * passage) rows BY POSITION → fixed-size batches → one
    * [[stubRerankCall]] per batch → (qid, id, ce_score) with qid/id
    * keeping their NATIVE types (the tokenizeStream convention — a
    * cast would silently NULL non-numeric ids). Works on batch and
    * streaming frames (row-typed mapPartitions, stateless). */
  def rerankPairs(in: DataFrame, weights: Seq[Double] = RerankWeights,
      batchSize: Int = 32): DataFrame = {
    import org.apache.spark.sql.Encoders
    val outSchema = StructType(Seq(
      in.schema(0), in.schema(1),
      StructField("ce_score", DoubleType, nullable = true)))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = stubRerankCall(
          batch.map(r => (r.getString(2), r.getString(3))), weights)
        batch.iterator.zip(scores.iterator).map { case (r, sc) =>
          Row(r.get(0), r.get(1), sc) }
      }
    }(Encoders.row(outSchema))
  }

  /** The batched per-partition model seam over (id, prompt) rows —
    * shared by [[tag]] (bare text prompts) and [[chatTag]] (assembled
    * chat requests). Ids keep their NATIVE type through the seam (the
    * engine-wide convention — a long cast would silently NULL
    * non-numeric ids); row-typed mapPartitions, so the seam is also
    * stream-safe. */
  private def tagPrompts(in: DataFrame, batchSize: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val outSchema = StructType(Seq(
      in.schema(0).copy(name = "id"),
      StructField("label", StringType, nullable = false)))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(_.getString(1))
        val tags = stubModelCall(texts)
        batch.iterator.zip(tags.iterator).map { case (r, tg) => Row(r.get(0), tg) }
      }
    }(Encoders.row(outSchema))
  }

  /** Tag each row's `textCol` with a label via the batched model seam. */
  def tag(df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 32): DataFrame =
    tagPrompts(df.select(col(idCol), col(textCol)), batchSize)

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
      df.select(col(idCol),
        chatDigestInput(chatMessages(col(queryCol), sys, hist)).as("prompt")),
      batchSize)
  }
}
