package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RecursiveSplit
import graft.functions.VectorFunctions

/** Text chunking — the reference's splitter family re-expressed as
  * narrow Spark transforms (no shuffle: chunking is per-row).
  *
  * - fixed: config.json Splitter (chunk_size / overlap) semantics.
  * - recursive: splite_text/lang_chain_splitter.py — separator
  *   hierarchy, keep_separator=False.
  * - semantic: splite_text/semantic_splitter.py — sentence split +
  *   embedding-distance breakpoints.
  */
object Chunker {

  /** Separator hierarchy from lang_chain_splitter.py:17. */
  val defaultSeparators: Seq[String] = RecursiveSplit.defaultSeparators

  /** Fixed-width chunks with overlap, as a pure Catalyst expression:
    * offsets 0, stride, 2·stride … (stride = size − overlap), each chunk
    * `substr(text, off+1, size)`. Empty text yields no chunks. */
  def fixedChunkArray(text: Column, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0, got $size/$overlap")
    val stride = size - overlap
    val offsets = when(length(text) > 0,
      sequence(lit(0), floor((length(text) - 1) / stride).cast("int")))
      .otherwise(array().cast("array<int>"))
    transform(offsets, i => text.substr(i * stride + 1, lit(size)))
  }

  /** Explode a document table into (…, block_id, content) chunk rows —
    * the (file_id, block_id, content) layout of embed_to_milvus.py:93-99. */
  def fixedChunks(df: DataFrame, textCol: String, size: Int, overlap: Int): DataFrame =
    df.select(col("*"), posexplode(fixedChunkArray(col(textCol), size, overlap))
        .as(Seq("block_id", "content")))
      .drop(textCol)

  /** Recursive character splitter (lang_chain_splitter.py:6-34): split on
    * the first separator present, greedily merge pieces up to `size`
    * re-joined with that separator, recurse into oversize pieces with the
    * remaining separators, and carry `overlap` characters of context
    * between adjacent chunks. Implemented as the native Catalyst
    * expression [[org.apache.spark.sql.graft.RecursiveSplit]] (no UDF
    * encoder round-trip; also SQL-callable via [[graft.GraftExtensions]]). */
  def recursiveSplit(text: String, size: Int, overlap: Int,
      separators: Seq[String] = defaultSeparators): Seq[String] =
    RecursiveSplit.split(text, size, overlap, separators)

  def recursiveChunks(df: DataFrame, textCol: String, size: Int, overlap: Int): DataFrame =
    df.select(col("*"),
        posexplode(RecursiveSplit.column(col(textCol), size, overlap))
          .as(Seq("block_id", "content")))
      .drop(textCol)

  /** Semantic chunking (splite_text/semantic_splitter.py:11-50, which
    * wraps langchain's SemanticChunker): split into sentences, embed
    * each (stub embedder), compute cosine distance between neighbours,
    * break where the per-document breakpoint threshold is exceeded,
    * then re-assemble groups. Window functions over (doc, sentence#) —
    * one shuffle on the doc id.
    *
    * `breakpoint` mirrors the reference's four threshold types
    * (semantic_splitter.py:22-33):
    *  - "percentile"         — `amount` quantile of distances (default .80)
    *  - "standard_deviation" — mean + amount·stddev (default 3.0)
    *  - "interquartile"      — mean + amount·IQR (default 1.5)
    *  - "gradient"           — `amount` quantile of the distance gradient,
    *                           applied to the gradient series (default .80)
    * `numberOfChunks` (semantic_splitter.py:34-36) overrides the
    * threshold entirely: break at the k−1 largest distances per doc,
    * yielding exactly k chunks for docs with ≥ k sentences.
    */
  def semanticChunks(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 16, breakpoint: String = "percentile",
      amount: Option[Double] = None,
      numberOfChunks: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val amt = amount.getOrElse(breakpoint match {
      case "percentile" | "gradient" => 0.80
      case "standard_deviation"      => 3.0
      case "interquartile"           => 1.5
      case other =>
        throw new IllegalArgumentException(s"unknown breakpoint type $other")
    })
    val sentencePattern = "[^。.!?！？；]+[。.!?！？；]?"
    val sents = df.select(col(idCol),
        posexplode(graft.functions.TextFunctions.allMatches(col(textCol), sentencePattern))
          .as(Seq("sent_id", "sentence")))
      .filter(length(trim(col("sentence"))) > 0)
      .withColumn("emb", VectorFunctions.fakeDenseEmbed(col("sentence"), dim))
    val w = Window.partitionBy(col(idCol)).orderBy(col("sent_id"))
    val dist =
      when(lag(col("emb"), 1).over(w).isNull, lit(0.0))
        .otherwise(lit(1.0) - VectorFunctions.cosine(col("emb"), lag(col("emb"), 1).over(w)))
    // the thresholded series: raw distances, or their gradient
    val withDist = sents.withColumn("dist", dist)
      .withColumn("sig", breakpoint match {
        case "gradient" => col("dist") - coalesce(lag(col("dist"), 1).over(w), lit(0.0))
        case _          => col("dist")
      })
    val broken = numberOfChunks match {
      case Some(k) =>
        // break at the k-1 largest inter-sentence distances (never at the
        // first sentence, whose distance is the 0.0 placeholder)
        val byDist = Window.partitionBy(col(idCol))
          .orderBy(col("dist").desc, col("sent_id").asc)
        withDist
          .withColumn("brk",
            when(row_number().over(byDist) <= k - 1 && col("sent_id") > 0, 1)
              .otherwise(0))
      case None =>
        val thrExpr = breakpoint match {
          case "percentile" | "gradient" => expr(s"percentile(sig, $amt)")
          case "standard_deviation" => avg(col("sig")) + lit(amt) * stddev_pop(col("sig"))
          case "interquartile" =>
            avg(col("sig")) +
              lit(amt) * (expr("percentile(sig, 0.75)") - expr("percentile(sig, 0.25)"))
        }
        val thresholds = withDist.groupBy(col(idCol)).agg(thrExpr.as("thr"))
        withDist.join(thresholds, idCol)
          .withColumn("brk", when(col("sig") > col("thr"), 1).otherwise(0))
    }
    broken
      .withColumn("grp", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("grp"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("sent_id"), col("sentence")))),
          s => s.getField("sentence")), " ").as("content"),
        count(lit(1)).as("n_sentences"))
      .withColumnRenamed("grp", "block_id")
  }
}
