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

  /** Semantic chunking (splite_text/semantic_splitter.py:18-55): split
    * into sentences, embed each (stub embedder), compute cosine distance
    * between neighbours, break where distance exceeds the per-document
    * `pct` percentile, then re-assemble groups. Window functions over
    * (doc, sentence#) — one shuffle on the doc id. */
  def semanticChunks(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 16, pct: Double = 0.80): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sentencePattern = "[^。.!?！？；]+[。.!?！？；]?"
    val sents = df.select(col(idCol),
        posexplode(graft.functions.TextFunctions.allMatches(col(textCol), sentencePattern))
          .as(Seq("sent_id", "sentence")))
      .filter(length(trim(col("sentence"))) > 0)
      .withColumn("emb", VectorFunctions.fakeDenseEmbed(col("sentence"), dim))
    val w = Window.partitionBy(col(idCol)).orderBy(col("sent_id"))
    val withDist = sents
      .withColumn("dist",
        when(lag(col("emb"), 1).over(w).isNull, lit(0.0))
          .otherwise(lit(1.0) - VectorFunctions.cosine(col("emb"), lag(col("emb"), 1).over(w))))
    val thresholds = withDist.groupBy(col(idCol))
      .agg(expr(s"percentile(dist, $pct)").as("thr"))
    withDist.join(thresholds, idCol)
      .withColumn("brk", when(col("dist") > col("thr"), 1).otherwise(0))
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
