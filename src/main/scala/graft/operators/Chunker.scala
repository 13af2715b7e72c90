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
    * (semantic_splitter.py:22-33), with the reference's 0-100 percentile
    * convention (an `amount` of 95 = the 95th percentile):
    *  - "percentile"         — `amount` percentile of distances (default 95)
    *  - "standard_deviation" — mean + amount·stddev (default 3.0)
    *  - "interquartile"      — mean + amount·IQR (default 1.5)
    *  - "gradient"           — `amount` percentile of the distance
    *                           gradient, applied to the gradient series
    *                           (default 95)
    * `numberOfChunks` (semantic_splitter.py:34-36) overrides the
    * threshold entirely: break at the k−1 largest distances per doc,
    * yielding exactly k chunks for docs with ≥ k sentences.
    * `bufferSize` (semantic_splitter.py:12, langchain buffer_size,
    * default 1): each sentence is embedded together with `bufferSize`
    * neighbours on each side, smoothing the distance series; 0 embeds
    * bare sentences. `minChunkSize` (semantic_splitter.py:16): a
    * breakpoint is honored only when the chunk accumulated since the
    * last honored break has at least that many characters — smaller
    * chunks merge into the following one (the trailing chunk is always
    * emitted), matching langchain's min_chunk_size skip.
    */
  def semanticChunks(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 16, breakpoint: String = "percentile",
      amount: Option[Double] = None,
      numberOfChunks: Option[Int] = None,
      bufferSize: Int = 1,
      minChunkSize: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bufferSize >= 0, s"bufferSize must be >= 0, got $bufferSize")
    val amt = amount.getOrElse(breakpoint match {
      case "percentile" | "gradient" => 95.0
      case "standard_deviation"      => 3.0
      case "interquartile"           => 1.5
      case other =>
        throw new IllegalArgumentException(s"unknown breakpoint type $other")
    })
    breakpoint match {
      case "percentile" | "gradient" =>
        require(amt >= 0 && amt <= 100,
          s"$breakpoint amount is a 0-100 percentile (reference convention), got $amt")
      case _ => ()
    }
    val sentencePattern = "[^。.!?！？；]+[。.!?！？；]?"
    val w = Window.partitionBy(col(idCol)).orderBy(col("sent_id"))
    // embed each sentence joined with its ±bufferSize neighbours
    // (langchain combine_sentences) — concat_ws skips the nulls that
    // lag/lead produce at document edges
    val neighbours = (-bufferSize to bufferSize).map {
      case 0          => col("sentence")
      case i if i < 0 => lag(col("sentence"), -i).over(w)
      case i          => lead(col("sentence"), i).over(w)
    }
    val sents = df.select(col(idCol),
        posexplode(graft.functions.TextFunctions.allMatches(col(textCol), sentencePattern))
          .as(Seq("sent_id", "sentence")))
      .filter(length(trim(col("sentence"))) > 0)
      .withColumn("emb",
        VectorFunctions.fakeDenseEmbed(concat_ws(" ", neighbours: _*), dim))
    // first surviving row per doc gets the 0.0 placeholder distance
    val isFirst = lag(col("emb"), 1).over(w).isNull
    val dist =
      when(isFirst, lit(0.0))
        .otherwise(lit(1.0) - VectorFunctions.cosine(col("emb"), lag(col("emb"), 1).over(w)))
    // the thresholded series: raw distances, or their gradient
    val withDist = sents.withColumn("first", isFirst)
      .withColumn("dist", dist)
      .withColumn("sig", breakpoint match {
        case "gradient" => col("dist") - coalesce(lag(col("dist"), 1).over(w), lit(0.0))
        case _          => col("dist")
      })
    val broken = numberOfChunks match {
      case Some(k) =>
        // break at the k-1 largest inter-sentence distances. The first
        // row's 0.0 is a placeholder, not a distance — rank it below
        // every real distance (even ties at 0.0) so it can never consume
        // a top-(k-1) slot and shortchange the doc by one chunk.
        val byDist = Window.partitionBy(col(idCol))
          .orderBy(when(col("first"), lit(-1.0)).otherwise(col("dist")).desc,
            col("sent_id").asc)
        withDist
          .withColumn("brk",
            when(row_number().over(byDist) <= k - 1 && !col("first"), 1)
              .otherwise(0))
      case None =>
        val thrExpr = breakpoint match {
          case "percentile" | "gradient" => expr(s"percentile(sig, ${amt / 100.0})")
          case "standard_deviation" => avg(col("sig")) + lit(amt) * stddev_pop(col("sig"))
          case "interquartile" =>
            avg(col("sig")) +
              lit(amt) * (expr("percentile(sig, 0.75)") - expr("percentile(sig, 0.25)"))
        }
        val thresholds = withDist.groupBy(col(idCol)).agg(thrExpr.as("thr"))
        withDist.join(thresholds, idCol)
          .withColumn("brk", when(col("sig") > col("thr"), 1).otherwise(0))
    }
    minChunkSize match {
      case None =>
        broken
          .withColumn("grp", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col(idCol), col("grp"))
          .agg(
            array_join(transform(
              array_sort(collect_list(struct(col("sent_id"), col("sentence")))),
              s => s.getField("sentence")), " ").as("content"),
            count(lit(1)).as("n_sentences"))
          .withColumnRenamed("grp", "block_id")
      case Some(minSz) =>
        // honoring a breakpoint depends on how much text accumulated
        // since the previous honored one — a sequential per-doc fold, so
        // collect the ordered sentences per doc (the same groupBy-doc
        // shuffle the no-min path pays) and fold with aggregate()
        val folded = broken
          .groupBy(col(idCol))
          .agg(array_sort(collect_list(
            struct(col("sent_id"), col("brk"), col("sentence")))).as("xs"))
        val zero = struct(
          array().cast("array<struct<content:string,n_sentences:bigint>>").as("done"),
          lit("").as("cur"), lit(0L).as("n"))
        val chunks = aggregate(col("xs"), zero,
          (st, x) => {
            val startNew = x.getField("brk") === 1 &&
              length(st.getField("cur")) >= minSz
            val closed = struct(st.getField("cur").as("content"),
              st.getField("n").as("n_sentences"))
            when(startNew,
              struct(concat(st.getField("done"), array(closed)).as("done"),
                x.getField("sentence").as("cur"), lit(1L).as("n")))
            .otherwise(
              struct(st.getField("done").as("done"),
                when(st.getField("n") === 0, x.getField("sentence"))
                  .otherwise(concat(st.getField("cur"), lit(" "), x.getField("sentence")))
                  .as("cur"),
                (st.getField("n") + 1).as("n")))
          },
          st => when(st.getField("n") > 0,
              concat(st.getField("done"), array(struct(
                st.getField("cur").as("content"), st.getField("n").as("n_sentences")))))
            .otherwise(st.getField("done")))
        folded.select(col(idCol), posexplode(chunks).as(Seq("block_id", "chunk")))
          .select(col(idCol), col("block_id").cast("long").as("block_id"),
            col("chunk.content").as("content"),
            col("chunk.n_sentences").as("n_sentences"))
    }
  }
}
