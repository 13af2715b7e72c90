package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
  * step a pretraining pipeline runs over a corpus sample before any
  * token budget in the rest of the pipeline means anything. The
  * reference pipeline consumes pre-embedded blocks and never trains a
  * tokenizer, but a 100 TB corpus engine has to: merge rules are the
  * corpus-derived artifact everything downstream (token counts, pack
  * budgets, dedup shingles over token ids) keys on.
  *
  * Algorithm, exactly as published: words (the whitespace tokenizer
  * over normalized text — the engine-wide token contract) split to
  * character symbols plus a terminal `</w>` marker; repeatedly count
  * adjacent symbol pairs weighted by word frequency, merge the most
  * frequent pair everywhere, `numMerges` times. Ties break
  * deterministically: count desc, then (left, right) lexicographic asc
  * — so the merge list is a pure function of the corpus.
  *
  * Scale shape: ONE corpus-wide shuffle total (the word-count groupBy —
  * map-side combined, output is the VOCABULARY). Every iteration after
  * that runs on the vocabulary frame: pair explode + groupBy (narrow,
  * vocab-bounded), a 1-row bounded collect of the winning pair (the
  * codebook-literal pattern), and a codegen'd aggregate() fold that
  * rewrites each word's symbol array in place — no UDF, no driver-side
  * corpus state. Lineage is cut with localCheckpoint every iteration
  * (vocab-sized blocks, reclaimed by the ContextCleaner); at 100 TB
  * train on a [[Curate.stratifiedSample]] of the corpus like every
  * production tokenizer run does — the trainer's cost is then
  * sample-bounded end to end.
  */
object Bpe {

  /** End-of-word marker: a symbol outside the `[A-Za-z0-9]+` word
    * alphabet, so it can never collide with a character symbol or a
    * merged run of them. */
  val EndOfWord = "</w>"

  /** (word, n) frequencies under the engine token contract. */
  private def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(T.wsTokens(T.normText(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Initial symbol sequence of a word: characters, then `</w>`. */
  private def charSymbols(w: org.apache.spark.sql.Column) =
    concat(transform(
      sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
      array(lit(EndOfWord)))

  /** Adjacent-pair frequencies of a (syms, n) vocabulary frame,
    * weighted by word count. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("left"),
          element_at(col("syms"), i + 1).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum("n").as("freq"))

  /** Greedy left-to-right merge of adjacent (a, b) occurrences in a
    * symbol array — the reference implementation's scan order: after a
    * merge the joined symbol is `a+b`, which cannot immediately
    * re-merge as the LEFT of another (a, b) unless a+b == a (impossible
    * for non-empty b). Pure Catalyst fold, codegen'd. */
  private def mergePair(syms: org.apache.spark.sql.Column,
      a: String, b: String) =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** The step-0 pair table: adjacent-symbol frequencies over the
    * char-split corpus vocabulary — the distribution the first merge
    * argmaxes over. Exposed for cross-engine verification (the
    * iterative trainer has no SQL form; its first step does). */
  def initialPairs(df: DataFrame, textCol: String): DataFrame =
    pairCounts(wordCounts(df, textCol)
      .select(charSymbols(col("w")).as("syms"), col("n")))

  /** Train `numMerges` merge rules over the corpus. Returns the ordered
    * rule list (step, left, right, merged, freq) — step is 1-based
    * merge order; stops early (fewer rows) when no pair occurs twice.
    * `minFreq` (default 2) is the published stopping rule: a pair seen
    * once carries no generalization. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2L): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    require(minFreq >= 1, "minFreq must be at least 1")
    val spark = df.sparkSession
    var vocab = wordCounts(df, textCol)
      .select(charSymbols(col("w")).as("syms"), col("n"))
      .localCheckpoint()
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= numMerges && !done) {
      // bounded collect: exactly one row — the argmax pair
      val top = pairCounts(vocab)
        .orderBy(col("freq").desc, col("left"), col("right"))
        .limit(1).collect()
      top.headOption.filter(_.getLong(2) >= minFreq) match {
        case None => done = true
        case Some(r) =>
          val (a, b, f) = (r.getString(0), r.getString(1), r.getLong(2))
          rules += ((step, a, b, a + b, f))
          vocab = vocab
            .select(mergePair(col("syms"), a, b).as("syms"), col("n"))
            .localCheckpoint()
          step += 1
      }
    }
    spark.createDataFrame(rules.result())
      .toDF("step", "left", "right", "merged", "freq")
  }

  /** The trained subword vocabulary implied by a merge list over a
    * corpus: every distinct symbol in the post-merge word forms, with
    * summed occurrence counts — what a downstream embedder sizes its
    * input layer on. */
  def vocabulary(df: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val applied = encode(df, textCol, collectRules(merges))
    applied.select(explode(col("syms")).as("symbol"), col("n"))
      .groupBy("symbol").agg(sum("n").as("n"))
  }

  private def collectRules(merges: DataFrame): Seq[(String, String)] =
    // bounded by numMerges (the trainer's own argument), never the corpus
    merges.orderBy("step").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** Encode the corpus's vocabulary under an ordered merge list:
    * (w, syms, n) — each distinct word's final symbol sequence. Merges
    * apply in rule order, each as the same codegen'd fold the trainer
    * used, so encode(train(c)) reproduces the trainer's final state
    * bit-for-bit. The fold chain's expression depth grows with the rule
    * count; beyond a few hundred rules a production encoder would move
    * to a per-partition imperative kernel — at that point this seam is
    * where it plugs in. */
  /** [[encode]] under a trained merge-rule frame (bounded collect of
    * the rule list — numMerges rows, never the corpus). */
  def encode(df: DataFrame, textCol: String, merges: DataFrame): DataFrame =
    encode(df, textCol, collectRules(merges))

  def encode(df: DataFrame, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    val base = wordCounts(df, textCol)
      .select(col("w"), charSymbols(col("w")).as("syms"), col("n"))
    rules.zipWithIndex.foldLeft(base) { case (acc, ((a, b), i)) =>
      // cut the expression tree every few rules: nested aggregate()
      // folds otherwise exceed codegen limits and fall back to
      // interpreted evaluation
      val next = acc.withColumn("syms", mergePair(col("syms"), a, b))
      if ((i + 1) % 8 == 0) next.localCheckpoint() else next
    }
  }
}
