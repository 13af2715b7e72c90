package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Sketch-based corpus profiling — the scan a training-data pipeline
  * runs BEFORE configuring dedup/filter thresholds (how big is the
  * vocabulary? where do token counts sit?). Exact distinct counts over
  * 100 TB of tokens would shuffle the token stream; the sketches keep
  * everything mergeable and map-side:
  *
  *  - approx_count_distinct = HyperLogLog++ (fixed ~KB of state per
  *    group, mergeable across partitions, ~2% default error)
  *  - percentile_approx    = a mergeable quantile summary over the
  *    per-doc token counts
  *
  * Both are Spark-native partial aggregates, so each profile column is
  * computed with map-side combine — the shuffle moves sketches, not
  * tokens.
  */
object Stats {

  /** Exact per-group corpus stats — the verify-scale companion to
    * [[corpusProfile]]: doc/token counts, exact vocabulary size, token
    * length extremes. Unlike the sketch profile, the exact distinct
    * shuffles the token stream — run it at audit scale or on samples;
    * at 100 TB the sketch is the right tool and this is its ground
    * truth. Groups whose docs are all empty report vocab 0. */
  def corpusStatsExact(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // feeds both the vocab branch and the stats branch — cached so the
    // scan + double tokenization run once (session clears per the
    // Dedup caching contract)
    val perDoc = df.select(col(groupCol),
      T.tokenCount(col(textCol)).cast("long").as("ntok"),
      T.wsTokens(T.normText(col(textCol))).as("toks"))
      .cache()
    val vocab = perDoc
      .select(col(groupCol), explode_outer(col("toks")).as("tok"))
      .groupBy(col(groupCol))
      .agg(count_distinct(col("tok")).as("vocab"))
    perDoc.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        round(avg(col("ntok")), 4).as("mean_tokens"),
        min(col("ntok")).as("min_tokens"),
        max(col("ntok")).as("max_tokens"))
      .join(vocab, Seq(groupCol), "left")
      .na.fill(0, Seq("vocab"))
  }

  /** Top-k most frequent tokens per group — the heavy-hitters scan that
    * surfaces boilerplate and stopwords before tuning dedup's hot-key
    * caps. Exact counts: the token groupBy is bounded by vocabulary
    * (not corpus size) with full map-side combine, and the rank prunes
    * to k per partition before the final sort (WindowGroupLimit).
    * Deterministic ties: (tf desc, token asc). */
  def topTokens(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(groupCol),
        explode(T.wsTokens(T.normText(col(textCol)))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(groupCol).orderBy(col("tf").desc, col("tok").asc)
    tf.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Per-group corpus profile: doc count, approx distinct vocabulary,
    * token-count quantiles (p50/p95), mean doc length. */
  def corpusProfile(df: DataFrame, groupCol: String, textCol: String,
      rsd: Double = 0.02): DataFrame = {
    val perDoc = df.select(col(groupCol),
      T.tokenCount(col(textCol)).cast("double").as("ntok"),
      T.wsTokens(T.normText(col(textCol))).as("toks"))
    val vocab = perDoc
      .select(col(groupCol), explode_outer(col("toks")).as("tok"))
      .groupBy(col(groupCol))
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_vocab"))
    perDoc.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile_approx(col("ntok"), lit(0.5), lit(10000)).as("p50_tokens"),
        percentile_approx(col("ntok"), lit(0.95), lit(10000)).as("p95_tokens"),
        round(avg(col("ntok")), 4).as("mean_tokens"))
      .join(vocab, groupCol)
  }
}
