package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

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
    // scan + double tokenization run once; registered so
    // CacheLifecycle.release(result) frees it
    val perDoc = df.select(col(groupCol),
      T.tokenCount(col(textCol)).cast("long").as("ntok"),
      T.wsTokens(T.normText(col(textCol))).as("toks"))
      .cache()
    val vocab = perDoc
      .select(col(groupCol), explode_outer(col("toks")).as("tok"))
      .groupBy(col(groupCol))
      .agg(count_distinct(col("tok")).as("vocab"))
    CacheLifecycle.handOff(
      perDoc.groupBy(col(groupCol))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("n_tokens"),
          round(avg(col("ntok")), 4).as("mean_tokens"),
          min(col("ntok")).as("min_tokens"),
          max(col("ntok")).as("max_tokens"))
        .join(vocab, Seq(groupCol), "left")
        .na.fill(0, Seq("vocab")),
      Seq(perDoc))
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

  /** Per-doc n-gram novelty against a previous snapshot — the crawl
    * monitor [[graft.operators.Curate.corpusDiff]] can't give: the
    * exact diff says WHICH docs changed; novelty says how much
    * genuinely NEW n-gram mass each doc carries (a re-crawl that
    * lightly rewrites boilerplate scores near 0 even though every doc
    * reads "changed"). One row per new-side doc: (id, n_shingles,
    * n_novel, novelty_rate 4dp) over distinct w-char shingles (the
    * dedup families' md5-slice hash space) absent from the ENTIRE old
    * snapshot.
    *
    * Scale shape: both sides collapse to distinct 32-bit shingle
    * hashes at scan (text never shuffles); the old side pre-collapses
    * to its distinct hash set — the join is bounded by distinct-
    * shingle cardinality, the dedup shuffle's own shape. */
  def noveltyScore(newDf: DataFrame, oldDf: DataFrame, idCol: String,
      textCol: String, w: Int = 13): DataFrame = {
    val ns = Dedup.shingleHashSet(newDf, idCol, textCol, w, None)
    val os = Dedup.shingleHashSet(oldDf, idCol, textCol, w, None)
      .select("h").distinct().withColumn("__seen", lit(true))
    ns.join(os, Seq("h"), "left_outer")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_rate",
        round(col("n_novel").cast("double") / col("n_shingles"), 4))
  }

  /** Token-distribution drift between two corpus snapshots — the
    * monitoring scan next to [[graft.operators.Curate.corpusDiff]] in
    * an incremental pipeline ("today's crawl re-weighted which
    * words?"): one row per token in EITHER side's exact top-k —
    * (tok, tf_old, tf_new, p_old, p_new, delta), relative frequencies
    * and their shift rounded 6dp (missing side counts as 0). A big
    * |delta| on a head token flags a source-mix change or boilerplate
    * surge before it reaches training; [[graft.operators.Bpe.coverage]]
    * is the tokenizer-side view of the same drift.
    *
    * Scale shape: both frequency tables are vocabulary-bounded
    * groupBys with full map-side combine (the [[topTokens]] argument);
    * top-k is a TakeOrdered (deterministic ties: tf desc, tok asc),
    * never a corpus sort; the final joins are k-bounded and the two
    * total counts ride single-row broadcasts. Nothing in the plan
    * scales with anything but vocabulary size. */
  def tokenDrift(oldDf: DataFrame, newDf: DataFrame, textCol: String,
      k: Int = 100): DataFrame = {
    // each side feeds its top-k AND the key join — cached so the scan +
    // tokenization run once per side; registered at the hand-off so
    // CacheLifecycle.release(result) frees both
    def freq(df: DataFrame) = df
      .select(explode(T.wsTokens(T.normText(col(textCol)))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .cache()
    val fo = freq(oldDf)
    val fn = freq(newDf)
    val keys = fo.orderBy(col("tf").desc, col("tok").asc).limit(k)
      .select("tok")
      .unionByName(fn.orderBy(col("tf").desc, col("tok").asc).limit(k)
        .select("tok"))
      .distinct()
    val totO = fo.agg(coalesce(sum("tf"), lit(0L)).as("__tot_old"))
    val totN = fn.agg(coalesce(sum("tf"), lit(0L)).as("__tot_new"))
    CacheLifecycle.handOff(
      keys
        .join(fo.withColumnRenamed("tf", "tf_old"), Seq("tok"), "left")
        .join(fn.withColumnRenamed("tf", "tf_new"), Seq("tok"), "left")
        .na.fill(0L, Seq("tf_old", "tf_new"))
        .crossJoin(broadcast(totO)).crossJoin(broadcast(totN))
        .select(col("tok"), col("tf_old"), col("tf_new"),
          round(col("tf_old").cast("double") /
            greatest(col("__tot_old"), lit(1L)), 6).as("p_old"),
          round(col("tf_new").cast("double") /
            greatest(col("__tot_new"), lit(1L)), 6).as("p_new"))
        .withColumn("delta", round(col("p_new") - col("p_old"), 6)),
      Seq(fo, fn))
  }

  /** Per-dimension mean of an embedding column — the drift monitors'
    * shared aggregation, optionally keyed by extra group columns (the
    * [[embeddingDriftBy]] strata). The posexplode keys on at most
    * groups×dim distinct values, so the partial aggregate collapses
    * each input partition to that many rows before the exchange: the
    * shuffle is key-space-bounded no matter how many vectors feed it.
    * Null vectors are skipped (they carry no components to average). */
  private def dimMeans(df: DataFrame, vecCol: String, side: String,
      keyCols: Seq[String] = Nil): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(keyCols.map(col) :+
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")): _*)
      .groupBy((keyCols :+ "dim").map(col): _*)
      .agg(avg("x").as(s"mean_$side"))

  /** One-row distribution summary of an embedding column — (n,
    * mean_norm, centroid) — the meta-sized record a trained structure
    * (IVF codebook, PQ/SQ8 scales) keeps of the distribution it was
    * FITTED on, so later drift checks compare against training time
    * instead of against a store the drift already contaminated
    * ([[graft.operators.Ann.retrainAdvisor]] reads it back). Unrounded:
    * consumers round at presentation, like [[embeddingDriftSummary]].
    * Null vectors are skipped; an empty input records (0, NULL, []). */
  private[operators] def vectorStats(df: DataFrame,
      vecCol: String): DataFrame = {
    val clean = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"))
    val base = clean.select(V.norm2(col("__v")).as("nrm"))
      .agg(count(lit(1)).as("n"), avg(col("nrm")).as("mean_norm"))
    val cent = dimMeans(clean, "__v", "c")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mean_c")))),
        e => e("mean_c")).as("centroid"))
    base.crossJoin(broadcast(cent))
  }

  /** Embedding-space drift between two corpus snapshots — the SEMANTIC
    * twin of [[tokenDrift]] in an incremental pipeline's monitoring
    * row: the token view catches lexical re-weighting, this catches a
    * re-crawl (or a swapped encoder checkpoint) shifting where the
    * corpus LIVES in embedding space before the shift reaches ANN
    * indexes trained on yesterday's geometry (IVF centroids, PQ
    * codebooks and SQ8 scales all assume a stationary distribution —
    * their recall decays silently under drift, which is exactly what
    * this scan makes visible). One row per dimension: (dim, mean_old,
    * mean_new, delta), means and shift rounded 6dp, deltas computed on
    * the unrounded means. Dimensions are full-outer joined, so a
    * snapshot pair with different widths reports NULL on the absent
    * side instead of silently dropping the extra dimensions.
    *
    * Scale shape: two [[dimMeans]] passes (shuffle = partitions×dim
    * rows each, see there) and a dim-bounded join — nothing in the
    * plan scales with corpus size. */
  def embeddingDrift(oldDf: DataFrame, newDf: DataFrame,
      vecCol: String): DataFrame =
    dimMeans(oldDf, vecCol, "old")
      .join(dimMeans(newDf, vecCol, "new"), Seq("dim"), "full_outer")
      .select(col("dim").cast("long").as("dim"),
        round(col("mean_old"), 6).as("mean_old"),
        round(col("mean_new"), 6).as("mean_new"),
        round(col("mean_new") - col("mean_old"), 6).as("delta"))

  /** [[embeddingDrift]] localized to a stratum column (source, lang,
    * label): one row per (stratum, dimension) — the drill-down that
    * turns "the corpus drifted" into "THIS source drifted" before
    * anyone re-trains a codebook over the wrong suspect. Same
    * mechanics as the global form: means 6dp, deltas on unrounded
    * means, full-outer on (stratum, dim) so a stratum present on one
    * side (a new crawl source) reports NULL on the absent side.
    *
    * Scale shape: the aggregation keys on strata×dim values — partial
    * aggregation still collapses every input partition to that many
    * rows, so the shuffle is bounded by the key-space, not the
    * corpus. */
  def embeddingDriftBy(oldDf: DataFrame, newDf: DataFrame,
      vecCol: String, groupCol: String): DataFrame = {
    def means(df: DataFrame, side: String) = dimMeans(
      df.select(col(groupCol).as("stratum"), col(vecCol)),
      vecCol, side, keyCols = Seq("stratum"))
    means(oldDf, "old")
      .join(means(newDf, "new"), Seq("stratum", "dim"), "full_outer")
      .select(col("stratum"), col("dim").cast("long").as("dim"),
        round(col("mean_old"), 6).as("mean_old"),
        round(col("mean_new"), 6).as("mean_new"),
        round(col("mean_new") - col("mean_old"), 6).as("delta"))
  }

  /** The one-row dashboard form of [[embeddingDrift]]: snapshot sizes,
    * mean vector norms (a norm shift flags an encoder or normalization
    * change even when the centroid holds still), and the cosine between
    * the two snapshot centroids (1.0 = no directional drift). All
    * rounded 6dp. Empty or all-null sides report NULL metrics (count 0)
    * rather than failing — a monitor must survive the empty first day.
    * Mismatched snapshot WIDTHS (a swapped encoder changed the
    * dimension — the loudest drift there is) report centroid_cos NULL
    * instead of a truncated-dot cosine that would read as mild drift;
    * [[embeddingDrift]] is the per-dimension view that shows WHICH
    * dimensions appeared.
    *
    * Scale shape: two single-row aggregates and two dim-bounded
    * centroid collects, crossed as single-row broadcasts — the
    * [[tokenDrift]] total-count shape. */
  def embeddingDriftSummary(oldDf: DataFrame, newDf: DataFrame,
      vecCol: String): DataFrame = {
    def stats(df: DataFrame, side: String) =
      df.filter(col(vecCol).isNotNull)
        .select(V.norm2(col(vecCol).cast("array<double>")).as("nrm"))
        .agg(count(lit(1)).as(s"n_$side"),
          avg(col("nrm")).as(s"__norm_$side"))
    def centroid(df: DataFrame, side: String) =
      dimMeans(df, vecCol, side)
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col(s"mean_$side")))),
          e => e(s"mean_$side")).as(s"__c_$side"))
    stats(oldDf, "old").crossJoin(broadcast(stats(newDf, "new")))
      .crossJoin(broadcast(centroid(oldDf, "old")))
      .crossJoin(broadcast(centroid(newDf, "new")))
      .select(col("n_old"), col("n_new"),
        round(col("__norm_old"), 6).as("mean_norm_old"),
        round(col("__norm_new"), 6).as("mean_norm_new"),
        round(col("__norm_new") - col("__norm_old"), 6).as("norm_delta"),
        when(size(col("__c_old")) > 0 &&
            size(col("__c_old")) === size(col("__c_new")),
          round(V.cosine(col("__c_old"), col("__c_new")), 6))
          .as("centroid_cos"))
  }
}
