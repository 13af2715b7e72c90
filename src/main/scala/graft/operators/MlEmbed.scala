package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, Word2Vec}
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real (non-stub) embedding generation with Spark MLlib.
  *
  * The reference calls external TEI / BAAI-M3 HTTP servers for dense
  * and SPLADE sparse embeddings (embedding_model/tei_req.py,
  * allembed_req.py). Those servers don't exist inside a Spark cluster;
  * the MLlib equivalents below generate embeddings distributed, with no
  * external service: TF-IDF over hashed tokens for the sparse side
  * (same map<int,double> shape as the Milvus schema) and a seeded
  * Word2Vec for the dense side. Both are fit+transform over DataFrames
  * — the model broadcast and the per-partition transform are handled by
  * MLlib, so the embed stage stays a narrow transform at 100 TB.
  */
object MlEmbed {

  private def tokenizer(textCol: String) = new RegexTokenizer()
    .setInputCol(textCol).setOutputCol("__toks")
    // gaps=false + the token pattern itself, so "dog." tokenizes to
    // "dog" — the SAME tokens TextFunctions.wsTokens extracts (plus
    // RegexTokenizer's lowercasing = normText's lower())
    .setPattern("[A-Za-z0-9]+").setGaps(false)

  /** TF-IDF sparse document embeddings as map<int,double> — the
    * vector_schema sparse_embedding column, but IDF-weighted instead of
    * the reference's SPLADE scores. Hashing is murmur3 over
    * `numFeatures` buckets (HashingTF), IDF is log((N+1)/(df+1)). */
  def tfidfSparse(df: DataFrame, textCol: String,
      numFeatures: Int = 1 << 18, outCol: String = "sparse_embedding"): DataFrame = {
    // IDF.fit throws on zero documents; an empty corpus embeds to nothing
    if (df.isEmpty) return df.withColumn(outCol, typedlit(Map.empty[Int, Double]))
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__tf")
      .setNumFeatures(numFeatures)
    val withTf = tf.transform(tokenizer(textCol).transform(df))
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf").fit(withTf)
    val toMap = udf((v: MlVector) => {
      val sv = v.toSparse
      sv.indices.zip(sv.values).toMap
    })
    idf.transform(withTf)
      .withColumn(outCol, toMap(col("__tfidf")))
      .drop("__toks", "__tf", "__tfidf")
  }

  /** GPT-3-style model-based quality filtering (Brown et al. 2020
    * appendix A; CCNet's LM plays the same role): a logistic-regression
    * classifier over hashed token counts, trained
    * positives-vs-negatives (the paper used WebText/Wikipedia/books as
    * positives against raw Common Crawl), then scoring the whole
    * corpus. Returns `df` plus `quality_prob` — P(positive | doc) —
    * for downstream thresholding; the published keep rule
    * (keep if `pareto_draw > 1 − score`) is deterministic here via the
    * engine-wide hash predicate: compose with
    * [[Curate.stratifiedSample]]/[[Curate.scoreBuckets]] on the score
    * column rather than re-inventing RNG.
    *
    * Scale shape: both training sides hash to `numFeatures`-bounded
    * sparse vectors (narrow); the LR fit is MLlib's distributed LBFGS
    * over the label frame; scoring broadcasts the coefficient vector
    * and is a narrow per-row transform — the corpus is touched once
    * for features, once for scores. Fit internals are not
    * SQL-expressible (rows-only + spec, like the other MLlib fits);
    * `seed`/fixed iterations keep the fit deterministic for a given
    * partitioning. */
  def qualityClassifier(df: DataFrame, positives: DataFrame,
      negatives: DataFrame, textCol: String,
      numFeatures: Int = 1 << 18, maxIter: Int = 20,
      regParam: Double = 1e-3,
      outCol: String = "quality_prob"): DataFrame =
    qualityClassifierWithModel(df, positives, negatives, textCol,
      numFeatures, maxIter, regParam, outCol)._1
      .drop("margin")

  /** [[qualityClassifier]] plus the fitted model's own per-WORD
    * coefficient table — the hand-off that makes the SCORING half of
    * the classifier cross-engine checkable (the
    * word2vecDenseWithVectors pattern): the LBFGS fit has no SQL form,
    * but given the trained coefficients, transform() is exactly
    * margin = intercept + Σ_tokens coef(bucket(token)) — pure
    * arithmetic an oracle reading the dumped table reproduces. The
    * table maps every distinct token of the SCORED corpus to its
    * hashed bucket's coefficient (two words sharing a bucket share a
    * coefficient, so the per-word sum equals the per-bucket dot
    * exactly), plus one `__intercept__` row — a word the `[A-Za-z0-9]+`
    * tokenizer can never produce. The scored frame carries both
    * `outCol` (the sigmoid probability) and `margin` (the raw
    * log-odds): the margin is the hash-exact surface — sigmoid is a
    * transcendental whose last-ulp behavior differs across libm
    * implementations (the hybridTopKWeighted arctan argument), while
    * the margin is plain +/× the oracle reproduces to 4 dp.
    *
    * The word→coefficient map is built over the corpus's DISTINCT
    * tokens only (vocabulary-bounded, not corpus-sized); the
    * coefficient array broadcasts once and the lookup UDF sits at the
    * MLlib boundary like tfidfSparse's toMap — HashingTF.indexOf is
    * the model's own hash, so the table can never drift from what
    * transform() computed. */
  def qualityClassifierWithModel(df: DataFrame, positives: DataFrame,
      negatives: DataFrame, textCol: String,
      numFeatures: Int = 1 << 18, maxIter: Int = 20,
      regParam: Double = 1e-3,
      outCol: String = "quality_prob"): (DataFrame, DataFrame) = {
    // one-class training silently fits a constant scorer — the
    // misconfiguration is loud instead (both sides are the contract)
    require(!positives.isEmpty && !negatives.isEmpty,
      "qualityClassifier needs non-empty positives AND negatives — " +
      "a one-class fit scores every doc the same")
    val spark = df.sparkSession
    import spark.implicits._
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("__feat")
      .setNumFeatures(numFeatures)
    def featurize(d: DataFrame) =
      tf.transform(tokenizer(textCol).transform(d))
    val train = featurize(
      positives.select(col(textCol)).withColumn("__label", lit(1.0))
        .unionByName(
          negatives.select(col(textCol)).withColumn("__label", lit(0.0))))
    val model = new LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(train)
    val scored = model.transform(featurize(df))
      .withColumn(outCol, element_at(
        org.apache.spark.ml.functions.vector_to_array(col("probability")), 2))
      .withColumn("margin", element_at(
        org.apache.spark.ml.functions.vector_to_array(col("rawPrediction")), 2))
      .drop("__toks", "__feat", "rawPrediction", "probability", "prediction")
    val bcCoef = spark.sparkContext.broadcast(model.coefficients.toArray)
    val coefOf = udf((w: String) => bcCoef.value(tf.indexOf(w)))
    val table = tokenizer(textCol).transform(df.select(col(textCol)))
      .select(explode(col("__toks")).as("word")).distinct()
      .withColumn("coef", coefOf(col("word")))
      .unionByName(Seq(("__intercept__", model.intercept)).toDF("word", "coef"))
    (scored, table)
  }

  /** Dense document embeddings from a seeded Word2Vec fit on the corpus
    * itself (averaged word vectors per document) — array<double>, ready
    * for the dense_embedding column and the Ann/Dedup cosine operators. */
  def word2vecDense(df: DataFrame, textCol: String, dim: Int = 64,
      seed: Long = 42L, minCount: Int = 1,
      outCol: String = "dense_embedding"): DataFrame =
    word2vecDenseWithVectors(df, textCol, dim, seed, minCount, outCol)._1

  /** [[word2vecDense]] plus the fitted model's own word-vector table,
    * exploded to (word, dim, val) — the hand-off that makes the
    * per-doc AVERAGING half of Word2Vec cross-engine checkable: the
    * fit internals (negative sampling, learning-rate schedule) have no
    * SQL form, but given the trained vectors, transform() is exactly
    * `avg over the doc's tokens of vec(token)` with an all-token
    * denominator (OOV words add nothing but still count — at
    * minCount=1 there are none). An oracle that reads the dumped
    * table reproduces the embedding column arithmetic exactly. */
  def word2vecDenseWithVectors(df: DataFrame, textCol: String,
      dim: Int = 64, seed: Long = 42L, minCount: Int = 1,
      outCol: String = "dense_embedding"): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val emptyVecs = Seq.empty[(String, Long, Double)].toDF("word", "dim", "val")
    // Word2Vec.fit requires a non-empty vocabulary
    if (df.isEmpty)
      return (df.withColumn(outCol, typedlit(Seq.empty[Double])), emptyVecs)
    val toks = tokenizer(textCol).transform(df)
    val model = new Word2Vec().setInputCol("__toks").setOutputCol("__vec")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
      .fit(toks)
    val embedded = model.transform(toks)
      .withColumn(outCol,
        org.apache.spark.ml.functions.vector_to_array(col("__vec")))
      .drop("__toks", "__vec")
    // getVectors converts the model's float weights to doubles — the
    // SAME doubles transform() sums, so the dump loses no precision
    val vectors = model.getVectors
      .select(col("word"), posexplode(
        org.apache.spark.ml.functions.vector_to_array(col("vector")))
        .as(Seq("dim", "val")))
      .select(col("word"), col("dim").cast("long"), col("val"))
    (embedded, vectors)
  }
}
