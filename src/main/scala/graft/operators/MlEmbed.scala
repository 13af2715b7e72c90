package graft.operators

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

  /** Dense document embeddings from a seeded Word2Vec fit on the corpus
    * itself (averaged word vectors per document) — array<double>, ready
    * for the dense_embedding column and the Ann/Dedup cosine operators. */
  def word2vecDense(df: DataFrame, textCol: String, dim: Int = 64,
      seed: Long = 42L, minCount: Int = 1,
      outCol: String = "dense_embedding"): DataFrame = {
    // Word2Vec.fit requires a non-empty vocabulary
    if (df.isEmpty) return df.withColumn(outCol, typedlit(Seq.empty[Double]))
    val toks = tokenizer(textCol).transform(df)
    val model = new Word2Vec().setInputCol("__toks").setOutputCol("__vec")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
      .fit(toks)
    model.transform(toks)
      .withColumn(outCol,
        org.apache.spark.ml.functions.vector_to_array(col("__vec")))
      .drop("__toks", "__vec")
  }
}
