package graft

import org.apache.spark.sql.functions._
import graft.operators.MlEmbed

/** MLlib embedding generation: shapes, determinism where guaranteed,
  * and usefulness of the vectors (similar docs score higher). */
class MlEmbedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark streaming engine handles streaming state"),
    (2L, "spark streaming engine handles streaming state"), // dup of 1
    (3L, "cats purr softly in the warm afternoon sun"),
    (4L, "the query optimizer rewrites the logical plan"),
  ).toDF("doc_id", "text")

  test("tfidfSparse: map shape, deterministic, duplicate docs embed identically") {
    val out = MlEmbed.tfidfSparse(docs, "text", numFeatures = 1 << 12)
    val rows = out.select("doc_id", "sparse_embedding")
      .collect().map(r => r.getLong(0) -> r.getMap[Int, Double](1).toMap).toMap
    assert(rows.size === 4)
    assert(rows(1L).nonEmpty && rows(1L).values.forall(_ >= 0.0))
    assert(rows(1L) === rows(2L)) // identical text -> identical embedding
    assert(rows(1L) !== rows(3L))
    // idf: a term present in every doc ("the"-free corpus here, use hash re-run)
    val again = MlEmbed.tfidfSparse(docs, "text", numFeatures = 1 << 12)
      .select("doc_id", "sparse_embedding")
      .collect().map(r => r.getLong(0) -> r.getMap[Int, Double](1).toMap).toMap
    assert(again === rows) // deterministic fit+transform
  }

  test("word2vecDense: dimension, identical docs embed identically, cosine sane") {
    val out = MlEmbed.word2vecDense(docs, "text", dim = 16, seed = 7L)
    val rows = out.select("doc_id", "dense_embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.values.forall(_.length === 16))
    assert(rows(1L) === rows(2L)) // same tokens -> same averaged vector
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na / 1 * nb)
    }
    assert(math.abs(cos(rows(1L), rows(1L)) - 1.0) < 1e-9)
  }

  test("tfidfSparse at numFeatures=1 collapses to tokenCount * ln((N+1)/(df+1))") {
    // the q_embed_tfidf_k1 degenerate-oracle contract, pinned at spec
    // scale: doc 5 has zero tokens, so N=5, df=4, idf=ln(6/5)
    val withEmpty = docs.union(Seq((5L, "!!! ...")).toDF("doc_id", "text"))
    val out = MlEmbed.tfidfSparse(withEmpty, "text", numFeatures = 1)
      .select("doc_id", "sparse_embedding")
      .collect().map(r => r.getLong(0) -> r.getMap[Int, Double](1).toMap).toMap
    val idf = math.log(6.0 / 5.0)
    assert(math.abs(out(1L)(0) - 6 * idf) < 1e-9) // 6 tokens
    assert(math.abs(out(3L)(0) - 8 * idf) < 1e-9) // 8 tokens
    assert(out(5L).isEmpty) // zero tokens -> empty sparse map, not 0.0
  }

  test("qualityClassifier: separable vocabularies score to the right side of 0.5") {
    // positives and negatives with disjoint vocabularies; held-out docs
    // reuse one side's words — the classifier must place them correctly
    val pos = (0 until 30).map(i =>
      (i.toLong, "curated encyclopedic prose reads cleanly here"))
      .toDF("id", "text")
    val neg = (100 until 130).map(i =>
      (i.toLong, "spam clickbait garbage listicle noise junk"))
      .toDF("id", "text")
    val unseen = Seq(
      (900L, "encyclopedic prose reads cleanly"),    // positive-side words
      (901L, "clickbait garbage junk noise"),        // negative-side words
      (902L, "curated encyclopedic listicle junk"))  // mixed
      .toDF("id", "text")
    val scored = MlEmbed.qualityClassifier(unseen, pos, neg, "text",
        numFeatures = 1 << 12)
      .select("id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(scored.values.forall(p => p >= 0.0 && p <= 1.0), s"$scored")
    assert(scored(900L) > 0.5, s"positive-vocab doc scored ${scored(900L)}")
    assert(scored(901L) < 0.5, s"negative-vocab doc scored ${scored(901L)}")
    // deterministic: refit on identical data gives identical scores
    val again = MlEmbed.qualityClassifier(unseen, pos, neg, "text",
        numFeatures = 1 << 12)
      .select("id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(again == scored, "refit on identical data must be deterministic")
  }

  test("tfidf embeddings plug into the dedup cosine operator") {
    val emb = MlEmbed.word2vecDense(docs, "text", dim = 16, seed = 7L)
      .select(col("doc_id").as("id"), col("dense_embedding").as("v"))
    val pairs = graft.operators.Dedup.embeddingCosine(emb, "id", "v", tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L))) // the duplicate pair is found
  }

  test("qualityClassifierWithModel: dumped coefficients reproduce the margin; sigmoid(margin) = prob") {
    val pos = (0 until 30).map(i =>
      (i.toLong, "curated encyclopedic reference prose quality writing"))
      .toDF("id", "text")
    val neg = (100 until 130).map(i =>
      (i.toLong, "spam clickbait garbage listicle noise junk"))
      .toDF("id", "text")
    val score = Seq(
      (900L, "encyclopedic prose reads cleanly"),
      (901L, "clickbait garbage junk noise"),
      (902L, ""))                                    // zero tokens → bare intercept
      .toDF("id", "text")
    val (scored, table) = MlEmbed.qualityClassifierWithModel(
      score, pos, neg, "text", numFeatures = 1 << 12)
    val rows = scored.select("id", "quality_prob", "margin")
      .as[(Long, Double, Double)].collect()
    // margin and probability are the same model surface
    rows.foreach { case (id, p, m) =>
      assert(math.abs(p - 1.0 / (1.0 + math.exp(-m))) < 1e-12,
        s"doc $id: prob $p vs sigmoid($m)")
    }
    // recompute each margin from the dumped table by hand — the exact
    // arithmetic the DuckDB oracle runs
    val coef = table.as[(String, Double)].collect().toMap
    val b0 = coef("__intercept__")
    val byId = rows.map(r => (r._1, r._3)).toMap
    Seq(900L -> "encyclopedic prose reads cleanly",
        901L -> "clickbait garbage junk noise",
        902L -> "").foreach { case (id, text) =>
      val want = b0 + "[a-z0-9]+".r.findAllIn(text.toLowerCase)
        .map(coef).sum
      assert(math.abs(byId(id) - want) < 1e-9,
        s"doc $id: margin ${byId(id)} vs recomputed $want")
    }
    assert(math.abs(byId(902L) - b0) < 1e-12, "empty doc must score the intercept")
  }
}
