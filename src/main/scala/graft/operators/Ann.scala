package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * The reference delegates search to Milvus (vector_database/
  * milvus_connector.py:176-188: top-k, IP/L2 metrics, nprobe). Here the
  * corpus is a DataFrame: brute-force is the exact baseline (one
  * broadcast of the query set, no corpus shuffle), LSH and IVF are the
  * scale paths that cut the scanned fraction to ~1/nlist.
  */
object Ann {

  /** Normalize the vector column to array<double> and pre-compute its
    * norm once — per-pair scoring then needs only a single codegen'd
    * dot product (cos = dot/(nrmQ·nrmC), same expression tree the
    * DuckDB oracle evaluates). */
  private def withNorm(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn(vecCol, col(vecCol).cast("array<double>"))
      .withColumn(s"${vecCol}_nrm", V.norm2(col(vecCol)))

  private def pairScore(metric: String, q: Column, c: Column,
      qn: Column, cn: Column): Column = metric match {
    case "cosine" => V.dot(q, c) / (qn * cn)
    case "ip"     => V.dot(q, c)
    case "l2"     => -V.l2(q, c) // negated so "higher is better" uniformly
    case m        => throw new IllegalArgumentException(s"unknown metric $m")
  }

  /** Exact top-k: broadcast the (small) query set against the corpus,
    * score every pair, rank per query. The corpus is scanned once with
    * no shuffle of the vectors themselves — only (query, score) pairs
    * move, pruned to k per partition before the final rank via the
    * window's partial top-k. Deterministic ties: (score desc, id asc). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      metric: String = "cosine"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Dedup.spread(withNorm(corpus, "v"))
    val q = withNorm(queries, "qv")
    val scored = c.as("c").join(broadcast(q.as("q")))
      .select(col("q.qid"), col("c.id"),
        round(pairScore(metric, col("q.qv"), col("c.v"),
          col("q.qv_nrm"), col("c.v_nrm")), 4).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: corpus and queries hashed to hyperplane-sign
    * buckets; each query scans only its bucket. Recall traded via
    * `planes` (fewer planes → bigger buckets → higher recall). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      planes: Int = 8, metric: String = "cosine"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = Dedup.spread(withNorm(corpus, "v"))
      .withColumn("sig", V.hyperplaneSig(col("v"), dim, planes))
    val qb = withNorm(queries, "qv")
      .withColumn("sig", V.hyperplaneSig(col("qv"), dim, planes))
    val scored = cb.as("c").join(broadcast(qb.as("q")), col("c.sig") === col("q.sig"))
      .select(col("q.qid"), col("c.id"),
        round(pairScore(metric, col("q.qv"), col("c.v"),
          col("q.qv_nrm"), col("c.v_nrm")), 4).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style ANN: deterministic coarse centroids (the first `nlist`
    * corpus vectors by id — a stand-in "trained" codebook), every vector
    * assigned to its nearest centroid (one broadcast pass), queries probe
    * the `nprobe` nearest cells. Bucketing persists as a partitioning, so
    * repeated queries only scan nprobe/nlist of the corpus. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, metric: String = "cosine"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = corpus.orderBy("id").limit(nlist)
      .select(col("id").as("cell"), col("v").as("cv"))
    val spreadCorpus = Dedup.spread(corpus)
    val assign = spreadCorpus.as("c").join(broadcast(centroids))
      .select(col("c.id"), col("c.v"), col("cell"), V.cosine(col("c.v"), col("cv")).as("cs"))
    val wAssign = Window.partitionBy("id").orderBy(col("cs").desc, col("cell").asc)
    val cells = assign.withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1).select("id", "v", "cell")
    val qprobe = queries.as("q").join(broadcast(centroids))
      .select(col("q.qid"), col("q.qv"), col("cell"), V.cosine(col("q.qv"), col("cv")).as("cs"))
    val wProbe = Window.partitionBy("qid").orderBy(col("cs").desc, col("cell").asc)
    val probes = qprobe.withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nprobe).select("qid", "qv", "cell")
    val scored = withNorm(cells, "v").as("c")
      .join(broadcast(withNorm(probes, "qv").as("p")), "cell")
      .select(col("p.qid"), col("c.id"),
        round(pairScore(metric, col("p.qv"), col("c.v"),
          col("p.qv_nrm"), col("c.v_nrm")), 4).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
