package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Opt-in scale-evidence run (SURVEY §5): synthesize a FACTOR× corpus
  * from the graded sf dir, run the heavy query family at 1× and at
  * FACTOR×, and print per-query seconds + result rows — the two-point
  * scaling table for SCALE.md is measured, not argued.
  *
  * Replica i re-derives ids (doc_id + i·(maxId+1)) and rewrites every
  * word w → "w_i": each replica is an ISOMORPHIC copy of the corpus's
  * duplicate structure over a disjoint vocabulary, so near-dup work
  * scales exactly ×FACTOR (the same clusters, FACTOR times over). A raw
  * self-union would instead make every doc a FACTOR-way near-dup — one
  * giant cross-replica duplicate family, a different and pathological
  * workload. Disjoint vocabularies also preserve the per-replica df
  * distributions that PPJoin prefix filtering, the minhash maxDf cap,
  * and bm25 idf all key on.
  *
  * Usage: SPARK_GRAFT_SCALE_FACTOR=10 sbt "runMain graft.Scale"
  * (env: SPARK_GRAFT_SF_DIR base dir, SPARK_GRAFT_SCALE_DIR scratch).
  */
object Scale {

  /** The bench heavy hitters — the shuffle/join-dominated family where
    * superlinear behavior would hide. */
  val heavy: Seq[String] = Seq(
    "q_curation_pipeline", "q_dedup_minhash", "q_dedup_ngram",
    "q_dedup_cluster", "q_dedup_canonical", "q_bm25_index")

  def scaledDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val maxId = docs.agg(max(col("doc_id"))).head
    require(!maxId.isNullAt(0),
      "scaledDocuments: documents table is empty — nothing to scale " +
      "(max(doc_id) is NULL); point SPARK_GRAFT_SF_DIR at a populated sf dir")
    val off = maxId.getLong(0) + 1L
    (0 until factor).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * off))
        // only NON-empty words take the replica salt: split() yields ''
        // entries for doubled/leading/trailing spaces (and for fully
        // empty text), and salting those would mint bare "_i" tokens
        // that exist in no replica-0 doc, distorting replica token
        // distributions. Keeping them empty-in-place preserves the
        // exact whitespace structure, so every replica's char-level
        // layout matches the original. n_chars is intentionally NOT
        // recomputed — it is the canonical-selection ranking signal,
        // and keeping the original values preserves each replica's
        // selection order exactly
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            w => when(length(w) > 0, concat(w, lit(s"_$i"))).otherwise(w)),
          " "))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")

    scaledDocuments(Tables.load(spark, baseDir, "documents"), factor)
      .write.mode("overwrite").parquet(s"$scaleDir/documents.parquet")
    val nBase = Tables.load(spark, baseDir, "documents").count()
    val nScaled = Tables.load(spark, scaleDir, "documents").count()
    println(s"SCALE_CORPUS base=$nBase scaled=$nScaled factor=$factor")

    def run(dir: String, label: String): Seq[(String, Double, Long)] =
      heavy.map { name =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(name)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SCALE_Q $label $name%-22s ${sec}%8.2f s  $rows%9d rows")
        (name, sec, rows)
      }

    // scaled first so the 1× point doesn't donate page-cache/JIT warmth
    // it wouldn't have in a cold bench run; within a point the order is
    // the bench's own (alphabetical-ish via `heavy`)
    val scaled = run(scaleDir, s"x$factor")
    val base = run(baseDir, "x1")
    println("SCALE_TABLE query,base_s,scaled_s,ratio,base_rows,scaled_rows")
    base.zip(scaled).foreach { case ((n, bs, br), (_, ss, sr)) =>
      println(f"SCALE_ROW $n,$bs%.2f,$ss%.2f,${ss / bs}%.2f,$br,$sr")
    }
    spark.stop()
  }
}
