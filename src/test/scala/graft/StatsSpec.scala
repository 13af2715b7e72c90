package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1 to 200).map { i =>
    val words = (0 until (i % 20) + 1).map(j => s"w${(i * 7 + j) % 97}")
    (i.toLong, if (i % 2 == 0) "a" else "b", words.mkString(" "))
  }.toDF("doc_id", "grp", "text")

  test("corpusProfile: counts, quantiles, and HLL vocab within tolerance") {
    val prof = Stats.corpusProfile(docs, "grp", "text").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(prof.keySet == Set("a", "b"))
    val a = prof("a")
    assert(a.getAs[Long]("n_docs") == 100)
    // exact comparisons for the sketched columns
    val exactVocab = docs.filter(col("grp") === "a")
      .select(explode(split(col("text"), " "))).distinct().count()
    val approx = a.getAs[Long]("approx_vocab")
    assert(math.abs(approx - exactVocab).toDouble / exactVocab < 0.1,
      s"HLL vocab $approx vs exact $exactVocab")
    val p50 = a.getAs[Double]("p50_tokens")
    assert(p50 >= 1 && p50 <= 20, s"p50 $p50 out of range")
    assert(a.getAs[Double]("p95_tokens") >= p50)
    assert(a.getAs[Double]("mean_tokens") > 0)
  }
}
