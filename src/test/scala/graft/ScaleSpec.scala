package graft

import org.apache.spark.sql.functions._

/** The scale-evidence corpus synthesizer: replica isomorphism is the
  * whole point (SCALE.md's ratios assume each replica reproduces the
  * original's duplicate structure over a disjoint vocabulary), so the
  * salting must never mint tokens that exist in no replica-0 doc. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("scaledDocuments rejects an empty corpus loudly") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Scale.scaledDocuments(empty, 3)
    }
    assert(ex.getMessage.contains("documents table is empty"))
  }

  test("scaledDocuments salts only non-empty words, preserving whitespace structure") {
    val docs = Seq(
      (0L, "plain words here"),
      (1L, "doubled  space"),      // split yields an empty middle word
      (2L, " leading and trailing "),
      (3L, "")                     // fully empty text
    ).toDF("doc_id", "text")
    val out = Scale.scaledDocuments(docs, 2).orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // replica 0 is the original, replica 1 is salted with offset 4
    assert(out(0L) == "plain words here")
    assert(out(4L) == "plain_1 words_1 here_1")
    // the empty middle word stays empty — no bare "_1" token, and the
    // doubled space survives so char-level layout matches the original
    assert(out(5L) == "doubled_1  space_1")
    assert(out(6L) == " leading_1 and_1 trailing_1 ")
    assert(out(7L) == "")
    assert(!out.values.exists(_.split(" ", -1).contains("_1")))
  }

  test("scaledVectors: factor× rows, disjoint ids, vectors verbatim") {
    val emb = Seq((0L, Seq(1.0, 2.0)), (3L, Seq(0.5, -1.0))).toDF("id", "v")
    val out = Scale.scaledVectors(emb, 3)
      .select("id", "v").as[(Long, Seq[Double])].collect().toMap
    assert(out.size == 6) // 2 rows × 3 replicas, all ids distinct
    // replica i offsets by i·(maxId+1)=4i; every replica keeps vectors
    assert(out(0L) == Seq(1.0, 2.0) && out(4L) == Seq(1.0, 2.0) &&
      out(8L) == Seq(1.0, 2.0))
    assert(out(3L) == Seq(0.5, -1.0) && out(7L) == Seq(0.5, -1.0) &&
      out(11L) == Seq(0.5, -1.0))
    val ex = intercept[IllegalArgumentException] {
      Scale.scaledVectors(Seq.empty[(Long, Seq[Double])].toDF("id", "v"), 2)
    }
    assert(ex.getMessage.contains("embeddings table is empty"))
  }
}
