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
}
