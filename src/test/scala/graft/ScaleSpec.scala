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

  test("scaledEvents: disjoint user populations, per-user streams isomorphic, timestamps verbatim") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val events = Seq(
      (0L, 2L, ts(0), "click", 1.0),
      (1L, 2L, ts(5), "view", 2.0),
      (2L, 5L, ts(1), "click", 3.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Scale.scaledEvents(events, 3)
    assert(out.count() == 9)
    // both ids offset per replica: user populations are disjoint, so a
    // factor× stream means factor× concurrent keys — never fused sessions
    assert(out.select("event_id").distinct().count() == 9)
    assert(out.select("user_id").distinct().count() == 6)
    // per-user event streams are isomorphic: every replica user carries
    // the same (minutes-from-epoch, type, value) multiset as its original
    val streams = out.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_type"), col("value")))).as("s"))
      .select("s").distinct().count()
    assert(streams == 2) // user 2's stream shape and user 5's, each ×3
    // timestamps verbatim — replicas add concurrent state, not history
    assert(out.select(min("ts"), max("ts")).head() ==
      events.select(min("ts"), max("ts")).head())
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
