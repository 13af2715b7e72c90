package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunker

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("fixedChunks: strides, overlap, last-chunk start inside text") {
    val df = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xyz")).toDF("doc_id", "text")
    val rows = Chunker.fixedChunks(df, "text", size = 4, overlap = 1)
      .select("doc_id", "block_id", "content")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    // stride = 3: doc1 len 10 → offsets 0,3,6,9 → "abcd","defg","ghij","j"
    assert(rows.filter(_._1 == 1L).map(_._3).toSeq == Seq("abcd", "defg", "ghij", "j"))
    // empty text yields no chunks
    assert(!rows.exists(_._1 == 2L))
    // text shorter than size → single whole-text chunk
    assert(rows.filter(_._1 == 3L).map(_._3).toSeq == Seq("xyz"))
  }

  test("recursiveSplit: separator hierarchy, size bound, merge") {
    val out = Chunker.recursiveSplit("aa。bb。cc，dd。ee", size = 6, overlap = 0)
    assert(out.forall(_.length <= 6), s"oversize chunk in $out")
    assert(out.mkString.contains("aa"))
    // merges small pieces back with the separator where they fit
    assert(out.contains("aa。bb"))
    // no separator at all → hard wrap
    val hard = Chunker.recursiveSplit("abcdefghij", size = 4, overlap = 1)
    assert(hard == Seq("abcd", "defg", "ghij", "j"))
  }

  test("semanticChunks: groups cover all sentences, per-doc contiguous blocks") {
    val df = Seq(
      (1L, "the cat sat. the cat ran. stocks fell hard. markets dropped low."),
      (2L, "one sentence only.")).toDF("doc_id", "text")
    val out = Chunker.semanticChunks(df, "doc_id", "text")
      .select("doc_id", "block_id", "n_sentences")
      .as[(Long, Long, Long)].collect()
    assert(out.filter(_._1 == 1L).map(_._3).sum == 4) // all 4 sentences kept
    assert(out.filter(_._1 == 2L).map(_._3).sum == 1)
  }

  test("semanticChunks: every breakpoint type partitions all sentences") {
    val df = Seq(
      (1L, "the cat sat. the cat ran. stocks fell hard. markets dropped low. rain fell. wind blew.")
    ).toDF("doc_id", "text")
    for (bp <- Seq("percentile", "standard_deviation", "interquartile", "gradient")) {
      val out = Chunker.semanticChunks(df, "doc_id", "text", breakpoint = bp)
        .select("n_sentences").as[Long].collect()
      assert(out.sum == 6, s"breakpoint=$bp lost sentences: ${out.toSeq}")
      assert(out.forall(_ > 0), s"breakpoint=$bp produced empty chunk")
    }
    intercept[IllegalArgumentException] {
      Chunker.semanticChunks(df, "doc_id", "text", breakpoint = "nope").count()
    }
  }

  test("semanticChunks: numberOfChunks yields exactly k chunks") {
    val df = Seq(
      (1L, "the cat sat. the cat ran. stocks fell hard. markets dropped low. rain fell. wind blew.")
    ).toDF("doc_id", "text")
    for (k <- Seq(2, 3, 4)) {
      val out = Chunker.semanticChunks(df, "doc_id", "text", numberOfChunks = Some(k))
        .select("n_sentences").as[Long].collect()
      assert(out.length == k, s"k=$k got ${out.length} chunks")
      assert(out.sum == 6, s"k=$k lost sentences")
    }
  }
}
