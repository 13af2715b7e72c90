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
    // null text yields no chunks either (null offsets → explode drops)
    val nulls = Chunker.fixedChunks(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text", 4, 1)
    assert(nulls.count() == 0)
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

  test("semanticChunks: percentile amount uses the reference 0-100 convention") {
    val df = Seq((1L, "a b. c d. e f.")).toDF("doc_id", "text")
    // a reference-style amount (95) is accepted…
    assert(Chunker.semanticChunks(df, "doc_id", "text", amount = Some(95.0)).count() >= 1)
    // …and an out-of-range one is rejected rather than silently misused
    intercept[IllegalArgumentException] {
      Chunker.semanticChunks(df, "doc_id", "text", amount = Some(150.0)).count()
    }
  }

  test("semanticChunks: numberOfChunks survives distance ties with the placeholder") {
    // identical adjacent sentences → real distances tie at/near the first
    // row's 0.0 placeholder; the placeholder must rank last, so the doc
    // still yields exactly k chunks
    val df = Seq((1L, "same text here. same text here. same text here."))
      .toDF("doc_id", "text")
    val out = Chunker.semanticChunks(df, "doc_id", "text",
        numberOfChunks = Some(3), bufferSize = 0)
      .select("n_sentences").as[Long].collect()
    assert(out.length == 3, s"expected 3 chunks, got ${out.toSeq}")
  }

  test("semanticChunks: bufferSize smooths by embedding neighbour windows") {
    val df = Seq(
      (1L, "the cat sat. the cat ran. stocks fell hard. markets dropped low.")
    ).toDF("doc_id", "text")
    for (b <- Seq(0, 1, 2)) {
      val out = Chunker.semanticChunks(df, "doc_id", "text", bufferSize = b)
        .select("n_sentences").as[Long].collect()
      assert(out.sum == 4, s"bufferSize=$b lost sentences: ${out.toSeq}")
    }
  }

  test("semanticChunks: minChunkSize merges small chunks into the next") {
    val df = Seq(
      (1L, "aa. bb. a much longer sentence about stocks and markets moving. cc.")
    ).toDF("doc_id", "text")
    val noMin = Chunker.semanticChunks(df, "doc_id", "text",
        numberOfChunks = Some(4), bufferSize = 0)
      .select("content", "n_sentences").as[(String, Long)].collect()
    assert(noMin.length == 4)
    val merged = Chunker.semanticChunks(df, "doc_id", "text",
        numberOfChunks = Some(4), bufferSize = 0, minChunkSize = Some(15))
      .sort("block_id")
      .select("content", "n_sentences").as[(String, Long)].collect()
    assert(merged.length < 4, s"nothing merged: ${merged.toSeq}")
    assert(merged.map(_._2).sum == 4, "sentences lost in merge")
    // every chunk except the (unconditionally emitted) trailing one
    // honored the minimum size
    assert(merged.dropRight(1).forall(_._1.length >= 15), s"small chunk kept: ${merged.toSeq}")
  }
}
