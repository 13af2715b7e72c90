package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Chunker, Curate, Dedup, Ingest, MlEmbed, Stats}

/** Empty inputs must yield empty outputs — never a crash. A 100 TB run
  * routinely produces empty partitions/filters (a source with no new
  * docs, a knowledge base with nothing pending); operators that throw
  * on emptiness kill whole jobs. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String, String, String)].toDF("doc_id", "text", "source", "lang")
  private lazy val noVecs = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
  private lazy val someQs = Seq((1L, Seq(1.0, 0.0))).toDF("qid", "qv")

  test("dedup family over an empty corpus") {
    assert(Dedup.exact(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccard(noDocs, "doc_id", "text", tau = 0.5).count() == 0)
    assert(Dedup.minhashLsh(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.embeddingCosine(noVecs, "id", "v", tau = 0.5).count() == 0)
    assert(Dedup.containmentPairs(noDocs, "doc_id", "text", tau = 0.5).count() == 0)
    assert(Dedup.dedupLinesAcrossDocs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.dropContained(noDocs, "doc_id", "text").count() == 0)
  }

  test("line-df index over empty batches: filter yields nothing, append is a clean no-op") {
    val dir = java.nio.file.Files.createTempDirectory("eldidx").toString + "/idx"
    val history = Seq((1L, "alpha\nfooter")).toDF("doc_id", "text")
    graft.operators.Dedup.buildLineDfIndex(history, "doc_id", "text", dir)
    assert(graft.operators.Dedup
      .lineDfAgainstIndex(spark, dir, noDocs, "doc_id", "text").count() == 0)
    val before = spark.read.parquet(s"$dir/lines").count()
    graft.operators.Dedup
      .appendToLineDfIndex(spark, dir, noDocs, "doc_id", "text", "s0")
    assert(spark.read.parquet(s"$dir/lines").count() == before)
    // and the index still probes correctly afterwards
    val out = graft.operators.Dedup.lineDfAgainstIndex(spark, dir,
        Seq((9L, "gamma\nfooter")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(9L -> "gamma"), s"got $out")
  }

  test("containment index over empty batches: probe yields nothing, append is a clean no-op") {
    val dir = java.nio.file.Files.createTempDirectory("ecidx").toString + "/idx"
    val history = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    graft.operators.Dedup.buildContainmentIndex(history, "doc_id", "text", dir)
    assert(graft.operators.Dedup
      .dropContainedAgainstIndex(spark, dir, noDocs, "doc_id", "text").count() == 0)
    val before = spark.read.parquet(s"$dir/shingles").count()
    graft.operators.Dedup
      .appendToContainmentIndex(spark, dir, noDocs, "doc_id", "text", "s0")
    assert(spark.read.parquet(s"$dir/shingles").count() == before)
    // and the index still probes correctly afterwards
    val out = graft.operators.Dedup.dropContainedAgainstIndex(spark, dir,
        Seq((9L, "beta gamma delta")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Boolean, Option[Long])].collect().toSeq
    assert(out == Seq((9L, true, Some(1L))), s"got $out")
  }

  test("domain-cap ledger over an empty batch: no verdicts, append spends nothing") {
    val dir = java.nio.file.Files.createTempDirectory("edcidx").toString + "/led"
    graft.operators.Dedup.initDomainCapLedger(spark, dir, n = 2)
    val noUrls = Seq.empty[(Long, String, Long)].toDF("doc_id", "url", "q")
    val v = graft.operators.Dedup.capAgainstLedger(spark, dir, noUrls,
      "doc_id", "url", "q")
    assert(v.count() == 0)
    graft.operators.Dedup.appendToDomainCapLedger(spark, dir, v, "s0")
    assert(spark.read.schema("domain STRING, cnt BIGINT, src STRING")
      .parquet(s"$dir/counts").count() == 0)
    // a doc batch still admits normally against the untouched ledger
    val v2 = graft.operators.Dedup.capAgainstLedger(spark, dir,
      Seq((9L, "http://a.com/x", 1L)).toDF("doc_id", "url", "q"),
      "doc_id", "url", "q")
      .as[(Long, String, Boolean, Option[Long])].collect().toSeq
    assert(v2 == Seq((9L, "a.com", true, Some(1L))), s"got $v2")
  }

  test("ann family over an empty corpus (incl. IVF's KMeans guard)") {
    assert(Ann.bruteForceTopK(noVecs, someQs, k = 5).count() == 0)
    assert(Ann.lshTopK(noVecs, someQs, k = 5, dim = 2).count() == 0)
    assert(Ann.ivfTopK(noVecs, someQs, k = 5, nlist = 4).count() == 0)
  }

  test("recall/mining over empty inputs") {
    val noRes = Seq.empty[(Long, Long, Double, Long)]
      .toDF("qid", "id", "score", "rank")
    // approx empty, exact empty -> empty report (nothing to recall)
    assert(Ann.recallAtK(noRes, noRes, k = 5).count() == 0)
    assert(Ann.mineHardNegatives(noVecs, someQs, k = 5,
      dupThreshold = 0.5).count() == 0)
    assert(Ann.contrastiveTriplets(noVecs, someQs, negK = 5,
      posThreshold = 0.5, negThreshold = 0.5).count() == 0)
    // two empty finders -> a single all-zero report row, never nulls
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val rep = graft.operators.Dedup.pairRecall(noPairs, noPairs)
      .select("n_exact", "n_found", "n_hit")
      .as[(Long, Long, Long)].collect()
    assert(rep.toSeq == Seq((0L, 0L, 0L)))
    // tuning on zero queries is loud, not an NPE mid-sweep
    val dir = java.nio.file.Files.createTempDirectory("tune0").toString + "/i"
    val tiny = (1L to 8L).map(i =>
      (i, Seq(math.sin(i * 3.0), math.cos(i * 3.0)))).toDF("id", "v")
    Ann.buildIvfIndex(tiny, dir, nlist = 2)
    intercept[IllegalArgumentException] {
      Ann.tuneNprobe(spark, dir, someQs.filter(lit(false)), k = 3,
        targetRecall = 0.9)
    }
  }

  test("rerank over empty candidates / empty passages") {
    val noCand = Seq.empty[(Long, Long)].toDF("qid", "id")
    val qs = Seq((1L, "query text")).toDF("qid", "qtext")
    val ps = Seq((2L, "passage text")).toDF("id", "ptext")
    assert(Ann.rerankTopK(noCand, qs, ps, k = 5).count() == 0)
    val noPs = Seq.empty[(Long, String)].toDF("id", "ptext")
    val cand = Seq((1L, 2L)).toDF("qid", "id")
    assert(Ann.rerankTopK(cand, qs, noPs, k = 5).count() == 0)
    // null text scores null (SQL md5 semantics), never a crash
    assert(graft.operators.Tag.stubRerankCall(Seq((null, "p"), ("q", null)))
      .forall(_ == null))
  }

  test("ivfTopK: corpus smaller than nlist falls back to exact scan") {
    val tiny = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "v")
    val out = Ann.ivfTopK(tiny, someQs, k = 5, nlist = 16)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect()
    assert(out.length == 2 && out.find(_._3 == 1).get._2 == 1L)
  }

  test("curation and clustering over an empty corpus") {
    val doc = Seq((1L, "some benchmark text here")).toDF("doc_id", "text")
    assert(Curate.contamination(noDocs, doc, "doc_id", "text").count() == 0)
    assert(Curate.contaminationScore(noDocs, doc, "doc_id", "text").count() == 0)
    // empty benchmark: whole corpus reports zero hits, fraction 0.0
    assert(Curate.contaminationScore(doc, noDocs, "doc_id", "text")
      .filter(col("hits") === 0 && col("frac") === 0.0).count() == 1)
    // empty benchmark: nothing can be contaminated, corpus passes whole
    assert(Curate.decontaminate(doc, noDocs, "doc_id", "text").count() == 1)
    assert(Curate.stratifiedSample(noDocs, "doc_id", "lang",
      Map("en" -> 1.0)).count() == 0)
    assert(Curate.packSequences(noDocs, "doc_id", "text", budget = 128).count() == 0)
    assert(Dedup.dupClusters(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0)
    assert(Dedup.bandClusters(noDocs, "doc_id", "text").count() == 0)
    // empty corpus: no strata, no thresholds — empty result, no crash on
    // the null normalizer the empty-frame sum produces
    assert(Curate.temperatureMixture(noDocs, "doc_id", "lang",
      alpha = 0.5, budget = 100).count() == 0)
    assert(Curate.shuffleShards(noDocs, "doc_id", numShards = 4).count() == 0)
    // phash over an empty features frame: no signatures, no pairs
    val noFeats = Seq.empty[(Long, Seq[Double])].toDF("media_id", "features")
    assert(graft.operators.Multimodal.phashPairs(
      noFeats, "media_id", "features", dim = 12, maxHam = 2).count() == 0)
    // token-weighted mixture: same empty-normalizer escape as the
    // doc-count form
    assert(Curate.temperatureMixtureTokens(noDocs, "doc_id", "lang",
      "text", alpha = 0.5, budgetTokens = 100).count() == 0)
    // tokenize: empty corpus → empty vocabulary → empty stream; a
    // non-empty rule list must not change that
    assert(graft.operators.Bpe.tokenize(noDocs, "doc_id", "text",
      Seq(("a", "b"))).count() == 0)
    // rebuilding a sidecar from an empty fps store is a loud error,
    // not a zero-bit filter that would prune everything
    val dir = java.nio.file.Files.createTempDirectory("exreb").toString + "/idx"
    graft.operators.Dedup.buildExactIndex(doc, "doc_id", "text", dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$dir/fps").limit(0)
      .write.parquet(s"$dir/fps_empty")
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/fps"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/fps_empty"),
      new org.apache.hadoop.fs.Path(s"$dir/fps"))
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Dedup.rebuildExactSidecar(spark, dir)
    }
    assert(ex.getMessage.contains("empty"), ex.getMessage)
    // span decontamination: empty corpus → no spans; empty benchmark →
    // no spans AND every doc survives verbatim (normalized)
    assert(Curate.contaminatedSpans(noDocs, doc, "doc_id", "text")
      .count() == 0)
    assert(Curate.contaminatedSpans(doc, noDocs, "doc_id", "text")
      .count() == 0)
    val untouched = Curate.removeContaminatedSpans(doc, noDocs,
      "doc_id", "text").select("clean").as[String].collect()
    assert(untouched.toSeq == Seq("some benchmark text here"))
    // one-class quality-classifier fits are loud, not constant scorers
    val exQ = intercept[IllegalArgumentException] {
      graft.operators.MlEmbed.qualityClassifier(doc, doc, noDocs, "text")
    }
    assert(exQ.getMessage.contains("non-empty"), exQ.getMessage)
    // phash index over an empty corpus: probe returns nothing, no crash
    val phDir = java.nio.file.Files.createTempDirectory("phemp").toString + "/idx"
    val noFeats2 = Seq.empty[(Long, Seq[Double])].toDF("id", "features")
    graft.operators.Multimodal.buildPhashIndex(noFeats2, "id", "features",
      phDir, dim = 12, maxHam = 2)
    val probe = Seq((1L, Seq.fill(12)(1.0))).toDF("id", "features")
    assert(graft.operators.Multimodal.dedupPhashAgainstIndex(spark, phDir,
      probe, "id", "features").count() == 0)
  }

  test("streaming bench drains over an empty events frame") {
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(graft.streaming.StreamDrain.sessionizeDrained(noEvents).count() == 0)
    assert(graft.streaming.StreamDrain.windowAggDrained(noEvents).count() == 0)
    assert(graft.streaming.StreamDrain.asofJoinDrained(noEvents).count() == 0)
  }

  test("chunkers, pipeline, profile over an empty corpus") {
    assert(Chunker.fixedChunks(noDocs.select("doc_id", "text"), "text", 100, 10).count() == 0)
    assert(Chunker.recursiveChunks(noDocs.select("doc_id", "text"), "text", 100, 10).count() == 0)
    assert(Chunker.semanticChunks(noDocs, "doc_id", "text").count() == 0)
    assert(Ingest.pipeline(noDocs, Seq.empty[Long].toDF("file_id")).count() == 0)
    assert(Stats.corpusProfile(noDocs, "source", "text").count() == 0)
    assert(MlEmbed.tfidfSparse(noDocs, "text").count() == 0)
    assert(MlEmbed.word2vecDense(noDocs, "text", dim = 8).count() == 0)
  }

  test("curation scorers and span dedup over empty inputs") {
    // empty corpus: empty score/span frames, no throw
    assert(Curate.perplexityScore(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.repeatedSpans(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.removeRepeatedSpans(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.semDedup(noVecs, "id", "v", k = 4, tau = 0.5).count() == 0)
    val target = Seq((100L, "target text here")).toDF("doc_id", "text")
    assert(Curate.importanceWeight(noDocs, target, "doc_id", "text").count() == 0)
    // a featureless TARGET is a caller error — fail loudly, never
    // silently null every weight
    val corpus = Seq((1L, "corpus text")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Curate.importanceWeight(corpus, noDocs, "doc_id", "text")
    }
    intercept[IllegalArgumentException] {
      Curate.importanceWeight(corpus,
        Seq((9L, "   ")).toDF("doc_id", "text"), "doc_id", "text")
    }
    // the later round-7 trio: empty in, empty out, no throw
    val noLang = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(Curate.budgetSample(noLang, "doc_id", "text", "lang",
      Map("en" -> 100L)).count() == 0)
    assert(Dedup.dedupLinesInDoc(noDocs, "doc_id", "text").count() == 0)
    assert(Curate.gopherFilter(noDocs, "doc_id", "text").count() == 0)
    assert(Curate.c4Filter(noDocs, "doc_id", "text").count() == 0)
  }

  test("iterators, canonical selection, partitions over empty inputs") {
    // empty corpus: one empty page from the cursor search, no throw
    assert(Ann.searchIteratorPage(noVecs, someQs, pageSize = 5).count() == 0)
    assert(Ann.searchIterator(noVecs, someQs, pageSize = 5).toList.isEmpty)
    // empty query set: nothing to page
    val noQs = Seq.empty[(Long, Seq[Double])].toDF("qid", "qv")
    val tiny = Seq((1L, Seq(1.0, 0.0))).toDF("id", "v")
    assert(Ann.searchIterator(tiny, noQs, pageSize = 5).toList.isEmpty)
    // no rows match the predicate: the iterator yields no pages
    assert(Ingest.queryIterator(noDocs, "lang = 'en'", "doc_id",
      pageSize = 5).toList.isEmpty)
    assert(Ingest.queryPage(noDocs, "true", "doc_id", pageSize = 5).count() == 0)
    // canonical selection with no clusters: every doc is a singleton
    val docs = Seq((1L, "a", 2L), (2L, "b", 5L)).toDF("doc_id", "text", "q")
    val noClusters = Seq.empty[(Long, Long)].toDF("id", "cluster_id")
    assert(Dedup.keepCanonical(docs, noClusters, "doc_id", "q").count() == 2)
    assert(Dedup.keepCanonical(noDocs.select(col("doc_id"), col("text"),
      lit(1L).as("q")), noClusters, "doc_id", "q").count() == 0)
    // partition restriction that matches nothing: empty result, no throw
    val dir = java.nio.file.Files.createTempDirectory("ecoll").toString + "/c"
    graft.operators.Collections.writePartitioned(
      Seq((1L, Seq(1.0, 0.0), 0)).toDF("id", "v", "part"), dir, "part")
    assert(graft.operators.Collections.searchPartitions(spark, dir, "part",
      Seq(99), someQs, k = 5).count() == 0)
  }

  test("events adapters and k=1 semDedup over empty inputs") {
    import graft.streaming.Events
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      .toDF("event_id", "ts", "user_id", "value")
    assert(Events.withMs(noEvents).count() == 0)
    assert(Events.withEventTime(noEvents).count() == 0)
    assert(Events.toSessionEvents(noEvents).count() == 0)
    // k=1 semDedup on an empty embedding table: ivfFit's empty guard
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Dedup.semDedup(noVecs, "vec_id", "embedding",
      k = 1, tau = 0.4, trainCap = 1000L).count() == 0)
  }

  test("crawl triage and tokenizer coverage over empty inputs") {
    import graft.operators.{Bpe, Curate}
    val none = Seq.empty[(Long, String)].toDF("id", "text")
    val some = Seq((1L, "the cat and dog sit here with that word inside"))
      .toDF("id", "text")
    // empty new snapshot: everything deletes; empty old: adds triage
    // on their own merits; both empty: empty plan
    assert(Curate.crawlTriage(some, none, "id", "text", minWords = 5)
      .filter(col("action") =!= "delete").count() == 0)
    val addOnly = Curate.crawlTriage(none, some, "id", "text",
      minWords = 5).as[(Long, String, String)].collect().toSeq
    assert(addOnly == Seq((1L, "added", "upsert")), s"got $addOnly")
    assert(Curate.crawlTriage(none, none, "id", "text").count() == 0)
    // coverage over an empty corpus / under an empty-vocabulary ref:
    // zero-word docs carry no subwords; an empty reference makes every
    // subword OOV (rate 1.0) — drift maximal, loudly visible
    val merges = Bpe.train(some, "text", numMerges = 2)
    assert(Bpe.coverage(none, "id", "text", merges, some, "text")
      .count() == 0)
    val allOov = Bpe.coverage(some, "id", "text", merges, none, "text")
      .select("oov_rate").as[Double].collect()
    assert(allOov.toSeq == Seq(1.0), s"got ${allOov.toSeq}")
  }
}
