package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}

/** Training-data curation operators: the corpus-level steps a pipeline
  * runs between raw ingest and training-example emission — benchmark
  * decontamination, deterministic mixture sampling, and sequence
  * packing. The reference stops at loading embeddings into the vector
  * store; these cover what the same corpus needs on its way into a
  * training run, built on the dedup layer's shingle machinery.
  *
  * Shared determinism contract: every sampling / assignment decision
  * derives from the md5 hex-slice hash space (HashFunctions), never an
  * RNG, so results are reproducible across runs, partitionings, and
  * engines (the DuckDB oracles mirror the same arithmetic).
  */
object Curate {

  /** Benchmark contamination report: corpus docs sharing at least
    * `minHits` distinct `w`-char shingles with ANY benchmark doc
    * (the GPT-3/PaLM n-gram decontamination rule, on character
    * shingles). Returns (id, hits) with hits = number of distinct
    * shingle hashes the doc shares with the benchmark union.
    *
    * Scale shape: benchmark suites are tiny relative to a training
    * corpus, so the benchmark's distinct-shingle set broadcasts; the
    * corpus side is one narrow shingle explode + semi-join + groupBy —
    * no corpus self-join, no shuffle of the text itself. Shingles
    * collapse to the md5-slice 32-bit hash space (the engine-portable
    * space all dedup set math uses) before moving, so the DuckDB
    * oracle agrees bit-for-bit even when hashes collide. */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, w: Int = 13, minHits: Int = 1): DataFrame = {
    val cs = Dedup.shingleHashSet(corpus, idCol, textCol, w, None)
    val bs = Dedup.shingleHashSet(bench, idCol, textCol, w, None)
      .select("h").distinct()
    cs.join(broadcast(bs), Seq("h"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** Per-doc contamination REPORT with denominators: every corpus doc's
    * distinct-shingle count, how many of those appear in the benchmark
    * union, and the fraction — the thresholded form of the n-gram rule
    * ("flag if > x% of a doc's n-grams hit the eval suite") that real
    * decontamination writeups report, where [[contamination]] is the
    * binary membership form. Fraction rounded 6dp for the cross-engine
    * contract; docs with zero hits still appear (frac 0.0) so the
    * report covers the whole corpus.
    *
    * Scale shape: ONE pass over the corpus shingles — the broadcast
    * benchmark set left-join marks each shingle, then a single
    * map-side-combined groupBy counts totals and hits together
    * (count(col) skips the unmarked nulls). No cache, no second scan:
    * at corpus scale the shingle table is the biggest frame in the
    * plan and must never be materialized or traversed twice. */
  def contaminationScore(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, w: Int = 13): DataFrame = {
    val cs = Dedup.shingleHashSet(corpus, idCol, textCol, w, None)
    val bs = Dedup.shingleHashSet(bench, idCol, textCol, w, None)
      .select("h").distinct().withColumn("__hit", lit(1))
    cs.join(broadcast(bs), Seq("h"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("hits"))
      .select(col("id"), col("n_shingles"), col("hits"),
        round(col("hits") / col("n_shingles"), 6).as("frac"))
  }

  /** The clean side: corpus minus contaminated docs. Left as a plain
    * anti-join (no broadcast hint) — AQE picks broadcast when the
    * contaminated set is small, which it usually is. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, w: Int = 13, minHits: Int = 1): DataFrame =
    corpus.join(
      contamination(corpus, bench, idCol, textCol, w, minHits)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** The char spans of `df` that verbatim-overlap the benchmark — the
    * SPAN-precision form of contamination: positions whose w-char
    * shingle (same md5-slice hash space as [[contamination]]) appears
    * anywhere in `bench`, collapsed to gap-and-island ranges ≥ minLen
    * chars (default = w: any verbatim benchmark run is a leak).
    * Returns (id, span_start, span_end, span_len), 1-based inclusive
    * over the NORMALIZED text.
    *
    * Scale shape: the benchmark's shingle-hash set is eval-suite-sized
    * and broadcasts into a semi filter on the corpus's position
    * stream; the only wide step is the per-doc island window —
    * identical to [[Dedup.repeatedSpans]]'s plan with the
    * corpus-wide duplicate groupBy replaced by the broadcast. */
  def contaminatedSpans(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, w: Int = 13, minLen: Int = 0): DataFrame = {
    val len = if (minLen <= 0) w else minLen
    require(w > 0 && len >= w, "need w > 0 and minLen >= w")
    val flagged = Dedup.shinglePositions(bench, idCol, textCol, w)
      .select("h").distinct()
    Dedup.spanIslands(
      Dedup.shinglePositions(corpus, idCol, textCol, w)
        .join(broadcast(flagged), Seq("h"), "left_semi"),
      w, len)
  }

  /** Surgical decontamination: cut the benchmark-overlapping spans out
    * of each doc instead of dropping the doc ([[decontaminate]]'s
    * doc-level form wastes the rest of a long page over one leaked
    * sentence). Every corpus doc survives with (id, clean) — clean =
    * normalized text minus the contaminated ranges, '' when fully
    * covered. The splice is [[Dedup.removeRepeatedSpans]]'s
    * clamped-cursor aggregate, shared. */
  def removeContaminatedSpans(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, w: Int = 13,
      minLen: Int = 0): DataFrame =
    Dedup.spliceOutSpans(corpus, idCol, textCol,
      contaminatedSpans(corpus, bench, idCol, textCol, w, minLen))

  /** Embedding-space contamination report — the SEMANTIC form of
    * [[contamination]]: per corpus doc, the nearest benchmark doc by
    * cosine and that similarity (rounded to 4 decimals). Catches
    * paraphrased / translated / re-templated eval leakage the verbatim
    * n-gram screen can't see (SemDeDup's observation, pointed at
    * decontamination). Ties on the rounded cosine break to the
    * smallest bench id, so the argmax is engine-portable. Zero-norm
    * vectors are skipped on both sides (cosine undefined); a corpus
    * doc reports only if some benchmark cosine exists.
    *
    * Scale shape: benchmark suites are tiny by definition, so the
    * benchmark side BROADCASTS and the corpus streams through one
    * narrow codegen'd pass (per-pair dot products never leave the
    * task); the per-doc argmax is a map-side-combined struct-max, so
    * the only shuffle carries ONE row per corpus doc — (id, bench_id,
    * cos) — regardless of benchmark size. Norms are computed once per
    * vector before the join, as in [[Dedup.embeddingCosine]]. */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    def prep(df: DataFrame, as: String) = df.select(
        col(idCol).as(as), col(vecCol).cast("array<double>").as(s"v_$as"))
      .withColumn(s"nrm_$as", V.norm2(col(s"v_$as")))
      .filter(col(s"nrm_$as") > 0)
    // round per pair (not on the max) so rounded ties break identically
    // in every engine; the benchmark side is small, so the BigDecimal
    // round stays O(corpus × |bench|) with a tiny constant. The argmax
    // negates the COSINE (always a double) and takes the struct MIN —
    // max cos, ties to the smallest bench id — so the tie-break works
    // for ANY orderable id type (negating the id column would NULL out
    // string ids, or throw under ANSI).
    prep(corpus, "id").crossJoin(broadcast(prep(bench, "bench_id")))
      .select(col("id"), col("bench_id"),
        round(V.dot(col("v_id"), col("v_bench_id")) /
          (col("nrm_id") * col("nrm_bench_id")), 4).as("cos"))
      .groupBy("id")
      .agg(min(struct((-col("cos")).as("nc"), col("bench_id"))).as("m"))
      .select(col("id"), col("m.bench_id").as("bench_id"),
        (-col("m.nc")).as("cos"))
  }

  /** The clean side of the semantic screen: corpus minus docs whose
    * nearest benchmark cosine reaches `tau`. Same anti-join shape as
    * [[decontaminate]] — no broadcast hint; AQE broadcasts the
    * (usually small) contaminated id set. Zero-norm corpus docs have
    * no defined similarity and are KEPT (they can't match anything). */
  def decontaminateSemantic(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame =
    corpus.join(
      semanticContamination(corpus, bench, idCol, vecCol)
        .filter(col("cos") >= tau).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Deterministic stratified sampling for mixture weighting: keep a row
    * iff hash(seed, id) mod 1e6 falls under its stratum's fraction.
    * `fractions` maps stratum value → keep fraction in [0,1]; strata
    * absent from the map get `default`. No RNG, no shuffle, no state:
    * the decision is a pure per-row predicate, so the sample is stable
    * under re-runs and repartitioning, and the filter pushes all the
    * way into the scan. This is how a 100 TB corpus gets re-weighted
    * into a training mixture (up/down-sample per language / source /
    * quality band) in a single narrow pass. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      seed: Int = 13): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1) &&
      default >= 0 && default <= 1, "fractions must be in [0,1]")
    val frac = coalesce(
      element_at(typedlit(fractions), col(stratumCol).cast("string")),
      lit(default))
    df.filter(
      H.hash32(seed, col(idCol).cast("string")) % 1000000 < frac * 1000000.0)
  }

  /** Deterministic train/holdout split: rows hash below `testFrac` land
    * in "test", the rest in "train" — total and disjoint by
    * construction, stable under re-runs and repartitioning (same
    * hash-predicate mechanics as [[stratifiedSample]], different seed
    * so the two decisions are independent). Splitting on a GROUP key
    * (e.g. domain or source id) instead of the row id prevents
    * near-dup leakage across the split — pass that column as `idCol`. */
  def holdoutSplit(df: DataFrame, idCol: String, testFrac: Double,
      seed: Int = 17): DataFrame = {
    require(testFrac >= 0 && testFrac <= 1, "testFrac must be in [0,1]")
    df.withColumn("split",
      when(H.hash32(seed, col(idCol).cast("string")) % 1000000
        < testFrac * 1000000.0, lit("test")).otherwise(lit("train")))
  }

  /** CCNet-style LM quality scoring: per-token cross-entropy of each
    * document under an add-k-smoothed bigram model trained on the
    * corpus itself (perplexity = exp(xent); low = fluent/templated,
    * high = noise — CCNet buckets a crawl into head/middle/tail on
    * exactly this signal). Tokens are the whitespace tokenizer over
    * normalized text (the cross-engine contract every token oracle
    * shares); each doc's first token is conditioned on a `<s>` start
    * marker, which cannot collide with real `[A-Za-z0-9]+` tokens.
    * p(w|prev) = (C(prev,w)+k) / (C(prev)+k·V), V = distinct-token
    * vocabulary. Returns (id, n_tok, xent) — xent rounded to 4dp so
    * both engines' float summation orders agree; empty docs are absent.
    *
    * Scale shape: positions collapse to per-doc bigram counts FIRST, so
    * every downstream aggregate and join moves distinct (doc, bigram)
    * rows, not raw token positions; the model tables are two map-side-
    * combined groupBys over those rows; V is a one-row broadcast. The
    * scoring join keys on (prev, tok) — hot contexts ("the", "of") skew
    * it, which AQE splits. No driver-side state: the "model" never
    * leaves the cluster. */
  def perplexityScore(df: DataFrame, idCol: String, textCol: String,
      k: Double = 1.0): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val db = docBigrams(df, idCol, textCol)
    val cb = db.groupBy("prev", "tok").agg(sum("c").as("cb"))
    val cu = db.groupBy("prev").agg(sum("c").as("cu"))
    val v = db.agg(countDistinct("tok").cast("double").as("v"))
    db.join(cb, Seq("prev", "tok")).join(cu, Seq("prev"))
      .crossJoin(broadcast(v))
      .groupBy("id")
      .agg(sum("c").cast("long").as("n_tok"),
        round(
          sum(col("c") * -log((col("cb") + k) / (col("cu") + col("v") * k)))
            / sum("c"), 4).as("xent"))
  }

  /** Per-doc bigram counts (id, prev, tok, c) under the engine token
    * contract, '<s>'-started — the shared front half of both
    * perplexity scorers. */
  private def docBigrams(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = T.wsTokens(T.normText(col(textCol)))
    df.select(col(idCol).as("id"), toks.as("l"))
      .filter(size(col("l")) > 0)
      .select(col("id"), explode(arrays_zip(
        concat(array(lit("<s>")), slice(col("l"), lit(1), size(col("l")) - 1))
          .as("prev"),
        col("l").as("tok"))).as("g"))
      .select(col("id"), col("g.prev").as("prev"), col("g.tok").as("tok"))
      .groupBy("id", "prev", "tok")
      .agg(count(lit(1)).cast("double").as("c"))
  }

  /** CCNet's actual deployment shape (Wenzek et al. 2020 §4.3): the LM
    * trains on a CLEAN reference corpus (the paper uses Wikipedia) and
    * scores the crawl — [[perplexityScore]] is the self-trained special
    * case (perplexityScoreWith(df, df) is bit-equal to it, spec'd).
    * Bigrams the reference never saw fall back to the add-k floor
    * (coalesce-0 counts: p = k/(k·V) for a fully unseen context), so
    * out-of-domain text scores HIGH cross-entropy — exactly the signal
    * the head/middle/tail cut keys on. V is the reference vocabulary.
    * Returns (id, n_tok, xent) over `corpus`; token-less docs absent.
    *
    * Scale shape: the model tables are reference-vocabulary-bounded
    * groupBys, independent of crawl size; scoring joins key on
    * (prev, tok)/(prev) — hot contexts skew them, AQE splits; V is a
    * one-row broadcast. The model never leaves the cluster, and the
    * crawl is touched exactly once. */
  def perplexityScoreWith(corpus: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, k: Double = 1.0): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    val refG = docBigrams(ref, idCol, textCol)
    val cb = refG.groupBy("prev", "tok").agg(sum("c").as("cb"))
    val cu = refG.groupBy("prev").agg(sum("c").as("cu"))
    val v = refG.agg(countDistinct("tok").cast("double").as("v"))
    docBigrams(corpus, idCol, textCol)
      .join(cb, Seq("prev", "tok"), "left")
      .join(cu, Seq("prev"), "left")
      .crossJoin(broadcast(v))
      .groupBy("id")
      .agg(sum("c").cast("long").as("n_tok"),
        // an EMPTY reference has V = 0 and every denominator 0 — there
        // is no model to score under, so xent is NULL (total, loud in
        // the data). The zero denominator is nulled PER ROW (a null
        // division, not an ANSI divide-by-zero); for any non-empty
        // reference den >= k·V > 0 and the guard never fires.
        round(sum(col("c") * -log(
            (coalesce(col("cb"), lit(0.0)) + k) / nonZero(
              coalesce(col("cu"), lit(0.0)) + col("v") * k)))
            / sum("c"), 4).as("xent"))
  }

  /** The column when positive, NULL otherwise — lets a degenerate 0
    * denominator propagate as SQL NULL instead of an ANSI error. */
  private def nonZero(c: Column): Column = when(c > 0, c)

  /** Hashed unigram+bigram feature stream: (id, bucket) one row per
    * token occurrence plus one per consecutive-token pair, both hashed
    * into `buckets` — the DSIR feature space ([[importanceWeight]]). */
  private def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      T.wsTokens(T.normText(col(textCol))).as("l"))
    val uni = base.select(col("id"), explode(col("l")).as("tok"))
      .select(col("id"), pmod(H.hash32(31, col("tok")), lit(buckets)).as("b"))
    val bi = base.filter(size(col("l")) > 1)
      .select(col("id"), explode(arrays_zip(
        slice(col("l"), lit(1), size(col("l")) - 1).as("p"),
        slice(col("l"), lit(2), size(col("l")) - 1).as("w"))).as("g"))
      .select(col("id"), pmod(
        H.hash32(37, concat(col("g.p"), lit(" "), col("g.w"))),
        lit(buckets)).as("b"))
    uni.union(bi)
  }

  /** DSIR-style importance weighting: score each corpus doc by how much
    * more likely its hashed n-gram features are under the `target`
    * distribution than under the corpus's own ("Data Selection via
    * Importance Resampling" — sample training data proportional to
    * exp(logw) to steer a raw crawl toward a quality/domain target).
    * Features are hashed unigrams + bigrams in a `buckets`-sized space;
    * both distributions are add-k smoothed bucket multinomials.
    * logw(d) = Σ_b c_db · (ln p_target(b) − ln p_raw(b)), rounded 4dp.
    * Returns (id, n_feat, logw); featureless docs are absent.
    *
    * Scale shape: both model tables are ≤ `buckets` rows no matter the
    * corpus size — broadcast joins against the per-doc counts, whose
    * groupBy is the only corpus-wide shuffle (map-side combined). The
    * target corpus is streamed once through the same featurizer; its
    * size never affects the join plan. */
  def importanceWeight(corpus: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1 << 14, k: Double = 1.0): DataFrame = {
    require(buckets > 0 && k > 0, "buckets and k must be positive")
    val dfc = hashedFeatures(corpus, idCol, textCol, buckets)
      .groupBy("id", "b").agg(count(lit(1)).cast("double").as("c"))
    // The target model is ≤ buckets rows by construction — collect it
    // once (bounded by `buckets`, never by target size) and serve the
    // scoring join from a local relation: the target featurizer runs
    // exactly once and no cache entry outlives the call.
    val spark = corpus.sparkSession
    val ctPlan = hashedFeatures(target, idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).cast("double").as("ct"))
    val ctRows = ctPlan.collect()
    // an empty/featureless target would make tt NULL and silently null
    // every logw — a caller error; fail loudly instead
    require(ctRows.nonEmpty,
      "target corpus has no features (empty or all-whitespace text)")
    val ct = spark.createDataFrame(
      java.util.Arrays.asList(ctRows: _*), ctPlan.schema)
    val tt = ct.agg(sum("ct").as("tt"))
    val cr = dfc.groupBy("b").agg(sum("c").as("cr"))
    val tr = cr.agg(sum("cr").as("tr"))
    val kb = lit(k * buckets)
    dfc.join(broadcast(ct), Seq("b"), "left")
      .join(broadcast(cr), Seq("b"))
      .crossJoin(broadcast(tt)).crossJoin(broadcast(tr))
      .groupBy("id")
      .agg(sum("c").cast("long").as("n_feat"),
        round(sum(col("c") *
          (log((coalesce(col("ct"), lit(0.0)) + k) / (col("tt") + kb))
            - log((col("cr") + k) / (col("tr") + kb)))), 4).as("logw"))
  }

  /** Gopher quality rules (Rae et al. 2021, the canonical pre-training
    * document filter) as one per-row pass: word count bounds, mean
    * word length in [3, 10], symbol-to-word ratio (# and ...) ≤ 0.1,
    * ≥ 80% of words containing an alphabetic char, and ≥ 2 hits from
    * the 8-stopword list (the|be|to|of|and|that|have|with). Returns
    * every metric plus the composite `pass` so callers can loosen
    * individual rules downstream; docs with zero words are absent
    * (they trivially fail). Ratios rounded 4dp for the cross-engine
    * contract.
    *
    * Scale shape: pure per-row Catalyst (split + array folds) — zero
    * shuffles, scan speed, whole-stage codegen. */
  /** [[gopherFilter]]'s composite verdict as ONE Column over the text
    * — the per-row form a streaming gate filters on directly (no
    * metrics frame, no join back to the stream, which would be an
    * unsupported stream-stream join). Thresholds compare the same
    * 4dp-rounded metrics the frame form emits (bit-identical verdicts,
    * spec-pinned); a zero-word doc fails — the frame form drops it,
    * and a gate keeps exactly the `pass` rows either way. */
  def gopherPassCol(text: Column, minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val ws = filter(split(trim(text), "\\s+"), w => length(w) > 0)
    val sym = (length(text) - length(regexp_replace(text, "#", ""))) +
      floor((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3)
    val n = size(ws)
    // nz, not n, as the divisor: under ANSI SQL the ratio subtrees
    // evaluate even when the n > 0 conjunct is false (no && laziness
    // in codegen), and a zero-word doc must FAIL the gate, not throw.
    // The frame form never divides by zero — it filters first.
    val nz = greatest(n, lit(1))
    val mwl = round(aggregate(ws, lit(0L), (a, w) => a + length(w))
      .cast("double") / nz, 4)
    val sr = round(sym.cast("double") / nz, 4)
    val ar = round(size(filter(ws, w => w.rlike("[A-Za-z]")))
      .cast("double") / nz, 4)
    val sh = size(filter(ws, w => lower(w).isin(stop: _*))).cast("long")
    n > 0 && n.cast("long") >= minWords && n.cast("long") <= maxWords &&
      mwl >= 3 && mwl <= 10 && sr <= 0.1 && ar >= 0.8 && sh >= 2
  }

  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val words = filter(split(trim(col(textCol)), "\\s+"),
      w => length(w) > 0)
    val t = col(textCol)
    val symbols = (length(t) - length(regexp_replace(t, "#", ""))) +
      floor((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
    df.select(col(idCol).as("id"), words.as("ws"), symbols.as("sym"))
      .filter(size(col("ws")) > 0)
      .select(col("id"),
        size(col("ws")).cast("long").as("n_words"),
        round(aggregate(col("ws"), lit(0L), (a, w) => a + length(w))
          .cast("double") / size(col("ws")), 4).as("mean_word_len"),
        round(col("sym").cast("double") / size(col("ws")), 4)
          .as("symbol_ratio"),
        round(size(filter(col("ws"), w => w.rlike("[A-Za-z]")))
          .cast("double") / size(col("ws")), 4).as("alpha_ratio"),
        size(filter(col("ws"), w => lower(w).isin(stop: _*)))
          .cast("long").as("stop_hits"))
      .withColumn("pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= 3 && col("mean_word_len") <= 10 &&
        col("symbol_ratio") <= 0.1 && col("alpha_ratio") >= 0.8 &&
        col("stop_hits") >= 2)
  }

  /** C4 cleanup rules (Raffel et al. 2020 §2.2) — the other canonical
    * pre-training filter next to [[gopherFilter]]; real pipelines run
    * both. Line level (a "line" is a newline-delimited, trimmed,
    * non-blank segment): keep only lines that end in a terminal
    * punctuation mark (. ! ? or a closing quote), contain ≥ 3
    * whitespace-delimited words, and do not contain the word
    * "javascript". Document level: flag pages containing the phrase
    * "lorem ipsum", a curly brace `{`, or any exact lowercase
    * whitespace-token match against `badWords` (C4's bad-word list is
    * a parameter here — ship your own). Returns per-rule metrics plus
    * the composite so callers can loosen individual rules:
    * (id, n_lines, n_kept, clean, has_lorem, has_brace, has_bad_word,
    * pass) where `clean` is the kept lines rejoined with `\n` and
    * pass = n_kept ≥ minLines ∧ no document flag (C4 drops pages with
    * fewer than 5 retained sentences; `minLines` is that floor).
    * Blank-only docs survive with n_lines = 0 (they just fail `pass`).
    *
    * Scale shape: pure per-row Catalyst (split + array lambdas) —
    * zero shuffles, scan speed, whole-stage codegen, same as
    * [[gopherFilter]]. */
  def c4Filter(df: DataFrame, idCol: String, textCol: String,
      minLines: Int = 5, badWords: Seq[String] = Nil): DataFrame = {
    val bad = badWords.map(_.toLowerCase)
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    val kept = filter(col("ls"), l =>
      l.rlike("[.!?\"]$") &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= 3 &&
        !lower(l).rlike("\\bjavascript\\b"))
    val badHit =
      if (bad.isEmpty) lit(false)
      else exists(split(lower(col(textCol)), "\\s+"), w => w.isin(bad: _*))
    df.select(col(idCol).as("id"), col(textCol), lines.as("ls"))
      .withColumn("kept", kept)
      .select(col("id"),
        size(col("ls")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), "\n").as("clean"),
        lower(col(textCol)).contains("lorem ipsum").as("has_lorem"),
        col(textCol).contains("{").as("has_brace"),
        badHit.as("has_bad_word"))
      .withColumn("pass",
        col("n_kept") >= minLines && !col("has_lorem") &&
          !col("has_brace") && !col("has_bad_word"))
  }

  /** Token-budget mixture sampling: fill each stratum's token budget
    * with the deterministic hash-ordered prefix of its docs — the
    * data-mixing step that assembles a training set as "N tokens of
    * source A, M of source B" rather than by keep fractions
    * ([[stratifiedSample]]'s domain). A doc is kept iff the running
    * token total through it stays ≤ its stratum's budget; strata
    * absent from `budgets` are dropped. Returns
    * (id, stratum, n_tok, cum_tok). Deterministic under re-runs and
    * repartitioning: the order is (hash32(seed, id), id), never
    * partition order.
    *
    * Scale shape: a global per-stratum running sum is inherently
    * sequential, so it is computed as a DISTRIBUTED PREFIX SUM — docs
    * range-bucket by hash; per-(stratum, bucket) token sums (one
    * map-side-combined groupBy, ≤ strata×buckets rows) come to the
    * driver for an exclusive prefix; each bucket then runs its own
    * window with the offset added. No stratum-wide single-partition
    * window — the per-bucket windows are the only sorts, and `buckets`
    * bounds their size at corpus/buckets. The driver collect is bounded
    * by budgets.size × buckets, independent of corpus size. */
  def budgetSample(df: DataFrame, idCol: String, textCol: String,
      stratumCol: String, budgets: Map[String, Long], buckets: Int = 64,
      seed: Int = 41): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets > 0, "buckets must be positive")
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      "budgets must be non-empty and non-negative")
    val base = df
      .filter(col(stratumCol).cast("string").isin(budgets.keySet.toSeq: _*))
      .select(col(idCol).as("id"),
        col(stratumCol).cast("string").as("stratum"),
        T.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("h", H.hash32(seed, col("id").cast("string")))
      // range bucket, monotone in h: global (h, id) order ==
      // (bkt, h, id) order; hash ties share a bucket by construction
      .withColumn("bkt",
        (col("h") * buckets / lit(4294967296L)).cast("int"))
    val s = df.sparkSession
    import s.implicits._
    val bucketSums = base.groupBy("stratum", "bkt")
      .agg(sum("n_tok").as("bt"))
      .as[(String, Int, Long)].collect()
    val offsets = bucketSums.groupBy(_._1).toSeq.flatMap {
      case (stratum, rows) =>
        rows.sortBy(_._2).scanLeft((stratum, -1, 0L, 0L)) {
          case ((_, _, acc, _), (_, bkt, bt)) => (stratum, bkt, acc + bt, acc)
        }.drop(1).map { case (st, bkt, _, off) => (st, bkt, off) }
    }.toDF("stratum", "bkt", "off")
    val w = Window.partitionBy("stratum", "bkt").orderBy("h", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("stratum", "bkt"))
      .withColumn("cum_tok", col("off") + sum("n_tok").over(w))
      .filter(col("cum_tok") <=
        element_at(typedlit(budgets), col("stratum")))
      .select("id", "stratum", "n_tok", "cum_tok")
  }

  /** Sequence packing (concat-and-chop): assign docs to fixed-token-
    * budget training sequences. Docs are sharded deterministically by
    * id hash, ordered by id within the shard, and laid end-to-end; a
    * doc's sequence is the one its first token lands in
    * (seq_id = floor(start_tok / budget)). Returns
    * (id, shard, n_tok, start_tok, seq_id).
    *
    * Scale shape: the only wide operation is one running-sum window
    * per shard — `shards` bounds the packing parallelism, so size it
    * to the cluster (each shard's window is a single sort of its
    * slice, never a global single-partition sort). Token counts are
    * the whitespace tokenizer's (TextFunctions.tokenCount), codegen'd. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int = 32, seed: Int = 29): DataFrame =
    packSequencesBy(df, idCol, T.tokenCount(col(textCol)), budget,
      shards, seed)

  /** [[packSequences]] under an arbitrary per-row token-count column —
    * the whitespace contract for raw text, a trained tokenizer's
    * subword counts once one exists (a packing budget only means
    * anything in the tokens the training job will actually see; see
    * q_pack_bpe for the [[Bpe.tokenize]] composition). */
  def packSequencesBy(df: DataFrame, idCol: String, nTok: Column,
      budget: Int, shards: Int = 32, seed: Int = 29): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val w = Window.partitionBy("shard").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("id"),
        nTok.cast("long").as("n_tok"),
        pmod(H.hash32(seed, col(idCol).cast("string")), lit(shards)).as("shard"))
      .withColumn("start_tok", sum("n_tok").over(w) - col("n_tok"))
      .withColumn("seq_id", floor(col("start_tok") / budget))
  }

  /** The end-to-end curation recipe — the stage chain a pretraining
    * data run executes, each stage feeding the next's input (RefinedWeb
    * / Gopher / Lee-et-al assembled in their published order): within-
    * doc line dedup (crawl nav/footer boilerplate collapses) → Gopher
    * quality gate → benchmark decontamination against `bench` (w-char
    * verbatim-run overlap; w defaults to 30 — a shared 30-char run
    * means a real eval-set leak, where shorter shingles flag benign
    * vocabulary overlap) → minhash near-dup clusters over the
    * SURVIVORS (df caps and Jaccard on the filtered corpus, as a
    * staged pipeline sees it) → canonical selection by `qualityCol` →
    * token-budget mixture fill. Returns budgetSample's manifest
    * (id, stratum, n_tok, cum_tok).
    *
    * Scale shape: pure composition of the §2 operators — the glue is
    * semi-joins on the id (AQE broadcasts the small filtered sides);
    * no new shuffle beyond the stages' own, and every stage's own
    * scale story (zero-shuffle scans, banded LSH, distributed prefix
    * sum) is unchanged by the chaining. */
  def curationPipeline(pool: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, stratumCol: String, qualityCol: String,
      budgets: Map[String, Long], minWords: Int = 20, decontamW: Int = 30,
      minhashW: Int = 8, numHashes: Int = 12, bands: Int = 4,
      tau: Double = 0.5, maxDf: Option[Int] = Some(100),
      buckets: Int = 64, sep: String = "\n"): DataFrame = {
    val meta = pool.select(col(idCol), col(stratumCol), col(qualityCol))
    val cleaned = Dedup.dedupLinesInDoc(pool, idCol, textCol, sep)
      .select(col("id").as(idCol), col("clean").as(textCol))
      .join(meta, Seq(idCol))
    val quality = cleaned.join(
      gopherFilter(cleaned, idCol, textCol, minWords)
        .filter(col("pass")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    val survivors = decontaminate(quality, bench, idCol, textCol,
      w = decontamW)
    val clusters = Dedup.dupClusters(
      Dedup.minhashLsh(survivors, idCol, textCol, minhashW, numHashes,
        bands, tau, maxDf).select("id_a", "id_b"))
    val canonical = Dedup.keepCanonical(survivors, clusters, idCol,
      qualityCol)
    budgetSample(canonical, idCol, textCol, stratumCol, budgets, buckets)
  }

  /** Temperature-scaled mixture sampling (the multilingual re-balancing
    * rule of Conneau & Lample 2019 §3.1, also mBERT's exponential
    * smoothing): strata contribute to the mixture with probability
    * q_d ∝ p_d^alpha where p_d = n_d / N — alpha = 1 keeps the natural
    * distribution, alpha = 0 flattens to uniform, the published
    * sweet spots (0.3-0.7) up-sample the tail without drowning the
    * head. Materialized as keep fractions for an expected-`budget`-doc
    * mixture: f_d = min(1, budget·q_d / n_d), admission by the same
    * deterministic hash predicate as [[stratifiedSample]] (no RNG —
    * stable under re-runs and repartitioning). Returns
    * (id, stratum, keep_ppm) for kept rows, keep_ppm = round(f_d·1e6)
    * — integer thresholds, so the admission boundary is exact in both
    * engines. NULL strata drop (no size, no fraction — same as a
    * stratum with n=0).
    *
    * Scale shape: the stratum-size frame is one map-side-combined
    * groupBy (rows = distinct strata, not corpus); its normalizer is a
    * broadcast one-row agg; the thresholds broadcast back onto the
    * corpus scan, and the admission filter is a pure codegen'd
    * predicate — a single narrow pass over 100 TB, identical to
    * [[stratifiedSample]]'s plan plus one tiny aggregate. */
  def temperatureMixture(df: DataFrame, idCol: String, stratumCol: String,
      alpha: Double, budget: Long, seed: Int = 23): DataFrame =
    applyMixture(df, mixtureThresholds(df, stratumCol, alpha, budget),
      idCol, stratumCol, seed)

  /** Token-weighted temperature mixture: the published α-sampling
    * recipes (XLM's exponential smoothing, the Pile/ROOTS mixture
    * tables) weight strata by TOKEN mass, not document count — a
    * stratum of few long documents should hold the same mixture share
    * as one of many short ones. Identical formula with n_d = the
    * stratum's token sum and `budgetTokens` an expected-token budget:
    * q_d ∝ tok_d^alpha, f_d = min(1, budget·q_d / tok_d); admission
    * stays the per-DOC deterministic hash predicate, so kept token
    * mass is f_d·tok_d in expectation. Same single-narrow-pass scale
    * shape as [[temperatureMixture]] — the token sum rides the one
    * map-side-combined groupBy. */
  def temperatureMixtureTokens(df: DataFrame, idCol: String,
      stratumCol: String, textCol: String, alpha: Double,
      budgetTokens: Long, seed: Int = 23): DataFrame =
    applyMixture(df,
      mixtureThresholdsBy(df, stratumCol,
        sum(graft.functions.TextFunctions.tokenCount(col(textCol)))
          .cast("double"),
        alpha, budgetTokens),
      idCol, stratumCol, seed)

  /** The (stratum, keep_ppm) threshold table for [[temperatureMixture]],
    * computed from `ref` — exposed separately so the streaming form can
    * pin thresholds to a static history corpus while the batch form
    * derives them from its own input. */
  private[graft] def mixtureThresholds(ref: DataFrame, stratumCol: String,
      alpha: Double, budget: Long): DataFrame =
    mixtureThresholdsBy(ref, stratumCol, count(lit(1)).cast("double"),
      alpha, budget)

  /** [[mixtureThresholds]] under an arbitrary stratum-size aggregate —
    * count(*) for the doc-count mixture, a token sum for the
    * token-weighted one. The 1/N^alpha normalizer cancellation holds
    * for any positive size measure. */
  private[graft] def mixtureThresholdsBy(ref: DataFrame, stratumCol: String,
      sizeAgg: Column, alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0, "alpha must be non-negative")
    require(budget >= 0, "budget must be non-negative")
    // NULL strata are OUT of the mixture entirely: applyMixture's inner
    // join drops their rows, so they must not consume normalizer mass
    // here either (at alpha=0 a NULL group would add a full 1 to z and
    // deflate every real stratum's keep fraction below budget)
    val sizes = ref.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(sizeAgg.as("n"))
    // p_d^alpha / Σ p_e^alpha == n_d^alpha / Σ n_e^alpha (the 1/N^alpha
    // factor cancels), so normalize raw counts directly
    val z = sizes.agg(sum(pow(col("n"), alpha)).as("z"))
    sizes.crossJoin(broadcast(z))
      .withColumn("keep_ppm", round(
        least(lit(1.0),
          lit(budget.toDouble) * (pow(col("n"), alpha) / col("z")) / col("n"))
          * 1e6).cast("long"))
      .select("stratum", "keep_ppm")
  }

  /** Admission half of [[temperatureMixture]]: stateless hash predicate
    * against a broadcast threshold table — applies to batch and
    * streaming frames alike. */
  private[graft] def applyMixture(df: DataFrame, thresholds: DataFrame,
      idCol: String, stratumCol: String, seed: Int): DataFrame =
    df.select(col(idCol).as("id"),
        col(stratumCol).cast("string").as("stratum"))
      .join(broadcast(thresholds), Seq("stratum"))
      .filter(H.hash32(seed, col("id").cast("string")) % 1000000
        < col("keep_ppm"))
      .select("id", "stratum", "keep_ppm")

  /** CCNet-style corpus bucketing (Wenzek et al. 2020's head / middle /
    * tail): assign each doc a bucket by where its score falls in the
    * corpus's own empirical CDF. Thresholds are DISCRETE quantiles —
    * the smallest score whose cumulative fraction reaches the cut —
    * computed over the score histogram, so there is no interpolation
    * arithmetic to disagree on across engines and the result is exact.
    * `cuts` are ascending fractions in (0,1); `labels` has
    * cuts.size+1 entries, first label = lowest scores (CCNet's head is
    * LOW perplexity); a doc lands in the first cut whose threshold its
    * score does not exceed. NULL scores drop (no place on the CDF).
    * Returns (id, score, bucket).
    *
    * Scale shape: the histogram has one row per DISTINCT score value —
    * corpus-INDEPENDENT for discrete or rounded scores (token counts,
    * 4dp cross-entropies) — so the one ordered cumulative pass (the
    * lone unpartitioned window here) runs over a value-bounded frame,
    * never the corpus; thresholds are a cuts-sized driver collect, and
    * bucket assignment is a codegen'd when-chain on the scan. Round
    * continuous scores before bucketing (the 4dp convention the
    * scoring operators already emit) to keep the histogram bounded. */
  def scoreBuckets(df: DataFrame, idCol: String, scoreCol: Column,
      cuts: Seq[Double], labels: Seq[String]): DataFrame =
    applyBuckets(df, idCol, scoreCol,
      bucketThresholds(df, scoreCol, cuts), cuts, labels)

  /** The discrete-quantile cut points of `scoreCol`'s empirical CDF
    * over `ref` — None for an empty reference. Exposed separately so
    * the streaming form can pin thresholds to a static history corpus
    * while the batch form derives them from its own input. Bounded
    * collect: one double per cut (the codebook-literal pattern). */
  private[graft] def bucketThresholds(ref: DataFrame, scoreCol: Column,
      cuts: Seq[Double]): Option[Seq[Double]] = {
    import org.apache.spark.sql.expressions.Window
    require(cuts.nonEmpty && cuts == cuts.sorted &&
      cuts.distinct == cuts && cuts.forall(p => p > 0 && p < 1),
      "cuts must be strictly ascending fractions in (0,1)")
    val base = ref.select(scoreCol.cast("double").as("score"))
      .filter(col("score").isNotNull)
    val hist = base.groupBy("score").agg(count(lit(1)).as("c"))
    val n = hist.agg(sum("c").as("n"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = hist.crossJoin(broadcast(n))
      .withColumn("f", sum("c").over(w) / col("n"))
    val aggs = cuts.zipWithIndex.map { case (p, i) =>
      min(when(col("f") >= p, col("score"))).as(s"t$i") }
    val row = cdf.agg(aggs.head, aggs.tail: _*).head
    if (row.isNullAt(0)) None else Some(cuts.indices.map(row.getDouble))
  }

  /** Assignment half of [[scoreBuckets]]: a codegen'd when-chain over
    * literal thresholds — applies to batch and streaming frames alike.
    * `thresholds = None` (empty reference) keeps rows with NULL bucket. */
  private[graft] def applyBuckets(df: DataFrame, idCol: String,
      scoreCol: Column, thresholds: Option[Seq[Double]],
      cuts: Seq[Double], labels: Seq[String]): DataFrame = {
    require(labels.size == cuts.size + 1,
      s"need ${cuts.size + 1} labels for ${cuts.size} cuts")
    val base = df.select(col(idCol).as("id"),
        scoreCol.cast("double").as("score"))
      .filter(col("score").isNotNull)
    thresholds match {
      case None => base.withColumn("bucket", lit(null).cast("string"))
      case Some(ts) =>
        val bucket = ts.zip(labels.init).foldRight(lit(labels.last): Column) {
          case ((t, l), acc) => when(col("score") <= t, lit(l)).otherwise(acc)
        }
        base.withColumn("bucket", bucket)
    }
  }

  /** Deterministic epoch shuffle: training readers need the corpus in a
    * reproducible pseudo-random order, sharded for parallel loaders.
    * shard = hash(seed, id) mod numShards; pos = rank of
    * (hash(seed+1, id), id) within the shard — a total, collision-free
    * (ties break on id), RNG-free assignment, stable under re-runs and
    * repartitioning. Different seeds give independent epoch orders.
    * Returns (id, shard, pos); write partitionBy("shard") +
    * sortWithinPartitions("pos") for ready-to-stream epoch files.
    *
    * Scale shape: one hash shuffle into numShards groups + a
    * per-shard sort (the row_number window) — numShards bounds each
    * sort at corpus/numShards exactly like [[packSequences]]' shards,
    * so there is never a global or single-partition sort; size
    * numShards to the reader fleet. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
      seed: Int = 37): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, "numShards must be positive")
    val w = Window.partitionBy("shard").orderBy(col("ord"), col("id"))
    df.select(col(idCol).as("id"))
      .withColumn("shard",
        pmod(H.hash32(seed, col("id").cast("string")), lit(numShards)))
      .withColumn("ord", H.hash32(seed + 1, col("id").cast("string")))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select("id", "shard", "pos")
  }

  /** Snapshot diff between two corpus versions keyed by id — the
    * incremental-pipeline primitive ("what changed since the last
    * crawl?") that decides which docs re-enter the embed/dedup/index
    * stages instead of reprocessing the whole corpus. One row per id
    * present in EITHER snapshot: status `added` (new only), `removed`
    * (old only), `changed` (both, normalized-text fingerprint
    * differs), `unchanged`. Same text identity as [[Dedup.exact]]
    * (md5 over normText), so "changed" means exactly "the exact-dedup
    * layer would treat it as a different text".
    *
    * Contract: `idCol` unique within each snapshot (it is the join
    * key; duplicate ids would cross-product).
    *
    * Scale shape: each side collapses to (id, 16-byte fp) at scan
    * time — the full-outer join shuffles fingerprints, never text,
    * and both snapshot scans prune to two columns. At 100 TB this is
    * two column-pruned scans + one join on the id key; if snapshots
    * are stored bucketed by id the shuffle disappears entirely. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence is keyed on explicit markers, NOT fingerprint nullness:
    // a NULL-text row is PRESENT (its fp is NULL) — inferring absence
    // from the fp would call a removed NULL-text doc "added" and issue
    // no delete for it. The text comparison is null-safe for the same
    // reason (NULL text vs real text = changed; NULL vs NULL = same).
    val o = oldDf.select(col(idCol).as("id"),
      T.fingerprintMd5(col(textCol)).as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol).as("id"),
      T.fingerprintMd5(col(textCol)).as("__fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** The per-stratum training-budget table — the "mixture table" a
    * training run is configured from (LLaMA/DoReMi style: source,
    * tokens, sampling weight, epochs): α-temperature weights over
    * per-stratum token mass and a total token budget, emitting the
    * implied epochs per source — epochs > 1 means the stratum repeats
    * (upsampling), < 1 means subsampling. Same weight arithmetic and
    * NULL-stratum exclusion as [[temperatureMixtureTokens]] (n^α/Σn^α);
    * where the mixture operator FILTERS docs to meet the plan, this
    * emits the plan itself. Returns (stratum, n_docs, n_tokens,
    * weight 6dp, planned_tokens, epochs 4dp; epochs NULL for a
    * zero-token stratum).
    *
    * Scale shape: one map-side-combined groupBy to stratum granularity,
    * then single-row-broadcast normalizer arithmetic — nothing scales
    * with anything but the stratum count. */
  def epochPlan(df: DataFrame, stratumCol: String, textCol: String,
      alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha >= 0, "alpha must be non-negative")
    require(budgetTokens >= 0, "budget must be non-negative")
    val sizes = df.filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        sum(T.tokenCount(col(textCol))).cast("long").as("n_tokens"))
    val z = sizes.agg(sum(pow(col("n_tokens"), alpha)).as("__z"))
    sizes.crossJoin(broadcast(z))
      .withColumn("weight",
        round(pow(col("n_tokens"), alpha) / col("__z"), 6))
      .withColumn("planned_tokens",
        round(lit(budgetTokens.toDouble) *
          pow(col("n_tokens"), alpha) / col("__z")).cast("long"))
      .withColumn("epochs",
        when(col("n_tokens") > 0,
          round(col("planned_tokens").cast("double") / col("n_tokens"), 4)))
      .select("stratum", "n_docs", "n_tokens", "weight",
        "planned_tokens", "epochs")
  }

  /** Materialize an [[epochPlan]]: the repeated-corpus realization a
    * training reader consumes — one (id, stratum, epoch) row per PASS
    * of each doc. Every doc in a planned stratum appears
    * floor(epochs) times (epoch 0..floor−1); the fractional remainder
    * is admitted by the deterministic hash predicate
    * ([[stratifiedSample]]'s mechanics, integer ppm threshold so the
    * boundary is engine-exact), gaining one extra pass. epochs < 1
    * degrades to pure subsampling (only the admitted fraction appears,
    * once); a NULL-epochs stratum (zero tokens) emits nothing. Compose
    * with [[shuffleShards]] / [[packSequencesBy]] keyed on (id, epoch)
    * for the physical layout.
    *
    * Scale shape: the plan broadcasts (stratum-count rows); the corpus
    * pass is one scan + an explode bounded by the stratum's epoch
    * count — the output size IS the plan's token budget, the honest
    * cost of upsampling. */
  def applyEpochPlan(df: DataFrame, idCol: String, stratumCol: String,
      plan: DataFrame, seed: Int = 41): DataFrame = {
    val p = plan.filter(col("epochs").isNotNull)
      .select(col("stratum"),
        floor(col("epochs")).cast("int").as("__full"),
        round((col("epochs") - floor(col("epochs"))) * 1000000.0)
          .cast("long").as("__frac_ppm"))
    df.select(col(idCol).as("id"),
        col(stratumCol).cast("string").as("stratum"))
      .join(broadcast(p), Seq("stratum"))
      .withColumn("__n", col("__full") +
        (H.hash32(seed, col("id").cast("string")) % 1000000 <
          col("__frac_ppm")).cast("int"))
      // filter BEFORE the explode: sequence(0, -1) would DESCEND, not
      // come back empty
      .filter(col("__n") > 0)
      .select(col("id"), col("stratum"),
        explode(sequence(lit(0), col("__n") - 1)).as("__e"))
      .select(col("id"), col("stratum"), col("__e").cast("long").as("epoch"))
  }

  /** Daily-crawl triage: the action plan [[corpusDiff]] exists to feed.
    * Per id in either snapshot, decide what the downstream
    * embed/dedup/index stages should DO with it:
    *
    *   - `unchanged` → `skip_unchanged` (already indexed; nothing moves)
    *   - `removed`   → `delete` (tombstone the index entry)
    *   - `added`/`changed` re-enter the pipeline and run two gates, in
    *     pipeline order:
    *     1. quality — [[gopherPassCol]] over the NEW text; fail →
    *        `skip_quality` (a changed doc that degraded below the bar
    *        is not re-indexed — its stale entry is the operator's
    *        caller's retention decision, same as the reference's
    *        upsert-only ingest);
    *     2. exact dedup under the [[Dedup.exact]] text identity —
    *        `skip_duplicate` when the new fingerprint already exists
    *        anywhere in the OLD snapshot (history collision), or when
    *        another re-entering doc with the same fingerprint has a
    *        smaller id (within-batch collision; smallest id wins, the
    *        exact-dedup convention);
    *     survivors → `upsert`.
    *
    * Returns (id, status, action), one row per id in either snapshot.
    * Contract: `idCol` unique within each snapshot.
    *
    * Scale shape: text never shuffles — fingerprints and the quality
    * verdict are computed at scan time, so every join moves
    * (id, 16-byte fp, bool) rows. The diff frame is persisted (it
    * feeds both the re-enter path and the final action join — one
    * o⋈n execution, not two); the old snapshot is scanned twice
    * (once into the diff, once for the history-fingerprint anti-join
    * — both passes column-pruned to id+text), the new snapshot once.
    * The history-dup check is a fingerprint anti-join (never a
    * broadcast of the corpus); the batch-winner groupBy is map-side
    * combined on the fingerprint key. */
  def crawlTriage(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val (out, pins) = crawlTriagePlan(oldDf, newDf, idCol, textCol,
      minWords, maxWords)
    CacheLifecycle.handOff(out, pins)
  }

  /** [[crawlTriage]] BEFORE the cache hand-off — the un-materialized
    * plan plus its pinned internals, for plan-shape specs. */
  private[graft] def crawlTriagePlan(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String, minWords: Int,
      maxWords: Int): (DataFrame, Seq[DataFrame]) = {
    // same presence-marker + null-safe-compare discipline as
    // [[corpusDiff]]; a NULL-text doc FAILS quality (coalesce false)
    // rather than null-propagating past the skip_quality branch
    val o = oldDf.select(col(idCol).as("id"),
      T.fingerprintMd5(col(textCol)).as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol).as("id"),
      T.fingerprintMd5(col(textCol)).as("__fp_new"),
      coalesce(gopherPassCol(col(textCol), minWords, maxWords),
        lit(false)).as("__pass"),
      lit(true).as("__in_new"))
    // pinned: the diff frame feeds BOTH the re-enter path and the final
    // action join — without the persist the o⋈n full outer (and both
    // text scans behind it) would execute twice; registered at the
    // hand-off below so CacheLifecycle.release(result) frees it
    val diff = o.join(n, Seq("id"), "full_outer")
      .select(col("id"), col("__fp_new"), col("__pass"),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .persist()
    val reenter = diff
      .filter(col("status").isin("added", "changed") && col("__pass"))
      .select("id", "__fp_new")
    val winners = reenter.groupBy("__fp_new")
      .agg(min(col("id")).as("__win_id"))
    val upserts = reenter
      .join(o.select(col("__fp_old").as("__fp_new")), Seq("__fp_new"),
        "left_anti")
      .join(winners, Seq("__fp_new"))
      .filter(col("id") === col("__win_id"))
      .select(col("id"), lit(true).as("__upsert"))
    (diff.join(upserts, Seq("id"), "left_outer")
      .select(col("id"), col("status"),
        when(col("status") === "unchanged", lit("skip_unchanged"))
          .when(col("status") === "removed", lit("delete"))
          .when(!col("__pass"), lit("skip_quality"))
          .when(col("__upsert").isNotNull, lit("upsert"))
          .otherwise(lit("skip_duplicate")).as("action")),
      Seq(diff))
  }
}
