package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent plain-Scala BPE trainer (Sennrich et al. 2016's
    * published algorithm verbatim): the same semantics implemented a
    * second way, with no shared code beyond the tie-break contract. */
  private def refTrain(words: Map[String, Long], numMerges: Int,
      minFreq: Long = 2L): Seq[(Int, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, n) => (w.map(_.toString).toVector :+ "</w>") -> n }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var stop = false
    while (step <= numMerges && !stop) {
      val counts = vocab.toSeq
        .flatMap { case (s, n) => s.zip(s.tail).map(p => p -> n) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), f) = counts.minBy { case ((a, b), f) => (-f, a, b) }
        if (f < minFreq) stop = true
        else {
          out += ((step, a, b, a + b, f))
          vocab = vocab.map { case (s, n) =>
            val merged = s.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc.init :+ (a + b)
              else acc :+ x
            }
            merged -> n
          }
          step += 1
        }
      }
    }
    out.result()
  }

  private def refFinalVocab(words: Map[String, Long],
      rules: Seq[(String, String)]): Map[String, Vector[String]] =
    words.keys.map { w =>
      val syms0 = w.map(_.toString).toVector :+ "</w>"
      w -> rules.foldLeft(syms0) { case (s, (a, b)) =>
        s.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }
    }.toMap

  // Sennrich's worked corpus shape: repeated words with shared suffixes
  private val corpusWords: Seq[(String, Int)] = Seq(
    "low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
  private def corpusDf =
    corpusWords.flatMap { case (w, n) => Seq.fill(n)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text")

  test("train matches an independent reference implementation, merge for merge") {
    val got = Bpe.train(corpusDf, "text", numMerges = 10)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    val expect = refTrain(corpusWords.map { case (w, n) => w -> n.toLong }.toMap, 10)
    assert(got == expect, s"\ngot    $got\nexpect $expect")
    // the classic first merges: 'es' (9 = newest 6 + widest 3) before
    // anything from the 7-weight 'lo' family
    assert(got.head._4 == "es" && got.head._5 == 9L)
    assert(got.map(_._4).take(3) == Seq("es", "est", "est</w>"))
  }

  test("early stop: merges end when no pair reaches minFreq") {
    // every word unique -> after the shared-suffix merges run dry, all
    // remaining pairs are singletons and training must stop early
    val df = Seq((1L, "ab"), (2L, "cd"), (3L, "ef")).toDF("id", "text")
    val got = Bpe.train(df, "text", numMerges = 50)
    assert(got.count() == 0, "all pairs are singletons at minFreq=2")
    val one = Bpe.train(df, "text", numMerges = 50, minFreq = 1L)
      .as[(Int, String, String, String, Long)].collect()
    assert(one.nonEmpty && one.forall(_._5 == 1L))
    // 3 words x 2 chars + </w>: 2 merges each collapse a word to one
    // symbol; 6 merges total, all at freq 1, in deterministic tie order
    assert(one.length == 6)
  }

  test("encode under trained rules reproduces the reference final vocabulary") {
    val rulesDf = Bpe.train(corpusDf, "text", numMerges = 6)
    val rules = rulesDf.orderBy("step").select("left", "right")
      .as[(String, String)].collect().toSeq
    val got = Bpe.encode(corpusDf, "text", rules)
      .select("w", "syms", "n").as[(String, Seq[String], Long)].collect()
      .map(r => r._1 -> (r._2.toVector, r._3)).toMap
    val expect = refFinalVocab(
      corpusWords.map { case (w, n) => w -> n.toLong }.toMap, rules)
    assert(got.keySet == expect.keySet)
    got.foreach { case (w, (syms, n)) =>
      assert(syms == expect(w), s"word $w: $syms vs ${expect(w)}")
      assert(n == corpusWords.toMap.apply(w).toLong)
    }
    // vocabulary: symbol counts over the final forms, weighted by word n
    val vocab = Bpe.vocabulary(corpusDf, "text", rulesDf)
      .as[(String, Long)].collect().toMap
    val expVocab = expect.toSeq
      .flatMap { case (w, syms) =>
        syms.map(_ -> corpusWords.toMap.apply(w).toLong) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(vocab == expVocab, s"$vocab vs $expVocab")
  }

  test("tokenize: per-doc subword streams match the reference expansion, lexicographic ids") {
    val rulesDf = Bpe.train(corpusDf, "text", numMerges = 6)
    val rules = rulesDf.orderBy("step").select("left", "right")
      .as[(String, String)].collect().toSeq
    val forms = refFinalVocab(
      corpusWords.map { case (w, n) => w -> n.toLong }.toMap, rules)
    val idOf = forms.values.flatten.toSet.toSeq.sorted.zipWithIndex.toMap
    // multi-word docs: word order and both position axes must hold
    val docs = Seq((1L, "low lower"), (2L, "newest"), (3L, "widest low"))
      .toDF("id", "text")
    val got = Bpe.tokenize(docs, "id", "text", rulesDf)
      .select("id", "wpos", "spos", "symbol", "sym_id")
      .as[(Long, Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._2, r._3)).toSeq).toMap
    val docWords = Map(1L -> Seq("low", "lower"), 2L -> Seq("newest"),
      3L -> Seq("widest", "low"))
    docWords.foreach { case (id, words) =>
      val expect = words.zipWithIndex.flatMap { case (w, wp) =>
        forms(w).zipWithIndex.map { case (sym, sp) =>
          (id, wp.toLong, sp.toLong, sym, idOf(sym).toLong) }
      }
      assert(got(id) == expect, s"doc $id:\n${got(id)}\nvs\n$expect")
    }
  }

  test("saveMerges/loadMerges: the persisted tokenizer round-trips rule-for-rule") {
    val trained = Bpe.train(corpusDf, "text", numMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("bpem").toString + "/merges"
    Bpe.saveMerges(trained, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded.orderBy("step")
        .as[(Int, String, String, String, Long)].collect().toSeq ==
      trained.orderBy("step")
        .as[(Int, String, String, String, Long)].collect().toSeq)
    // encoding under the loaded artifact equals encoding under the
    // in-memory frame — the retrain-free deployment path
    val a = Bpe.encode(corpusDf, "text", loaded)
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    val b = Bpe.encode(corpusDf, "text", trained)
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    assert(a == b)
  }

  test("initialPairs: the step-0 distribution over chars + terminal") {
    val df = Seq((1L, "ab ab b")).toDF("id", "text")
    val got = Bpe.initialPairs(df, "text")
      .as[(String, String, Long)].collect().toSet
    // "ab" x2: (a,b) 2, (b,</w>) 2; "b" x1: (b,</w>) 1 -> 3 total
    assert(got == Set(("a", "b", 2L), ("b", "</w>", 3L)), s"$got")
  }

  test("empty corpus: train and initialPairs return empty, no crash") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Bpe.train(empty, "text", numMerges = 5).count() == 0)
    assert(Bpe.initialPairs(empty, "text").count() == 0)
  }

  test("trainer tiers are merge-for-merge equal: local finish vs distributed loop") {
    // same corpus through both tiers: the default (vocab fits the cap →
    // driver-local merge loop) and localVocabCap=0 (forced distributed)
    val local = Bpe.train(corpusDf, "text", numMerges = 10)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    val dist = Bpe.train(corpusDf, "text", numMerges = 10, localVocabCap = 0)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    assert(local == dist, s"\nlocal $local\ndist  $dist")
    // and both match the independent reference
    assert(local == refTrain(
      corpusWords.map { case (w, n) => w -> n.toLong }.toMap, 10))
    // tie-break coverage: the all-singleton corpus (every pair freq 1,
    // winner decided purely by the lexicographic tie-break) must agree too
    val ties = Seq((1L, "ab"), (2L, "cd"), (3L, "ef")).toDF("id", "text")
    val lt = Bpe.train(ties, "text", numMerges = 50, minFreq = 1L)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    val dt = Bpe.train(ties, "text", numMerges = 50, minFreq = 1L,
        localVocabCap = 0)
      .orderBy("step").as[(Int, String, String, String, Long)].collect().toSeq
    assert(lt == dt, s"\nlocal $lt\ndist  $dt")
  }

  test("kernel encoder is bit-equal to the fold encoder on randomized rule lists") {
    val rnd = new scala.util.Random(13L)
    val words = (0 until 300).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(11)))
        .map(_ => "abc".charAt(rnd.nextInt(3))).mkString)
    }
    val df = words.toDF("id", "text")
    // rule lists mixing applicable chains and never-applicable pairs —
    // the dispatch seam (FoldRuleCap) is crossed by the long list
    val alphabet = Seq("a", "b", "c", "ab", "bc", "aa", "abc", "</w>")
    (0 until 3).foreach { trial =>
      val n = Seq(5, 24, 40)(trial)
      val rules = (0 until n).map { _ =>
        (alphabet(rnd.nextInt(alphabet.length)),
          alphabet(rnd.nextInt(alphabet.length)))
      }
      val fold = Bpe.encodeFold(df, "text", rules)
        .select("w", "syms", "n").as[(String, Seq[String], Long)]
        .collect().toSet
      val kernel = Bpe.encodeKernel(df, "text", rules)
        .select("w", "syms", "n").as[(String, Seq[String], Long)]
        .collect().toSet
      assert(kernel == fold, s"trial $trial diverged")
    }
  }

  test("kernel encoder applies a production-length rule list (600 rules) in one pass") {
    val rnd = new scala.util.Random(41L)
    val words = (0 until 400).map { i =>
      (i.toLong, (0 until (2 + rnd.nextInt(10)))
        .map(_ => "abcd".charAt(rnd.nextInt(4))).mkString)
    }
    // chain-aware synthetic rules: later rules may consume earlier
    // rules' merged symbols, like a real trained list
    var symbols = Vector("a", "b", "c", "d", "</w>")
    val rules = (0 until 600).map { _ =>
      val a = symbols(rnd.nextInt(symbols.length))
      val b = symbols(rnd.nextInt(symbols.length))
      if (symbols.length < 40 && (a + b).length <= 8 &&
        !symbols.contains(a + b)) symbols :+= a + b
      (a, b)
    }
    assert(rules.length > Bpe.FoldRuleCap)
    def refApply(w: String): Vector[String] =
      rules.foldLeft(w.map(_.toString).toVector :+ "</w>") {
        case (s, (a, b)) =>
          s.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
      }
    // the public encode dispatches to the kernel above FoldRuleCap
    val got = Bpe.encode(words.toDF("id", "text"), "text", rules)
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    words.map(_._2).distinct.foreach { w =>
      assert(got(w) == refApply(w), s"word '$w'")
    }
  }

  test("encode reconstruction invariant: syms always concatenate back to word + </w>, any rules, either tier") {
    val rnd = new scala.util.Random(97L)
    val words = (0 until 150).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(12)))
        .map(_ => "abcd".charAt(rnd.nextInt(4))).mkString)
    }
    val df = words.toDF("id", "text")
    val alphabet = Seq("a", "b", "c", "d", "ab", "cd", "abc", "</w>", "d</w>")
    def randomRules(n: Int) = (0 until n).map { _ =>
      (alphabet(rnd.nextInt(alphabet.length)),
        alphabet(rnd.nextInt(alphabet.length)))
    }
    // 20 rules → fold tier; 120 → kernel tier (FoldRuleCap dispatch)
    Seq(20, 120).foreach { n =>
      val got = Bpe.encode(df, "text", randomRules(n))
        .select("w", "syms").as[(String, Seq[String])].collect()
      assert(got.nonEmpty)
      got.foreach { case (w, syms) =>
        assert(syms.mkString == w + "</w>",
          s"tier n=$n word '$w' reassembled to '${syms.mkString}'")
      }
    }
  }

  test("merge fold matches the reference scan on randomized symbol runs") {
    // overlapping-run cases ("aaa" under (a,a) merges greedily left to
    // right) are where a fold can silently diverge from the published
    // scan — 200 seeded random words over a tiny alphabet, one Spark job
    val rnd = new scala.util.Random(7L)
    val words = (0 until 200).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(9)))
        .map(_ => "ab".charAt(rnd.nextInt(2))).mkString)
    }
    def refMerge(s: Vector[String], a: String, b: String): Vector[String] =
      s.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    val got = Bpe.encode(words.toDF("id", "text"), "text",
        rules = Seq(("a", "a"), ("b", "b"), ("aa", "b")))
      .select("w", "syms").as[(String, Seq[String])].collect().toMap
    words.map(_._2).distinct.foreach { w =>
      val expect = Seq(("a", "a"), ("b", "b"), ("aa", "b"))
        .foldLeft(w.map(_.toString).toVector :+ "</w>") {
          case (s, (a, b)) => refMerge(s, a, b)
        }
      assert(got(w) == expect, s"word '$w': ${got(w)} vs $expect")
    }
  }
}
