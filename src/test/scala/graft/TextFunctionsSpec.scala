package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, HashFunctions => H, VectorFunctions => V}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column): A =
    Seq(Tuple1("x")).toDF("t").select(c).collect()(0).get(0).asInstanceOf[A]

  test("cleanTitle: strips, truncates to 50, untitled fallback") {
    val df = Seq("  Hello, 世界! 123  ", "!!!", "a" * 80).toDF("t")
      .select(T.cleanTitle(col("t")).as("c")).as[String].collect()
    assert(df(0) == "Hello世界123")
    assert(df(1) == "untitled")
    assert(df(2) == "a" * 50)
  }

  test("reformatDoc: [标题]/[时间]/[来源] assembly with null fallbacks") {
    val df = Seq((Option("T"), Option("2025"), Option("s"), Option("body")),
                 (None, None, None, None))
      .toDF("a", "b", "c", "d")
      .select(T.reformatDoc(col("a"), col("b"), col("c"), col("d")).as("r"))
      .as[String].collect()
    assert(df(0) == "[标题]:T\n[时间]:2025\n[来源]:s\n\nbody")
    assert(df(1) == "[标题]:无标题\n[时间]:无时间\n[来源]:无来源\n\n无内容")
  }

  test("langId: picks dominant stopword language; und on no signal") {
    val df = Seq(
      "the cat and the dog sat in the garden",
      "el perro y la casa de los niños",
      "这是一个中文句子",
      "zzz qqq").toDF("t")
      .select(T.langId(col("t")).as("l")).as[String].collect()
    assert(df.toSeq == Seq("en", "es", "zh", "und"))
  }

  test("qualityScore: integer milli-score, bounded [0, 10000]") {
    val scores = Seq("", "the quick brown fox and the lazy dog in the sun",
        ".,;:!? .,;:!?", ("word " * 200).trim).toDF("t")
      .select(T.qualityScore(col("t")).as("q")).as[Long].collect()
    assert(scores.forall(s => s >= 0 && s <= 10000))
    assert(scores(0) == 3000) // no tokens: len 0, stop 0, punct 0 → 0+0+3000
    assert(scores(3) >= 4000) // 200 tokens → full length score
  }

  test("hash32/hash60 positive and stable; shingles cover text") {
    val h = Seq(Tuple1("abc")).toDF("t")
      .select(H.hash32(1, col("t")).as("a"), H.hash60(1, col("t")).as("b"))
      .as[(Long, Long)].collect()(0)
    assert(h._1 >= 0 && h._1 < (1L << 32))
    assert(h._2 >= 0 && h._2 < (1L << 60))
    val sh = Seq(Tuple1("abcde")).toDF("t")
      .select(H.shingles(col("t"), 3).as("s")).as[Seq[String]].collect()(0)
    assert(sh == Seq("abc", "bcd", "cde"))
    val short = Seq(Tuple1("ab")).toDF("t")
      .select(H.shingles(col("t"), 3).as("s")).as[Seq[String]].collect()(0)
    assert(short == Seq("ab"))
  }

  test("vector math: dot/cosine/l2 against hand values") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 1.0))).toDF("a", "b")
    val (dt, cs, l2) = df.select(
        V.dot(col("a"), col("b")), V.cosine(col("a"), col("a")), V.l2(col("a"), col("b")))
      .as[(Double, Double, Double)].collect()(0)
    assert(dt == 4.0)
    assert(math.abs(cs - 1.0) < 1e-12)
    assert(math.abs(l2 - math.sqrt(1 + 4 + 1)) < 1e-12)
  }

  test("fakeDenseEmbed: deterministic, in [-1,1], dimension-exact") {
    val e = Seq(Tuple1("text")).toDF("t")
      .select(V.fakeDenseEmbed(col("t"), 8).as("e")).as[Seq[Double]].collect()(0)
    assert(e.size == 8)
    assert(e.forall(v => v >= -1.0 && v <= 1.0))
    val e2 = Seq(Tuple1("text")).toDF("t")
      .select(V.fakeDenseEmbed(col("t"), 8).as("e")).as[Seq[Double]].collect()(0)
    assert(e == e2)
  }

  test("redactPii: emails, IPs, then phones become typed tags") {
    val out = Seq(Tuple1("mail a.b@x.co from 10.1.2.3 call +1 (555) 123-4567 ok"))
      .toDF("t").select(T.redactPii(col("t"))).as[String].collect()(0)
    assert(out == "mail <EMAIL> from <IP> call <PHONE> ok")
    // no PII → unchanged
    val clean = Seq(Tuple1("just words here")).toDF("t")
      .select(T.redactPii(col("t"))).as[String].collect()(0)
    assert(clean == "just words here")
  }

  test("repetition signals: hand values") {
    val df = Seq(Tuple1("ab abcd")).toDF("t")
    assert(df.select(T.meanWordLen(col("t"))).as[Double].collect()(0) == 3.0)
    val dup = Seq(Tuple1("aa x. bb. aa x. cc")).toDF("t")
    // segments [aa x, bb, aa x, cc] → 1 duplicate of 4
    assert(dup.select(T.dupSegmentFrac(col("t"), "\\. ")).as[Double].collect()(0) == 0.25)
    val num = Seq(Tuple1("a 12 b 3")).toDF("t")
    assert(num.select(T.numericWordFrac(col("t"))).as[Double].collect()(0) == 0.5)
  }

  test("fixText: mojibake reversal, control strip, whitespace normalization") {
    // every table entry round-trips artifact -> intended char; the NBSP
    // entry's intended char is exotic whitespace itself, which the
    // final normalization pass then turns into a plain space
    val pairs = T.mojibakeTable.map { case (artifact, intended) =>
      (s"x${artifact}y", s"x${intended.replace(' ', ' ')}y")
    }
    val fixedPairs = pairs.map(_._1).toDF("t")
      .select(T.fixText(col("t"))).as[String].collect()
    assert(fixedPairs.toSeq == pairs.map(_._2),
      s"\n${fixedPairs.toSeq}\n${pairs.map(_._2)}")
    // the crawl classic, assembled FROM the table's own sides so this
    // test never depends on invisible literals in this file
    val m = T.mojibakeTable.map(_.swap).toMap // intended -> artifact
    val Seq(lq, rq, apos, em, e) =
      Seq("“", "”", "’", "—", "é")
    val crawl =
      s"He said ${m(lq)}no${m(rq)} don${m(apos)}t go ${m(em)} ${m(e)}lite"
    assert(Seq(Tuple1(crawl)).toDF("t")
      .select(T.fixText(col("t"))).as[String].collect()(0)
      == s"He said ${lq}no$rq don${apos}t go $em ${e}lite")
    // clean text untouched; control chars strip; zero-width/ideographic
    // whitespace runs collapse to ONE plain space
    val cases = Seq(
      "plain ascii text, nothing to fix" -> "plain ascii text, nothing to fix",
      "abc" -> "abc",
      "a​　 b" -> "a b")
    val got = cases.map(_._1).toDF("t")
      .select(T.fixText(col("t"))).as[String].collect()
    assert(got.toSeq == cases.map(_._2), s"${got.toSeq}")
  }

  test("planeConst is bit-identical to fakeDenseEmbed of the same tag") {
    // hyperplaneSig hands the planes to the plan as driver-computed
    // literals; the DuckDB oracle reproduces the expression form, so the
    // two derivations must agree exactly
    for (tag <- Seq("plane-0", "plane-3", "plane-11")) {
      val expr = Seq(Tuple1(tag)).toDF("t")
        .select(V.fakeDenseEmbed(col("t"), 16).as("e")).as[Seq[Double]].collect()(0)
      assert(expr == V.planeConst(tag, 16), s"mismatch for $tag")
    }
  }
}
