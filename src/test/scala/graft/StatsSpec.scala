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

  test("corpusStatsExact: hand-checkable counts, exact vocab, empty-group vocab 0") {
    val tiny = Seq(
      (1L, "a", "alpha beta alpha"),
      (2L, "a", "beta gamma"),
      (3L, "b", "")).toDF("doc_id", "grp", "text")
    val out = Stats.corpusStatsExact(tiny, "grp", "text").collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_docs") == 2 && a.getAs[Long]("n_tokens") == 5)
    assert(a.getAs[Long]("vocab") == 3) // alpha beta gamma
    assert(a.getAs[Long]("min_tokens") == 2 && a.getAs[Long]("max_tokens") == 3)
    assert(a.getAs[Double]("mean_tokens") == 2.5)
    val b = out("b")
    assert(b.getAs[Long]("n_docs") == 1 && b.getAs[Long]("vocab") == 0)
  }

  test("topTokens: exact counts, rank caps at k, ties break token-asc") {
    val tiny = Seq(
      (1L, "a", "x x x y y z"),
      (2L, "a", "y w"),
      (3L, "b", "q q")).toDF("doc_id", "grp", "text")
    val out = Stats.topTokens(tiny, "grp", "text", k = 2)
      .select("grp", "tok", "tf", "rank")
      .as[(String, String, Long, Long)].collect().toSet
    // grp a: x=3, y=3 -> tie broken by token order (x before y); w,z cut by k
    assert(out == Set(("a", "x", 3L, 1L), ("a", "y", 3L, 2L), ("b", "q", 2L, 1L)),
      s"got $out")
  }

  test("noveltyScore: fresh shingle fraction vs the whole old snapshot") {
    val old = Seq((1L, "abcdefgh"), (2L, "stuvwxyz")).toDF("id", "text")
    val neu = Seq(
      (1L, "abcdefgh"),   // verbatim re-crawl -> 0.0
      (3L, "stuvwxyz"),   // new id, old content (ANY old doc) -> 0.0
      (4L, "qqqqrrrr"),   // wholly fresh -> 1.0
      (5L, "abcdefghij")  // extends doc 1: shingles abcd..efgh seen,
    ).toDF("id", "text")  // fghi/ghij/hijk... novel
    val out = Stats.noveltyScore(neu, old, "id", "text", w = 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((5L, 0L, 0.0)), out(1L))
    assert(out(3L) == ((5L, 0L, 0.0)), out(3L))
    assert(out(4L)._3 == 1.0, out(4L))
    // doc 5: 7 shingles of "abcdefghij"; abcd..efgh (5) seen, fghi,
    // ghij novel
    assert(out(5L) == ((7L, 2L, 0.2857)), out(5L))
  }

  test("tokenDrift: per-side top-k union, 6dp frequency shift, missing side = 0") {
    val old = Seq((1L, "a a b c"), (2L, "b a")).toDF("id", "text")
    val neu = Seq((3L, "a b b d")).toDF("id", "text")
    // k=1: top-old = a (3), top-new = b (2) -> keys {a, b}
    val out = Stats.tokenDrift(old, neu, "text", k = 1)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out == Map(
      "a" -> ((3L, 1L, 0.5, 0.25, -0.25)),
      "b" -> ((2L, 2L, 0.333333, 0.5, 0.166667))), s"got $out")
    // one empty side: keys come from the other; freqs degrade to 0
    val vsEmpty = Stats.tokenDrift(old,
        Seq.empty[(Long, String)].toDF("id", "text"), "text", k = 2)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._5, r._6))).toMap
    assert(vsEmpty == Map("a" -> ((0L, 0.0, -0.5)),
      "b" -> ((0L, 0.0, -0.333333))), s"got $vsEmpty")
    // plan pin: each side's top-k is a TakeOrdered, never a full sort
    // (repartition so the LocalRelation doesn't constant-fold it away)
    val phys = Stats.tokenDrift(old.repartition(3), neu.repartition(2),
      "text", k = 1).queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"top-k did not plan as TakeOrdered:\n$phys")
    assert(!phys.contains("Sort ["), // no global sort anywhere else
      s"unexpected full sort in the drift plan:\n$phys")
  }

  test("embeddingDrift: hand-computed per-dim means; width mismatch and null vecs degrade, not fail") {
    val old = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "v")
    val neu = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 1.0))).toDF("id", "v")
    val out = Stats.embeddingDrift(old, neu, "v").orderBy("dim")
      .as[(Long, Double, Double, Double)].collect().toSeq
    // dim0: 0.5 -> 2/3 (+1/6); dim1: 0.5 -> 1/3 (-1/6); 6dp HALF_UP
    assert(out == Seq((0L, 0.5, 0.666667, 0.166667),
      (1L, 0.5, 0.333333, -0.166667)), s"got $out")
    // a null vector carries no components — skipped, not a crash
    val withNull = Seq((1L, Some(Seq(1.0, 0.0))), (2L, None))
      .toDF("id", "v")
    val nn = Stats.embeddingDrift(withNull, withNull, "v").orderBy("dim")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(nn == Seq((0L, 1.0, 1.0, 0.0), (1L, 0.0, 0.0, 0.0)), s"got $nn")
    // width mismatch (a swapped encoder): the extra dimension reports
    // NULL on the absent side instead of vanishing
    val wide = Seq((1L, Seq(1.0, 0.0, 2.0))).toDF("id", "v")
    val rows = Stats.embeddingDrift(old, wide, "v").orderBy("dim").collect()
    assert(rows.length == 3)
    assert(rows(2).getAs[Long]("dim") == 2L && rows(2).isNullAt(1) &&
      rows(2).getAs[Double]("mean_new") == 2.0 && rows(2).isNullAt(3),
      s"got ${rows.mkString("; ")}")
  }

  test("embeddingDrift plan pin: dim-keyed partial aggregate — every partition collapses to dim rows before the exchange") {
    val df = (1 to 100).map(i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 7 + j))))
      .toDF("id", "v").repartition(4)
    val phys = Stats.embeddingDrift(df, df, "v")
      .queryExecution.executedPlan.toString
    // the scale claim made operational: a partial avg keyed on dim runs
    // BEFORE the exchange, so the shuffle moves partitions×dim rows —
    // losing the partial (e.g. by aggregating on a non-key expression)
    // would ship every exploded component into the shuffle
    assert(phys.contains("partial_avg"),
      s"no map-side partial aggregate in the drift plan:\n$phys")
    assert("hashpartitioning\\(dim".r.findFirstIn(phys).isDefined,
      s"drift exchange is not keyed on dim:\n$phys")
  }

  test("embeddingDriftBy: per-stratum means; a one-sided stratum reports NULL on the absent side") {
    val old = Seq(("a", Seq(1.0, 0.0)), ("a", Seq(0.0, 1.0)),
      ("b", Seq(2.0, 2.0))).toDF("src", "v")
    val neu = Seq(("a", Seq(1.0, 0.0)), ("c", Seq(4.0, 0.0)))
      .toDF("src", "v")
    val out = Stats.embeddingDriftBy(old, neu, "v", "src")
      .orderBy("stratum", "dim").collect()
    // stratum a: (0.5,0.5) -> (1.0,0.0); b only old; c only new
    val a = out.filter(_.getAs[String]("stratum") == "a")
      .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("mean_old"),
        r.getAs[Double]("mean_new"), r.getAs[Double]("delta"))).toSeq
    assert(a == Seq((0L, 0.5, 1.0, 0.5), (1L, 0.5, 0.0, -0.5)), s"got $a")
    val b = out.filter(_.getAs[String]("stratum") == "b")
    assert(b.length == 2 && b.forall(r =>
      !r.isNullAt(r.fieldIndex("mean_old")) &&
        r.isNullAt(r.fieldIndex("mean_new"))), b.mkString("; "))
    val c = out.filter(_.getAs[String]("stratum") == "c")
    assert(c.length == 2 && c.forall(r =>
      r.isNullAt(r.fieldIndex("mean_old")) &&
        !r.isNullAt(r.fieldIndex("mean_new"))), c.mkString("; "))
  }

  test("embeddingDriftSummary: counts, norms, centroid cosine; empty side reports NULL, not a crash") {
    val old = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "v")
    val neu = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 1.0))).toDF("id", "v")
    val r = Stats.embeddingDriftSummary(old, neu, "v").collect().head
    assert(r.getAs[Long]("n_old") == 2 && r.getAs[Long]("n_new") == 3)
    assert(r.getAs[Double]("mean_norm_old") == 1.0 &&
      r.getAs[Double]("mean_norm_new") == 1.0 &&
      r.getAs[Double]("norm_delta") == 0.0)
    // cos((0.5,0.5), (2/3,1/3)) = 0.5 / (sqrt(.5)*sqrt(5/9)) = 0.948683
    assert(r.getAs[Double]("centroid_cos") == 0.948683, r.toString)
    // the empty first day: NULL metrics with a zero count, loud nowhere
    val e = Stats.embeddingDriftSummary(old,
      Seq.empty[(Long, Seq[Double])].toDF("id", "v"), "v").collect().head
    assert(e.getAs[Long]("n_new") == 0)
    assert(e.isNullAt(e.fieldIndex("mean_norm_new")) &&
      e.isNullAt(e.fieldIndex("norm_delta")) &&
      e.isNullAt(e.fieldIndex("centroid_cos")), e.toString)
    // a swapped encoder changed the DIMENSION: centroid_cos must be
    // NULL, not a truncated-dot cosine that reads as mild drift
    val wide = Seq((1L, Seq(1.0, 0.0, 2.0))).toDF("id", "v")
    val m = Stats.embeddingDriftSummary(old, wide, "v").collect().head
    assert(m.isNullAt(m.fieldIndex("centroid_cos")),
      s"mismatched widths produced a cosine: $m")
    assert(m.getAs[Long]("n_new") == 1 &&
      !m.isNullAt(m.fieldIndex("mean_norm_new")),
      s"width-independent metrics must survive: $m")
  }
}
