package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.RecursiveSplit
import graft.functions.VectorFunctions
import graft.operators.{Multimodal, Tag}

/** Property tests over the pure (non-Spark) kernels — no Spark jobs per
  * sample, so hundreds of generated cases run in milliseconds. Uses raw
  * ScalaCheck generators with a fixed seed (the scalatest bridge
  * artifact isn't in the offline cache; deterministic seeds make
  * failures reproducible anyway). */
class PropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  private val seps = RecursiveSplit.defaultSeparators
  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '。', '，', '\n', '！'))).map(_.mkString)

  private def stripSeps(s: String): String =
    seps.foldLeft(s)((acc, sep) => acc.replace(sep, ""))

  test("RecursiveSplit: chunks bounded by size; no character invented or lost") {
    forSamples(Gen.zip(textGen, Gen.choose(2, 40))) { case (text, size) =>
      val out = RecursiveSplit.split(text, size, overlap = 0, seps)
      assert(out.forall(_.length <= size), s"oversize chunk for size=$size in $out")
      // overlap=0 conservation: separator-free content is preserved
      // exactly (separators may be dropped at chunk boundaries)
      assert(stripSeps(out.mkString) == stripSeps(text),
        s"content changed for '$text' -> $out")
      assert(out.forall(_.nonEmpty), s"empty chunk in $out")
    }
  }

  test("RecursiveSplit: overlap duplicates context, never drops content") {
    forSamples(Gen.zip(textGen, Gen.choose(4, 30))) { case (text, size) =>
      val out = RecursiveSplit.split(text, size, overlap = 2, seps)
      val bag = out.mkString
      stripSeps(text).foreach(c =>
        assert(bag.contains(c), s"char $c lost for '$text' -> $out"))
    }
  }

  test("Bpe.mergeOnce: conserves characters, leaves no mergeable pair, idempotent") {
    import graft.operators.Bpe
    val symGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "bc"))
    val ruleGen = Gen.zip(Gen.oneOf("a", "b", "c", "ab", "bc"),
      Gen.oneOf("a", "b", "c", "ab", "bc"))
    forSamples(Gen.zip(symGen, ruleGen)) { case (symsList, (a, b)) =>
      val syms = symsList.toArray
      val out = Bpe.mergeOnce(syms, a, b)
      // conservation: merging concatenates, never loses or invents
      assert(out.mkString == syms.mkString, s"(${syms.toSeq}, $a, $b)")
      // completeness: one greedy pass leaves no adjacent (a, b) — the
      // merged symbol a+b can never re-expose an (a, b) adjacency
      // (a+b == a or b needs an empty half), so a second pass is a
      // no-op and rule order alone determines the final form
      val pairs = out.zip(out.tail)
      assert(!pairs.contains((a, b)), s"leftover pair: (${out.toSeq})")
      assert(Bpe.mergeOnce(out, a, b).toSeq == out.toSeq, "not idempotent")
    }
  }

  test("stubDecode: deterministic, dimension-exact, bounded") {
    forSamples(Gen.zip(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)),
        Gen.choose(1, 64))) { case (bytes, dim) =>
      val a = Multimodal.stubDecode(bytes.toArray, dim)
      val b = Multimodal.stubDecode(bytes.toArray, dim)
      assert(a.toSeq == b.toSeq)
      assert(a.length == dim)
      assert(a.forall(v => v >= -1.0 && v <= 1.0))
    }
  }

  test("Tag.stubModelCall: total over arbitrary strings incl. null") {
    forSamples(Gen.listOf(Gen.oneOf(textGen, Gen.const(null: String)))) { batch =>
      val out = Tag.stubModelCall(batch)
      assert(out.length == batch.length)
      assert(out.forall(Tag.labels.contains))
    }
  }

  test("Tag.stubRerankCall: total, bounded, deterministic, weight-linear") {
    val pairGen = Gen.zip(
      Gen.oneOf(textGen, Gen.const(null: String)),
      Gen.oneOf(textGen, Gen.const(null: String)))
    forSamples(Gen.listOf(pairGen), n = 150) { batch =>
      val out = Tag.stubRerankCall(batch)
      assert(out.length == batch.length)
      batch.zip(out).foreach {
        case ((q, p), s) if q != null && p != null =>
          // weighted mean of [0,1] mode scores stays in [0,1]
          assert(s != null && s >= 0.0 && s <= 1.0, s"score $s out of range")
        case (_, s) => assert(s == null, "null text must score null")
      }
      // deterministic: same batch, same scores
      assert(Tag.stubRerankCall(batch) == out)
      // weight linearity: the fused score is the weighted mean of the
      // three single-mode scores
      val d = Tag.stubRerankCall(batch, Seq(1.0, 0.0, 0.0))
      val sp = Tag.stubRerankCall(batch, Seq(0.0, 1.0, 0.0))
      val c = Tag.stubRerankCall(batch, Seq(0.0, 0.0, 1.0))
      batch.indices.filter(i => out(i) != null).foreach { i =>
        val mean = (0.4 * d(i) + 0.2 * sp(i) + 0.4 * c(i)) / (0.4 + 0.2 + 0.4)
        assert(math.abs(out(i) - mean) < 1e-15, s"fused ${out(i)} vs $mean")
      }
    }
  }

  test("planeConst: stable values in [-1, 1], distinct across plane families") {
    forSamples(Gen.zip(Gen.choose(0, 63), Gen.choose(1, 128)), n = 100) {
      case (p, dim) =>
        val v = VectorFunctions.planeConst(s"plane-$p", dim)
        assert(v.length == dim)
        assert(v.forall(x => x >= -1.0 && x <= 1.0))
        assert(v == VectorFunctions.planeConst(s"plane-$p", dim))
    }
    // independent families differ (multi-table LSH relies on this)
    assert(VectorFunctions.planeConst("plane-0", 16) !=
      VectorFunctions.planeConst("plane-t1-0", 16))
  }
}
