package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense/sparse vector column functions over array<float|double>.
  *
  * All pure Catalyst higher-order functions (zip_with / aggregate /
  * transform) — no UDFs — so similarity math stays inside
  * WholeStageCodegen and scales linearly across executors.
  *
  * The reference's embeddings are 1024-d dense + SPLADE sparse maps
  * served over HTTP (embedding_model/tei_req.py, allembed_req.py). The
  * HTTP model is external; [[fakeDenseEmbed]] is the deterministic stub
  * standing behind the same seam (text in → array<double> out).
  */
object VectorFunctions {

  import org.apache.spark.sql.graft.VectorExpressions

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ — strict left-to-right primitive loop in double (codegen'd
    * DotProduct expression), bit-identical to the sequential DuckDB
    * list functions used as the oracle. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotProduct(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  def l2(a: Column, b: Column): Column = VectorExpressions.l2Distance(a, b)

  def l2Normalize(a: Column): Column = transform(a, x => d(x) / norm2(a))

  /** Deterministic stub dense embedder: component j of embed(t) is an
    * md5-derived integer in [-1e6, 1e6] scaled to [-1, 1]. Stands in for
    * the TEI dense model (embedding_model/tei_req.py:10) — exactly
    * reproducible in SQL, dimension-configurable, uniform-ish. */
  def fakeDenseEmbed(c: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), j => {
      // top 32 md5 bits — bit-identical to conv(substring(md5,1,8),16,10)
      // without the hex round trip (HashExpressions, r19)
      val h = shiftrightunsigned(
        org.apache.spark.sql.graft.HashExpressions.md5Prefix64(
          concat(j.cast("string"), lit("#"), c)), 32)
      (h % 2000001L - lit(1000000L)).cast("double") / lit(1000000.0)
    })

  /** The plane vectors [[hyperplaneSig]] projects onto, computed ONCE on
    * the driver — bit-identical to fakeDenseEmbed(lit(s"plane-$p"), dim)
    * (same md5("j#plane-p") hex slice, modulus, and scaling), but handed
    * to the plan as an array literal so the per-row cost is `planes` dot
    * products instead of planes·dim md5 digests. */
  private[graft] def planeConst(tag: String, dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { j =>
      val hex = md.digest(s"$j#$tag".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      (h % 2000001L - 1000000L).toDouble / 1000000.0
    }
  }

  /** SQ8 scalar quantization: struct(scale, q: array<tinyint>) where
    * scale = max|xᵢ|/127 and qᵢ = round(xᵢ/scale). 4× smaller than
    * float32 (8× vs the double arrays Spark works in) — at 100 TB the
    * corpus' vectors are usually the dominant bytes, and SQ8 is the
    * standard first compression step (the Milvus/faiss SQ8 index
    * type). Pure Catalyst higher-order functions, no UDF. The scale is
    * zipped alongside the elements via array_repeat so the max-abs
    * aggregate evaluates ONCE per row — referencing it inside the
    * transform lambda would re-run the O(dim) scan per element
    * (Catalyst does no loop-invariant motion inside HOF lambdas).
    * Zero vectors quantize to scale 0 with all-zero codes. */
  def quantizeSq8(v: Column): Column = {
    val dv = v.cast("array<double>")
    val mx = aggregate(dv, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val scale = mx / lit(127.0)
    struct(
      scale.as("scale"),
      zip_with(dv, array_repeat(scale, size(dv)),
        (x, s) => when(s === 0, lit(0.0)).otherwise(round(x / s)).cast("byte"))
        .as("q"))
  }

  /** Dequantized dot product of two [[quantizeSq8]] structs:
    * scale_a · scale_b · Σ qaᵢ·qbᵢ. The integer dot runs over bytes —
    * the arithmetic a SIMD-friendly engine would vectorize — and the
    * error vs the exact dot is bounded by the two quantization steps.
    * The accumulator is long: per-element products fit int, but the
    * sum crosses 2³¹ past ~133k dimensions. */
  def dotSq8(a: Column, b: Column): Column = {
    val prods = zip_with(a.getField("q"), b.getField("q"),
      (x, y) => x.cast("int") * y.cast("int"))
    a.getField("scale") * b.getField("scale") *
      aggregate(prods, lit(0L), (acc, x) => acc + x).cast("double")
  }

  /** Sign-bit binary quantization: bit j of word w is set iff
    * v[64w+j] > 0, packed into array<long> of ⌈dim/64⌉ words — the
    * Milvus/faiss binary-vector storage shape (BIN_FLAT with the
    * HAMMING metric). 32× smaller than float32 at the same dimension:
    * at 100 TB the quantized corpus scan reads 1/32 of the bytes, and
    * pair scoring is XOR + popcount instead of a float dot product.
    * Pure Catalyst (bit ops fold into whole-stage codegen), no UDF. */
  def binarizeSign(v: Column, dim: Int): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    val dv = v.cast("array<double>")
    array((0 until (dim + 63) / 64).map { w =>
      (0 until math.min(64, dim - w * 64)).map { j =>
        when(element_at(dv, w * 64 + j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }: _*)
  }

  /** Hamming distance between two equal-length packed-bit arrays:
    * Σ popcount(aᵢ xor bᵢ). */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Random-hyperplane LSH signature: `planes` sign bits of dot products
    * against deterministic stub hyperplanes, packed into a long. Buckets
    * cosine-similar vectors together (charikar 2002 SimHash-for-angles).
    * `tag` selects an independent plane family (multi-table LSH); the
    * default family matches the oracle's "plane-p" derivation. */
  def hyperplaneSig(vec: Column, dim: Int, planes: Int,
      tag: String = "plane"): Column = {
    val bits = (0 until planes).map { p =>
      val plane = typedlit(planeConst(s"$tag-$p", dim))
      when(dot(vec, plane) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
