package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Recall-floor regression guard over the GRADED corpus (the smallest
  * driver-generated embeddings table): every approximate family is
  * built at its SURVEY-documented operating point and its mean
  * recall@10 vs exact brute force must clear a pinned floor — so a
  * future quantization/partitioning/banding change cannot silently
  * trade recall for speed and still pass the suite. Floors are pinned
  * well under the currently measured values (ivf/sq8-ivf 0.65, pq-adc 0.25 / refined 0.39, lsh 0.27, sq8 0.99, refine 1.0, binary 0.28 at pinning time) (printed on every run):
  * the margin absorbs per-round test-data regeneration; a real
  * regression (a lost refinement pass, a broken probe prune, a
  * mis-sized codebook) moves recall far more than that. */
class RecallFloorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.load(spark, dir, "embeddings")
  private lazy val corpus = emb
    .select(col("vec_id").as("id"), col("embedding").as("v")).cache()
  private lazy val qs = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("qid"), col("embedding").as("qv"))
  private lazy val exactCos = Ann.bruteForceTopK(corpus, qs, k = 10)

  private def floorCheck(name: String, approx: DataFrame, floor: Double,
      exact: DataFrame = exactCos): Unit = {
    val mean = Ann.recallAtK(approx, exact, k = 10)
      .agg(avg(col("recall"))).head().getDouble(0)
    info(f"$name%-28s mean recall@10 = $mean%.4f (floor $floor)")
    assert(mean >= floor,
      f"$name recall@10 $mean%.4f fell under its $floor floor — an " +
        "approximation change traded recall away")
  }

  test("IVF holds its floor at the production probe (nlist=16, nprobe=4)") {
    val d = java.nio.file.Files.createTempDirectory("rfivf").toString + "/i"
    Ann.buildIvfIndex(corpus, d, nlist = 16)
    floorCheck("ivf nprobe=4",
      Ann.searchIvfIndex(spark, d, qs, k = 10, nprobe = 4), floor = 0.5)
  }

  test("IVF-SQ8 holds its floor at nprobe=4 (quantized scan, ip ranking)") {
    val d = java.nio.file.Files.createTempDirectory("rfsq8").toString + "/i"
    Ann.buildIvfSq8Index(corpus, d, nlist = 16)
    floorCheck("ivf_sq8 nprobe=4",
      Ann.searchIvfSq8Index(spark, d, qs, k = 10, nprobe = 4), floor = 0.5,
      exact = Ann.bruteForceTopK(corpus, qs, k = 10, metric = "ip"))
  }

  test("IVF-PQ ADC holds its floor at full probe, and refinement recovers the rest") {
    val d = java.nio.file.Files.createTempDirectory("rfpq").toString + "/i"
    Ann.buildIvfPqIndex(corpus, d, nlist = 4, m = 8, ksub = 16)
    val exactL2 = Ann.bruteForceTopK(corpus, qs, k = 10, metric = "l2")
    floorCheck("ivf_pq full probe",
      Ann.searchIvfPqIndex(spark, d, qs, k = 10, nprobe = 4),
      floor = 0.15, exact = exactL2)
    floorCheck("ivf_pq refined f=3",
      Ann.searchIvfPqIndexRefined(spark, d, corpus, qs, k = 10,
        nprobe = 4, factor = 3),
      floor = 0.25, exact = exactL2)
  }

  test("multi-table LSH holds its floor at the graded net (planes=6, tables=4)") {
    floorCheck("lsh 6 planes x 4 tables",
      Ann.lshTopK(corpus, qs, k = 10, dim = 64, planes = 6, tables = 4),
      floor = 0.15)
  }

  test("SQ8 flat scan and refine hold their floors (near-exact families)") {
    floorCheck("sq8 flat", Ann.sq8TopK(corpus, qs, k = 10), floor = 0.85,
      exact = Ann.bruteForceTopK(corpus, qs, k = 10, metric = "ip"))
    floorCheck("refine f=3",
      Ann.refineTopK(corpus, qs, k = 10, factor = 3), floor = 0.9)
  }

  test("binary quantization holds its floor vs exact hamming-free cosine") {
    floorCheck("bin_flat",
      Ann.binaryTopK(corpus, qs, k = 10, dim = 64), floor = 0.15)
  }
}
