package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, Maintenance}

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("nightly: windows run in spec order, report one row per retired tag, steady state empty") {
    val root = java.nio.file.Files.createTempDirectory("maint").toString
    val docs0 = Seq((1L, "alpha\nfooter"), (2L, "beta\nunique2"))
      .toDF("doc_id", "text")
    Dedup.buildLineDfIndex(docs0, "doc_id", "text", s"$root/lines")
    Seq(1, 2, 3).foreach(i => Dedup.appendToLineDfIndex(spark,
      s"$root/lines", Seq((10L + i, s"gamma$i\nfooter")).toDF("doc_id", "text"),
      "doc_id", "text", s"d$i"))
    val vecs = (1 to 60).map(i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 131 + j * 17))))
      .toDF("id", "v")
    Ann.buildIvfIndex(vecs.filter(col("id") <= 40), s"$root/ivf", nlist = 4)
    Seq(41L, 51L).foreach(lo => Ann.appendToIvfIndex(spark, s"$root/ivf",
      vecs.filter(col("id") >= lo && col("id") < lo + 10), s"d$lo"))
    val got = Maintenance.nightly(spark, Seq(
        (s"$root/lines", "linedf", 1), (s"$root/ivf", "ivf", 1)))
      .as[(String, String, Int, String)].collect().toSeq
    assert(got == Seq(
      (s"$root/lines", "linedf", 1, "d1"), (s"$root/lines", "linedf", 1, "d2"),
      (s"$root/ivf", "ivf", 1, "d41")), s"got $got")
    // steady state: every window already fits — the daily run no-ops
    assert(Maintenance.nightly(spark, Seq(
      (s"$root/lines", "linedf", 1), (s"$root/ivf", "ivf", 1))).isEmpty)
    // an unknown family is loud BEFORE anything retires
    val err = intercept[IllegalArgumentException] {
      Maintenance.nightly(spark, Seq(
        (s"$root/lines", "linedf", 0), (s"$root/ivf", "no-such", 0)))
    }
    assert(err.getMessage.contains("no-such"), err.getMessage)
    assert(graft.operators.IndexFiles.listSrcs(spark, s"$root/lines", "lines")
      == Seq("base", "d3"), "the typo'd nightly must not half-age the store")
    // every advertised family name resolves (the registry stays total)
    assert(Maintenance.families.keySet == Set("exact", "linedf",
      "containment", "minhash", "domain_cap", "phash", "ivf", "ivf_sq8",
      "ivf_pq", "sparse", "binary", "lsh"))
  }
}
