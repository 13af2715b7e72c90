package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup, Stats}

/** The cache-release contract ([[graft.operators.CacheLifecycle]]):
  * operators whose plans pin internal frames register them against the
  * returned frame, and `CacheLifecycle.release(out)` after full
  * consumption must empty the slate completely. Without this a
  * long-lived session (the streaming drivers' natural host)
  * accumulates caller-unreachable pinned RDDs across calls. */
class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def pinned = spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def assertReleased(name: String)(
      op: => org.apache.spark.sql.DataFrame): Unit = {
    spark.catalog.clearCache()
    val before = pinned
    val out = op
    out.count() // fully consume the operator's output
    graft.operators.CacheLifecycle.release(out)
    val leaked = pinned -- before
    assert(leaked.isEmpty,
      s"$name left ${leaked.size} pinned RDD(s) after release: $leaked")
  }

  test("handOff operators leave no pinned RDDs once their handle is released") {
    val docs = (1L to 20L).map { i =>
      (i, s"document number $i with some shared filler text for the " +
        "containment prefix join to chew on")
    }.toDF("doc_id", "text")

    assertReleased("containmentPairs") {
      Dedup.containmentPairs(docs, "doc_id", "text", tau = 0.5)
    }
    assertReleased("dropContained") {
      Dedup.dropContained(docs, "doc_id", "text", tau = 0.5)
    }
    assertReleased("tokenDrift") {
      Stats.tokenDrift(docs, docs.filter(col("doc_id") % 2 === 0), "text",
        k = 10)
    }
    assertReleased("crawlTriage") {
      Curate.crawlTriage(docs, docs.filter(col("doc_id") =!= 3L),
        "doc_id", "text", minWords = 2)
    }
    val dir = java.nio.file.Files.createTempDirectory("clidx")
      .toString + "/idx"
    Dedup.buildContainmentIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir)
    assertReleased("dropContainedAgainstIndex") {
      Dedup.dropContainedAgainstIndex(spark, dir,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", tau = 0.8)
    }
    // the jaccard family — with maxDf set, so the shingle helpers'
    // INTERNAL hot-cut caches must transfer through the absorption
    // chain (helper → operator surface) and release with the rest
    assertReleased("ngramJaccard (capped)") {
      Dedup.ngramJaccard(docs, "doc_id", "text", tau = 0.5,
        maxDf = Some(100))
    }
    assertReleased("minhashLsh (capped)") {
      Dedup.minhashLsh(docs, "doc_id", "text", tau = 0.5,
        maxDf = Some(100))
    }
    // composition: pairRecall ABSORBS both finders' pins — one release
    // at the report frees the whole chain
    assertReleased("pairRecall over two capped finders") {
      Dedup.pairRecall(
        Dedup.ngramJaccard(docs, "doc_id", "text", tau = 0.5,
          maxDf = Some(100)),
        Dedup.minhashLsh(docs, "doc_id", "text", tau = 0.5,
          maxDf = Some(100)))
    }
    assertReleased("dedupSegments") {
      Dedup.dedupSegments(docs, "doc_id", "text", sep = " ")
    }
    assertReleased("simhashPairs") {
      Dedup.simhashPairs(docs, "doc_id", "text")
    }
    assertReleased("corpusStatsExact") {
      Stats.corpusStatsExact(docs.withColumn("g", col("doc_id") % 2),
        "g", "text")
    }
    val mhDir = java.nio.file.Files.createTempDirectory("clmh")
      .toString + "/idx"
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", mhDir)
    assertReleased("dedupAgainstIndex") {
      Dedup.dedupAgainstIndex(spark, mhDir,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    }
  }
}
