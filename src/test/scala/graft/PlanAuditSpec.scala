package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Plan-shape pins for the round-7 additions: the properties the
  * docstrings claim (filter-before-window, pushdown, broadcast) must be
  * visible in the optimized plan, not just asserted in prose. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private lazy val corpus = (1 to 50).map { i =>
    (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 131 + j * 17)))
  }.toDF("id", "v")
  private lazy val qs = (1 to 2).map { i =>
    (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 131 + j * 17)))
  }.toDF("qid", "qv")

  test("searchIteratorPage: cursor tail-filter sits below the rank window") {
    val cur = Seq((1L, 0.5, 10L), (2L, 0.4, 20L))
      .toDF("qid", "cur_score", "cur_id")
    val plan = Ann.searchIteratorPage(corpus, qs, pageSize = 5,
      cursors = Some(cur)).queryExecution.optimizedPlan
    // walk down from the Window: every node beneath it must already be
    // cursor-filtered — no Filter on cur_* above the Window
    val windowIdx = plan.collect { case w: org.apache.spark.sql.catalyst
      .plans.logical.Window => w }
    assert(windowIdx.nonEmpty, "no Window in plan")
    val filtersAbove = plan.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.exists(_.name.startsWith("cur_")) => f
    }
    // the cursor filter must exist SOMEWHERE...
    assert(filtersAbove.nonEmpty, "cursor filter optimized away entirely")
    // ...and the Window's child subtree must contain it (filter below window)
    val belowWindow = windowIdx.head.child.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.exists(_.name.startsWith("cur_")) => f
    }
    assert(belowWindow.nonEmpty,
      s"cursor filter is not beneath the rank window:\n$plan")
  }

  test("Collections: partition_names search prunes at the file listing and matches the filtered brute force") {
    import graft.operators.Collections
    val tmp = java.nio.file.Files.createTempDirectory("pcoll").toString + "/coll"
    val data = (1 to 60).map { i =>
      (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 131 + j * 17)), i % 3)
    }.toDF("id", "v", "part")
    Collections.writePartitioned(data, tmp, "part")
    assert(Collections.listPartitions(spark, tmp, "part")
      .as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
    val restricted = Collections.readPartitions(spark, tmp, "part", Seq(0, 2))
    // the isin must land in PartitionFilters (file-listing pruning),
    // not as a post-scan data filter
    val scan = restricted.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "part")),
      s"partition restriction not in PartitionFilters: $scan")
    assert(scan.selectedPartitions.partitionCount == 2,
      s"expected 2 partitions read, got ${scan.selectedPartitions.partitionCount}")
    // ranking equals brute force over the same subset
    val got = Collections.searchPartitions(spark, tmp, "part", Seq(0, 2),
        qs, k = 5)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val want = Ann.bruteForceTopK(
        data.filter(col("part").isin(0, 2)).select("id", "v"), qs, k = 5)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == want && got.nonEmpty)
    // empty parts = whole collection (the Milvus default)
    assert(Collections.readPartitions(spark, tmp, "part", Nil).count() == 60)
  }

  test("Collections: insertIntoPartition touches only its partition; dropPartition removes only its own") {
    import graft.operators.Collections
    val tmp = java.nio.file.Files.createTempDirectory("pcrud").toString + "/coll"
    val data = (1 to 30).map { i =>
      (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 131 + j * 17)), i % 3)
    }.toDF("id", "v", "part")
    Collections.writePartitioned(data, tmp, "part")
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesOf(part: Int) =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$tmp/part=$part"))
        .filter(_.isFile).map(f => (f.getPath.getName, f.getLen)).toSet
    val p0Before = filesOf(0)
    // insert 5 rows into partition 1 only
    Collections.insertIntoPartition(
      (100L to 104L).map(i => (i, Seq.tabulate(dim)(_.toDouble))).toDF("id", "v"),
      tmp, "part", 1)
    assert(filesOf(0) == p0Before, "insert into part 1 touched part 0's files")
    assert(Collections.readPartitions(spark, tmp, "part", Seq(1)).count() == 15)
    // a batch that already carries the partition column is ambiguous
    intercept[IllegalArgumentException] {
      Collections.insertIntoPartition(data, tmp, "part", 2)
    }
    // drop partition 2: gone from the listing, others intact
    Collections.dropPartition(spark, tmp, "part", 2)
    assert(Collections.listPartitions(spark, tmp, "part")
      .as[Int].collect().sorted.toSeq == Seq(0, 1))
    assert(filesOf(0) == p0Before)
    assert(Collections.readPartitions(spark, tmp, "part", Nil).count() == 25)
  }

  test("Collections: dropPartition resolves escaped and null partition values") {
    import graft.operators.Collections
    val tmp = java.nio.file.Files.createTempDirectory("pesc").toString + "/coll"
    // ':' and '/' are URL-escaped in the directory name by the writer;
    // null lands in __HIVE_DEFAULT_PARTITION__ — dropPartition must
    // derive the same names, not interpolate the raw value
    val data = Seq(
      (1L, "plain"), (2L, "a b:c/d"), (3L, null.asInstanceOf[String]))
      .toDF("id", "src")
    Collections.writePartitioned(data, tmp, "src")
    Collections.dropPartition(spark, tmp, "src", "a b:c/d")
    assert(spark.read.parquet(tmp).select("id").as[Long].collect().toSet
      == Set(1L, 3L), "escaped-value partition not dropped (or wrong one)")
    Collections.dropPartition(spark, tmp, "src", null)
    assert(spark.read.parquet(tmp).select("id").as[Long].collect().toSet
      == Set(1L), "null partition (__HIVE_DEFAULT_PARTITION__) not dropped")
  }

  test("curation scorers: model-table broadcasts and semi-joins are in the physical plan") {
    import graft.operators.{Curate, Dedup}
    val docs = (1L to 40L)
      .map(i => (i, s"some text number $i with shared words repeated over"))
      .toDF("id", "text")
    // perplexityScore: the one-row vocabulary frame must arrive via a
    // broadcast nested-loop join, never a shuffled cartesian
    val pplPhys = Curate.perplexityScore(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(pplPhys.contains("BroadcastNestedLoopJoin"),
      s"vocab cross join is not broadcast:\n$pplPhys")
    // importanceWeight: both bucket-count model tables (<= buckets rows)
    // must broadcast into the per-doc count join
    val dsirPhys = Curate.importanceWeight(
        docs.filter(col("id") > 5), docs.filter(col("id") <= 5),
        "id", "text", buckets = 64)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(dsirPhys).size >= 2,
      s"target/raw model tables not broadcast:\n$dsirPhys")
    // repeatedSpans: coverage comes from a LEFT SEMI against the
    // duplicated-hash set — the stream is never joined to itself
    val spanPhys = Dedup.repeatedSpans(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(spanPhys.contains("LeftSemi"),
      s"duplicated-hash restriction is not a semi-join:\n$spanPhys")
    // perplexityScoreWith: the one-row reference vocabulary must arrive
    // via a broadcast nested-loop join, same as the self-trained form
    val refPhys = Curate.perplexityScoreWith(
        docs.filter(col("id") > 5), docs.filter(col("id") <= 5), "id", "text")
      .queryExecution.executedPlan.toString
    assert(refPhys.contains("BroadcastNestedLoopJoin"),
      s"reference vocab cross join is not broadcast:\n$refPhys")
    // temperatureMixture: the stratum thresholds (<= strata rows) must
    // broadcast onto the corpus scan — the corpus side never shuffles
    val mixPhys = Curate.temperatureMixture(docs
        .withColumn("lang", when(col("id") % 3 === 0, "en").otherwise("de")),
        "id", "lang", alpha = 0.5, budget = 20)
      .queryExecution.executedPlan.toString
    assert(mixPhys.contains("BroadcastHashJoin"),
      s"mixture thresholds not broadcast:\n$mixPhys")
    // token-weighted form: same threshold-broadcast shape — the token
    // sum rides the stratum groupBy, never a second corpus pass
    val mixTokPhys = Curate.temperatureMixtureTokens(docs
        .withColumn("lang", when(col("id") % 3 === 0, "en").otherwise("de")),
        "id", "lang", "text", alpha = 0.5, budgetTokens = 200)
      .queryExecution.executedPlan.toString
    assert(mixTokPhys.contains("BroadcastHashJoin"),
      s"token-mixture thresholds not broadcast:\n$mixTokPhys")
    // shuffleShards: exactly one exchange (the shard hash partition) —
    // the per-shard rank must reuse it, never add a second shuffle
    val shufPhys = Curate.shuffleShards(docs, "id", numShards = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(shufPhys).size == 1,
      s"epoch shuffle must cost exactly one exchange:\n$shufPhys")
  }

  test("semanticContamination: benchmark broadcasts; the only exchange carries one row per corpus doc") {
    import graft.operators.Curate
    val corpus = (1L to 40L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 131 + j * 17))))
      .toDF("id", "v")
    val bench = (100L to 104L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 131 + j * 17))))
      .toDF("id", "v")
    val phys = Curate.semanticContamination(corpus, bench, "id", "v")
      .queryExecution.executedPlan.toString
    // the eval suite arrives via a broadcast cross join — per-pair dot
    // products never leave the corpus task
    assert(phys.contains("BroadcastNestedLoopJoin"),
      s"benchmark side is not broadcast:\n$phys")
    // the per-doc argmax is a map-side-combined struct-max (struct max
    // plans as partial+final SortAggregate): exactly one SHUFFLE
    // exchange, fed by the partial aggregate — it carries one narrow
    // row per corpus doc regardless of benchmark size
    assert("Exchange hashpartitioning".r.findAllIn(phys).size == 1,
      s"argmax must cost exactly one shuffle:\n$phys")
    assert(phys.contains("partial_min"),
      s"argmax must be map-side combined:\n$phys")
  }

  test("contrastive mining: anchors broadcast; every rank branch keeps the map-side WindowGroupLimit prune") {
    import graft.operators.Ann
    val corpus = (1L to 40L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 131 + j * 17))))
      .toDF("id", "v")
    val anchors = (1L to 5L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 131 + j * 17))))
      .toDF("qid", "qv")
    val phys = Ann.contrastiveTriplets(corpus, anchors, negK = 3,
        posThreshold = 0.9, negThreshold = 0.5)
      .queryExecution.executedPlan.toString
    // the anchor set rides a broadcast — the corpus scan never shuffles
    assert(phys.contains("BroadcastNestedLoopJoin"),
      s"anchor side is not broadcast:\n$phys")
    // BOTH rank branches (positive rn<=1, negative neg_rank<=negK) must
    // carry Catalyst's WindowGroupLimit — the map-side top-k prune that
    // caps every partition at k rows per anchor before the shuffle. A
    // combined-window formulation loses this and ships the whole
    // per-anchor pair list (the corpus) into one sort task per anchor.
    assert("WindowGroupLimit".r.findAllIn(phys).size >= 2,
      s"triplets lost the map-side top-k prune:\n$phys")
    // mineHardNegatives keeps the same prune
    val mine = Ann.mineHardNegatives(corpus, anchors, k = 3,
        dupThreshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(mine.contains("WindowGroupLimit"),
      s"mineHardNegatives lost the map-side top-k prune:\n$mine")
    // the export stage: the triplet set broadcasts three times against
    // the text table — the corpus is scanned, never sort-merge-joined
    val texts = (1L to 40L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val attach = Ann.attachTripletTexts(
        Ann.contrastiveTriplets(corpus, anchors, negK = 3,
          posThreshold = 0.9, negThreshold = 0.5), texts)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(attach).size >= 3,
      s"triplet attaches must broadcast:\n$attach")
    assert(!attach.contains("SortMergeJoin"),
      s"the text table must never shuffle into a sort-merge join:\n$attach")
  }

  test("rerankTopK: candidate enrichment broadcasts — the passage corpus never shuffles") {
    val cand = Seq((1L, 3L), (1L, 7L), (2L, 3L)).toDF("qid", "id")
    val queries = Seq((1L, "q one"), (2L, "q two")).toDF("qid", "qtext")
    val passages = (1L to 40L).map(i => (i, s"passage $i")).toDF("id", "ptext")
    val phys = Ann.rerankTopK(cand, queries, passages, k = 2)
      .queryExecution.executedPlan.toString
    // both the query-text join (q rows) and the candidate join (q×k'
    // rows) must be broadcast hash joins: the corpus-sized passage scan
    // stays in place, filtered by the broadcast candidate set — the
    // docstring's one-scan claim
    assert("BroadcastHashJoin".r.findAllIn(phys).size >= 2,
      s"rerank joins not broadcast:\n$phys")
    assert(!phys.contains("SortMergeJoin"),
      s"rerank shuffles a side it promised to broadcast:\n$phys")
  }

  test("containmentPairs: candidate join is an equi-join on the shingle hash, never a nested loop") {
    // the regression this pins: both candidate-join sides derive from
    // one `ranked` lineage, and an unaliased sh === sh resolves to the
    // same attribute — Catalyst folds it to `true`, the only remaining
    // predicates are inequalities, and the join silently becomes a
    // nested-loop cross product (output still exact thanks to the
    // verify, so ONLY the plan shape catches it)
    val docs = (1L to 30L).map(i => (i, s"document number $i with some shared filler text"))
      .toDF("doc_id", "text")
    // the Plan variant: the public operator hands off a materialized
    // cache, which reads as one InMemoryRelation leaf — the join shape
    // being pinned is only visible pre-materialization
    val (out, pins) = graft.operators.Dedup.containmentPairsPlan(
      docs, "doc_id", "text", 8, 0.5, None)
    val phys = out.queryExecution.executedPlan.toString
    pins.foreach(_.unpersist())
    assert(!phys.contains("NestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"containment candidate join degenerated to a non-equi join:\n$phys")
  }

  test("containment index probe: batch side broadcast against the stored scan, never a nested loop") {
    val history = (1L to 40L)
      .map(i => (i, s"history document number $i with some shared filler text"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("pacontain").toString + "/idx"
    graft.operators.Dedup.buildContainmentIndex(history, "doc_id", "text", dir)
    val batch = (101L to 110L)
      .map(i => (i, s"history document number ${i - 100} with some"))
      .toDF("doc_id", "text")
    val (out, pins) = graft.operators.Dedup.dropContainedAgainstIndexPlan(
      spark, dir, batch, "doc_id", "text", 0.8, None)
    val phys = out.queryExecution.executedPlan.toString
    pins.foreach(_.unpersist())
    // candidate generation and both verify semi-prunes ride broadcasts:
    // the stored shingle table is scanned in place, never shuffled
    assert("BroadcastHashJoin".r.findAllIn(phys).size >= 2,
      s"containment probe joins not broadcast:\n$phys")
    assert(!phys.contains("NestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"containment probe degenerated to a non-equi join:\n$phys")
  }

  test("bpe tokenize: both vocabulary tables broadcast — the corpus pass never sort-merges") {
    import graft.operators.Bpe
    val docs = (1L to 60L)
      .map(i => (i, s"alpha beta gamma word$i delta"))
      .toDF("id", "text")
    val rules = Seq(("a", "l"), ("al", "p"), ("e", "t"))
    val phys = Bpe.tokenize(docs, "id", "text", rules)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(phys).size >= 2,
      s"word→syms / symbol→id tables not broadcast:\n$phys")
    assert(!phys.contains("SortMergeJoin"),
      s"corpus pass degraded to a sort-merge join:\n$phys")
  }

  test("curation pipeline v2: pins hold through the chain and the mixture broadcast survives") {
    // the v1 lesson, asserted on v2: inter-stage persist+count keeps
    // real size stats flowing, so the LAST segment's plan must read
    // pinned InMemory frames and still broadcast the mixture
    // thresholds — a silent pin regression would degrade the join to
    // a shuffle and show neither marker. (Each earlier segment's
    // operator shapes — bloom predicate, model broadcasts, semi-joins
    // — are pinned by their own operator audits; the pins execute them
    // before this plan is cut.)
    val df = graft.SparkEntry.queries("q_curation_pipeline_v2")(
      spark, "/root/testdata/sf0.001")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("InMemoryTableScan"),
      s"inter-stage pins missing from the final segment:\n$phys")
    assert(phys.contains("BroadcastHashJoin"),
      s"mixture thresholds not broadcast in the final segment:\n$phys")
    assert(df.count() > 0, "v2 pipeline drained to zero rows at sf0.001")
  }

  test("persist+count replaces a join-inflated size estimate with actual bytes; localCheckpoint preserves it") {
    import graft.operators.Dedup
    // the curation flagship pins inter-stage frames with persist+count
    // because join-heavy chains carry multiplicatively INFLATED size
    // estimates, localCheckpoint PRESERVES the origin plan's estimate
    // (Spark 4 LogicalRDD), and a materialized InMemoryRelation reports
    // actual bytes — at sf0.1 the same pool planned as 39.7 GB
    // checkpointed vs 843 KB persisted, killing every downstream
    // broadcast (measured 2.4× on the flagship). Pin the mechanism on a
    // join-inflated frame: the persisted consumer's estimate must be
    // orders of magnitude below the checkpointed one, and minhashLsh
    // over the persisted frame must plan broadcast joins.
    val base = (1L to 60L)
      .map(i => (i, s"document number $i " + ("shared shingle text chunk " * 4)))
      .toDF("doc_id", "text")
    val joiny = base
      .join(base.select(col("doc_id")), Seq("doc_id"))
      .join(base.select(col("doc_id"), col("text").as("t2")), Seq("doc_id"))
      .drop("t2")
    def consumerBytes(df: org.apache.spark.sql.DataFrame): BigInt =
      df.filter(col("doc_id") > 0).queryExecution.optimizedPlan.stats.sizeInBytes
    val ckpt = joiny.localCheckpoint()
    val persisted = joiny.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted.count()
    val (pB, cB) = (consumerBytes(persisted), consumerBytes(ckpt))
    val phys = Dedup.minhashLsh(persisted, "doc_id", "text",
      w = 8, numHashes = 12, bands = 4, tau = 0.5)
      .queryExecution.executedPlan.toString
    persisted.unpersist()
    assert(pB * 100 < cB,
      s"persisted consumer estimate $pB is not ≪ checkpointed $cB — " +
        "the stats mechanism the flagship relies on has changed")
    assert(phys.contains("BroadcastHashJoin"),
      s"minhashLsh over the persisted pool plans no broadcast joins:\n$phys")
  }

  test("queryPage: id-range and predicate reach the parquet scan; order-by-limit is a TakeOrdered") {
    val tmp = java.nio.file.Files.createTempDirectory("qpage").toString
    (1L to 500L).map(i => (i, s"s${i % 3}", i * 2))
      .toDF("id", "src", "val").write.parquet(s"$tmp/t")
    val df = spark.read.parquet(s"$tmp/t")
    val page = graft.operators.Ingest.queryPage(df, "src = 's1'", "id",
      pageSize = 10, afterId = Some(100L))
    val phys = page.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"order-by-limit did not plan as TakeOrderedAndProject:\n$phys")
    assert(phys.contains("PushedFilters") &&
      phys.replaceAll("\\s", "").contains("GreaterThan(id,100"),
      s"id cursor not pushed to the scan:\n$phys")
  }

  test("crawlTriage: text never crosses a join, and the plan is partitioning-invariant") {
    import graft.operators.Curate
    // repartition: a Seq-backed LocalRelation would constant-fold the
    // whole triage away and hide the joins from the plan
    val old = (1 to 30).map(i => (i.toLong, s"the old doc body number $i with that text"))
      .toDF("id", "text").repartition(4)
    val neu = (5 to 35).map(i => (i.toLong, s"the new doc body number $i with that text"))
      .toDF("id", "text").repartition(3)
    val (out, pins) = Curate.crawlTriagePlan(old, neu, "id", "text", 3, 100000)
    val plan = out.queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size >= 3,
      s"expected the diff/history-anti/winner joins, got ${joins.size}:\n$plan")
    // the scale claim made checkable: every join input is already
    // reduced to id/fingerprint/verdict columns — the text is consumed
    // at scan time and never shuffles
    joins.foreach { j =>
      Seq(j.left, j.right).foreach { side =>
        assert(!side.output.exists(_.name == "text"),
          s"text column crosses a join:\n$plan")
      }
    }
    val base = out.as[(Long, String, String)].collect().toSet
    pins.foreach(_.unpersist())
    val rep = Curate.crawlTriage(old.repartition(11), neu.repartition(2),
      "id", "text", minWords = 3)
    assert(base == rep.as[(Long, String, String)].collect().toSet,
      "triage verdicts changed under repartitioning")
    rep.unpersist()
  }

  test("exact tombstone anti-join dispatches on size: broadcast under the cap, shuffled above it, verdicts identical") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("tombdisp")
      .toString + "/idx"
    val docs = (1 to 40).map(i => (i.toLong, s"tombstone dispatch doc $i"))
      .toDF("doc_id", "text")
    Dedup.buildExactIndex(docs, "doc_id", "text", dir)
    Dedup.deleteFromExactIndex(spark, dir,
      docs.filter($"doc_id" % 4 === 0).select("text"), "text")
    val probe = docs.select($"doc_id" + 100L as "doc_id", $"text")
    // walk the physical plan through AQE wrappers, collecting how each
    // LEFT ANTI (the tombstone filter) was planned
    def leftAntis(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      def walk(p: SparkPlan): Seq[String] = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case b: BroadcastHashJoinExec if b.joinType.sql == "LEFT ANTI" =>
          "broadcast" +: b.children.flatMap(walk)
        case s: SortMergeJoinExec if s.joinType.sql == "LEFT ANTI" =>
          "shuffle" +: s.children.flatMap(walk)
        case h: ShuffledHashJoinExec if h.joinType.sql == "LEFT ANTI" =>
          "shuffle" +: h.children.flatMap(walk)
        case other => other.children.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
    }
    // autoBroadcast off for the WHOLE test (planning AND execution — AQE
    // re-plans at runtime): the only broadcast left is the one the
    // dispatch's own hint forces, so the regimes are unambiguous
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.conf.set(Dedup.TombstoneBroadcastCapKey, (64L << 20).toString)
      val small = Dedup.dedupExactAgainstIndex(spark, dir, probe,
        "doc_id", "text") // takedown-sized regime: hint kept
      val a = small.as[(Long, Option[Long], Boolean)].collect().toSet
      assert(leftAntis(small) == Seq("broadcast"),
        s"under-cap tombstones must broadcast: ${leftAntis(small)}")
      spark.conf.set(Dedup.TombstoneBroadcastCapKey, "0")
      val big = Dedup.dedupExactAgainstIndex(spark, dir, probe,
        "doc_id", "text") // day-sized regime: hint dropped
      val b = big.as[(Long, Option[Long], Boolean)].collect().toSet
      assert(leftAntis(big) == Seq("shuffle"),
        s"over-cap tombstones must not be force-broadcast: ${leftAntis(big)}")
      // dispatch is a plan choice, never a semantics one
      assert(a == b && a.count(_._3) == 30,
        s"verdicts diverged across regimes: ${a.size}/${b.size}")
    } finally {
      spark.conf.unset(Dedup.TombstoneBroadcastCapKey)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
