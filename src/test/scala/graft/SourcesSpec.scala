package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{JsonlSource, SegmentWriter, VectorSchema}
import graft.operators.Ingest

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("JsonlSource: row-range slice + synthesized file_name") {
    val dir = Files.createTempDirectory("jsonl").toString
    val path = s"$dir/data.jsonl"
    val lines = (1 to 10).map(i => s"""{"title":"Doc $i!","body":"text $i"}""")
    Files.write(Paths.get(path), String.join("\n", lines: _*).getBytes)
    val df = JsonlSource.read(spark, path, start = 3, end = Some(5))
    val rows = df.select("row_num", "file_name").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(3L, 4L, 5L))
    assert(rows.head._2 == "Doc3_3.pdf")
  }

  test("SegmentWriter: maxRecordsPerFile bounds every segment") {
    val dir = Files.createTempDirectory("seg").toString + "/out"
    val df = (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "s")
    SegmentWriter.write(df, dir, maxRecordsPerFile = 10, avgRowBytes = 64)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val counts = files.map(f => spark.read.parquet(f.getPath).count())
    assert(counts.forall(_ <= 10), s"segment over cap: ${counts.toSeq}")
    assert(counts.sum == 100)
  }

  test("SegmentWriter: manifest matches the written segment files") {
    val dir = Files.createTempDirectory("segm").toString + "/out"
    val df = (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "s")
    val manifest = SegmentWriter.write(df, dir, maxRecordsPerFile = 10, avgRowBytes = 64)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
    assert(manifest.map(_.path.stripPrefix("file:")).toSet == files)
    assert(manifest.map(_.rows).sum == 100)
    manifest.foreach { m =>
      assert(m.rows > 0 && m.rows <= 10, s"bad rows in $m")
      assert(m.bytes > 0, s"bad bytes in $m")
    }
    // round-trips through the persisted _MANIFEST.json
    assert(SegmentWriter.readManifest(spark, dir) == manifest.sortBy(_.path))
  }

  test("SegmentWriter: manifest round-trips paths with quotes and backslashes") {
    // a directory name with `"` and `\` is legal on the filesystem and
    // must survive the JSON manifest round-trip un-corrupted
    val base = Files.createTempDirectory("segq").toString
    val dir = base + """/we"ird\dir"""
    val df = (1 to 20).map(i => (i.toLong, s"row $i")).toDF("id", "s")
    val manifest = SegmentWriter.write(df, dir, maxRecordsPerFile = 10, avgRowBytes = 64)
    assert(manifest.nonEmpty)
    assert(manifest.forall(_.path.contains("""we"ird\dir""")))
    assert(SegmentWriter.readManifest(spark, dir) == manifest.sortBy(_.path))
  }

  test("SegmentWriter.compactSegments: small files merge, data and manifest stay exact") {
    val dir = Files.createTempDirectory("segc").toString + "/out"
    val df = (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "s")
    // <= 10 rows per file per task -> many undersized segments
    SegmentWriter.write(df, dir, maxRecordsPerFile = 10, avgRowBytes = 64)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles().length > 1)
    val manifest = SegmentWriter.compactSegments(spark, dir,
      targetBytes = 64L * 1024 * 1024)
    // every undersized segment merged into one; nothing lost or doubled
    assert(parquetFiles().length == 1, s"got ${parquetFiles().length} files")
    val back = spark.read.parquet(dir).as[(Long, String)].collect().sorted
    assert(back.toSeq == (1 to 100).map(i => (i.toLong, s"row $i")))
    // the returned manifest matches the compacted layout and round-trips
    assert(manifest.length == 1 && manifest.head.rows == 100)
    assert(SegmentWriter.readManifest(spark, dir) == manifest)
    // a single undersized file has nothing to merge with — no-op
    val again = SegmentWriter.compactSegments(spark, dir,
      targetBytes = 64L * 1024 * 1024)
    assert(again == manifest && parquetFiles().length == 1)
    // no staging leftovers
    assert(!new java.io.File(dir, "_compact_tmp").exists())
  }

  test("Ingest.pipeline: sparse map survives token-bucket collisions") {
    // find two distinct tokens whose 2^18 buckets collide — the same
    // md5-derived hash H.hash32(11, tok) % 2^18 the pipeline uses; a
    // duplicate map key threw under mapKeyDedupPolicy=EXCEPTION before
    // the bucket-level distinct
    def bucket(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"11#$t".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % (1 << 18)
    }
    val collide = (0 until 3000).map(i => s"tok$i")
      .groupBy(bucket).values.find(_.size >= 2).get
    val docs = Seq((1L, collide.mkString(" "), "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val out = Ingest.pipeline(docs, Seq.empty[Long].toDF("file_id"), dim = 4).collect()
    assert(out.nonEmpty)
    val sparse = out(0).getAs[Map[Int, Double]]("sparse_embedding")
    assert(sparse.contains(bucket(collide.head).toInt))
  }

  test("Ingest.upsert: update rows replace base rows sharing the key") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "v")
    val updates = Seq((2L, "B2"), (4L, "D")).toDF("doc_id", "v")
    val out = Ingest.upsert(base, updates, "doc_id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "D")))
  }

  test("Ingest.pipeline: null text doesn't break the plan") {
    val docs = Seq((1L, null.asInstanceOf[String], "s", "en"),
      (2L, "real text here", "s", "en")).toDF("doc_id", "text", "source", "lang")
    val out = Ingest.pipeline(docs, Seq.empty[Long].toDF("file_id"), dim = 4)
    // the null-text doc still flows (reformat coalesces to 无标题/无内容);
    // no exception, and the real doc's rows are intact
    val byDoc = out.select("file_id").as[Long].collect().toSet
    assert(byDoc.contains(2L))
  }

  test("Ingest.pipeline conforms to the Milvus bulk schema layout") {
    val docs = Seq((1L, "hello world document text", "src0", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val existing = Seq.empty[Long].toDF("file_id")
    val out = Ingest.pipeline(docs, existing, dim = 8)
    assert(out.columns.toSeq == VectorSchema.schema.fieldNames.toSeq)
    val row = out.collect()(0)
    assert(row.getAs[collection.Seq[Double]]("dense_embedding").size == 8)
    assert(row.getAs[Map[Int, Double]]("sparse_embedding").nonEmpty)
    assert(row.getAs[String]("file_name").endsWith("_1.pdf"))
  }

  test("Ingest.filesByKnowledge + queryByExpr: dim-table lookup surfaces") {
    val dim = Seq((1L, 10L, "a.pdf"), (3L, 10L, "c.pdf"), (2L, 20L, "b.pdf"))
      .toDF("id", "knowledge_base_id", "name")
    // get_files_by_knowledge: filter + ORDER BY id ASC
    val got = Ingest.filesByKnowledge(dim, "knowledge_base_id", lit(10L), "id")
      .select("id", "name").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a.pdf"), (3L, "c.pdf")))
    // collection.query(expr, output_fields): parsed predicate + pruning
    val q = Ingest.queryByExpr(dim, "name = 'b.pdf'", Seq("id"))
      .as[Long].collect().toSeq
    assert(q == Seq(2L))
  }

  test("Ingest.queryIterator: pages tile the filtered set exactly; short page ends the walk") {
    val rows = (1L to 47L).map(i => (i, s"name_$i", i % 3 == 0))
      .toDF("id", "name", "keep")
    val pages = Ingest.queryIterator(rows, "keep", "id", pageSize = 6,
      outputFields = Seq("id", "name")).toList
    // 15 matching ids (3,6,...,45) → pages of 6,6,3
    assert(pages.map(_.count()) == List(6L, 6L, 3L))
    val ids = pages.flatMap(_.select("id").as[Long].collect())
    assert(ids == (3L to 45L by 3L).toList, "pages out of order or overlapping")
    // page boundary is the cursor: page 2 starts strictly after page 1's max
    val p2first = pages(1).select("id").as[Long].collect().min
    assert(p2first == 21L)
    // exact-multiple tail: 12 matches, pageSize 6 → two pages, no empty third
    val even = (1L to 36L).map(i => (i, i % 3 == 0)).toDF("id", "keep")
    val evenPages = Ingest.queryIterator(even, "keep", "id", pageSize = 6).toList
    assert(evenPages.map(_.count()) == List(6L, 6L))
  }

  test("SegmentWriter.writeBucketed: co-located self-join plans no shuffle") {
    val dir = Files.createTempDirectory("buck").toString + "/tbl"
    val df = (1 to 100).map(i => (i.toLong, s"p$i")).toDF("file_id", "payload")
    SegmentWriter.writeBucketed(df, dir, "seg_bucketed", "file_id", numBuckets = 4)
    // force a sort-merge join so the assertion sees bucketing, not a
    // small-table broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("seg_bucketed")
      val joined = t.as("a").join(t.as("b"), "file_id")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"shuffle in bucketed join plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS seg_bucketed")
    }
  }

  test("Ingest.resumeFrom: reruns skip docs already in the segment output") {
    val dir = Files.createTempDirectory("resume").toString + "/segs"
    val docs = Seq((1L, "aaa bbb", "s", "en"), (2L, "ccc ddd", "s", "en"),
      (3L, "eee fff", "s", "en")).toDF("doc_id", "text", "source", "lang")
    // nothing written yet → everything pending
    assert(Ingest.resumeFrom(docs, dir).count() == 3)
    // a dir with no data files (killed mid-write) must behave the same,
    // not crash schema inference
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "_MANIFEST.json"), "")
    assert(Ingest.resumeFrom(docs, dir).count() == 3)
    val firstRun = Ingest.pipeline(docs.filter(col("doc_id") <= 2),
      Seq.empty[Long].toDF("file_id"), dim = 4)
    SegmentWriter.write(firstRun, dir, maxRecordsPerFile = 10, avgRowBytes = 64)
    // the output is the ledger: only the unwritten doc remains
    val pending = Ingest.resumeFrom(docs, dir).select("doc_id").as[Long].collect().toSeq
    assert(pending == Seq(3L))
  }

  test("manifest id ranges prune resumeFrom's ledger scan to overlapping segments") {
    val dir = Files.createTempDirectory("segrange").toString + "/segs"
    (1L to 50L).map(i => (i, s"c$i")).toDF("file_id", "content")
      .coalesce(1).write.parquet(dir)
    (1000L to 1050L).map(i => (i, s"c$i")).toDF("file_id", "content")
      .coalesce(1).write.mode("append").parquet(dir)
    val manifest = SegmentWriter.writeManifest(spark, dir)
    assert(manifest.length == 2)
    // footer-derived bounds present and correct, and they round-trip
    val byMin = manifest.sortBy(_.minId.get)
    assert(byMin.head.minId.contains(1L) && byMin.head.maxId.contains(50L))
    assert(byMin.last.minId.contains(1000L) && byMin.last.maxId.contains(1050L))
    assert(SegmentWriter.readManifest(spark, dir) == manifest)
    def tail(p: String) = p.substring(p.indexOf("/segs"))
    // a batch whose ids only overlap the low segment reads ONLY it
    val docs = Seq((10L, "x"), (40L, "y"), (60L, "z")).toDF("doc_id", "text")
    val out = Ingest.resumeFrom(docs, dir)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(60L))
    val scanned = out.inputFiles.filter(_.endsWith(".parquet")).map(tail).toSet
    assert(scanned == Set(tail(byMin.head.path)),
      s"ledger scan not pruned: $scanned")
    // a segment appended AFTER the last writeManifest is ranged nowhere:
    // pruning by the stale manifest would hide its file_ids from the
    // ledger and silently re-ingest its docs — the coverage check must
    // fall back to the full directory instead
    (60L to 70L).map(i => (i, s"c$i")).toDF("file_id", "content")
      .coalesce(1).write.mode("append").parquet(dir)
    val stale = Ingest.resumeFrom(docs, dir)
    assert(stale.select("doc_id").as[Long].collect().toSet == Set.empty[Long],
      "doc 60 re-ingested: stale manifest hid the appended segment")
    // after the manifest is refreshed the pruning resumes
    SegmentWriter.writeManifest(spark, dir)
    val refreshed = Ingest.resumeFrom(docs, dir)
    assert(refreshed.select("doc_id").as[Long].collect().toSet
      == Set.empty[Long])
    assert(refreshed.inputFiles.filter(_.endsWith(".parquet")).length < 3,
      "refreshed manifest no longer prunes")
    // without a manifest the full directory is the (correct) fallback
    new java.io.File(dir, "_MANIFEST.json").delete()
    val full = Ingest.resumeFrom(docs, dir)
    assert(full.select("doc_id").as[Long].collect().toSet == Set.empty[Long])
    assert(full.inputFiles.filter(_.endsWith(".parquet")).length == 3,
      "manifest-less fallback should scan the whole directory")
  }

  test("existsInSegments: check_exists against the ledger, range-pruned like resumeFrom") {
    val dir = Files.createTempDirectory("segexists").toString + "/segs"
    // absent dir: nothing exists yet
    val probe = Seq((10L, "x"), (40L, "y"), (1040L, "z"), (5000L, "w"))
      .toDF("doc_id", "text")
    assert(Ingest.existsInSegments(probe, dir).count() == 0)
    (1L to 50L).map(i => (i, s"c$i")).toDF("file_id", "content")
      .coalesce(1).write.parquet(dir)
    (1000L to 1050L).map(i => (i, s"c$i")).toDF("file_id", "content")
      .coalesce(1).write.mode("append").parquet(dir)
    val manifest = SegmentWriter.writeManifest(spark, dir)
    val hit = Ingest.existsInSegments(probe, dir)
    assert(hit.select("doc_id").as[Long].collect().toSet
      == Set(10L, 40L, 1040L))
    // a probe overlapping only the low segment scans ONLY it
    def tail(p: String) = p.substring(p.indexOf("/segs"))
    val low = Ingest.existsInSegments(
      Seq((10L, "x"), (40L, "y")).toDF("doc_id", "text"), dir)
    assert(low.select("doc_id").as[Long].collect().toSet == Set(10L, 40L))
    val scanned = low.inputFiles.filter(_.endsWith(".parquet")).map(tail).toSet
    val lowSeg = manifest.sortBy(_.minId.get).head
    assert(scanned == Set(tail(lowSeg.path)),
      s"exists-check ledger scan not pruned: $scanned")
  }

  test("Ingest.pipeline: existence check skips already-ingested docs") {
    val docs = Seq((1L, "aaa bbb", "s", "en"), (2L, "ccc ddd", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val existing = Seq(1L).toDF("file_id")
    val out = Ingest.pipeline(docs, existing, dim = 4)
    assert(out.select("file_id").distinct().as[Long].collect().toSeq == Seq(2L))
  }
}
