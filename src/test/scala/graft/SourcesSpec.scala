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

  test("Ingest.pipeline: existence check skips already-ingested docs") {
    val docs = Seq((1L, "aaa bbb", "s", "en"), (2L, "ccc ddd", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val existing = Seq(1L).toDF("file_id")
    val out = Ingest.pipeline(docs, existing, dim = 4)
    assert(out.select("file_id").distinct().as[Long].collect().toSeq == Seq(2L))
  }
}
