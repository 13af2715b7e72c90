package graft

import org.apache.spark.sql.AnalysisException

/** SQL surface injected by [[GraftExtensions]] (the test session enables
  * it via the spark.sql.extensions config — the production path). */
class ExtensionsSpec extends SparkSpec {

  test("dot_product and l2_distance are SQL-callable") {
    val row = spark.sql(
      "SELECT dot_product(array(1d,2d,3d), array(4d,5d,6d)) AS d, " +
      "l2_distance(array(0d,3d), array(4d,0d)) AS l").head()
    assert(row.getDouble(0) === 32.0)
    assert(row.getDouble(1) === 5.0)
  }

  test("recursive_split is SQL-callable and matches the Scala API") {
    val got = spark.sql("SELECT recursive_split('aa。bb。cc，dd。ee', 6, 0) AS c")
      .head().getSeq[String](0)
    assert(got === operators.Chunker.recursiveSplit("aa。bb。cc，dd。ee", 6, 0))
  }

  test("recursive_split rejects non-literal size") {
    val ex = intercept[Exception] {
      spark.sql("SELECT recursive_split('x', length('ab'), 0)").head()
    }
    assert(ex.isInstanceOf[IllegalArgumentException] || ex.isInstanceOf[AnalysisException])
  }

  test("registerAll is idempotent on a live session") {
    GraftExtensions.registerAll(spark)
    val d = spark.sql("SELECT dot_product(array(2d), array(3d)) AS d").head().getDouble(0)
    assert(d === 6.0)
  }

  test("md5Prefix64 bit-shifts equal the conv(substring(md5)) hex slices") {
    // the r19 fast path must stay bit-identical to the SQL/DuckDB
    // formulation the oracles use — 8 hex chars = top 32 bits,
    // 15 hex chars = top 60 bits of the digest
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.HashExpressions
    import spark.implicits._
    val df = Seq("", "a", "abc#1", "日本語テキスト", "x" * 1000,
        "multi\nline\ttext", "0").toDF("s")
    val checked = df.select(
      shiftrightunsigned(HashExpressions.md5Prefix64(col("s")), 32).as("h32"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("o32"),
      shiftrightunsigned(HashExpressions.md5Prefix64(col("s")), 4).as("h60"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("o60"))
      .collect()
    checked.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }
}
