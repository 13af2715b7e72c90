package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct, and decode / feature-extract / resize / frame-sample run as
  * batched per-partition transforms — the Scala analog of `mapInPandas`
  * (a partition iterator, processed in bounded batches, so a native
  * decoder library amortizes per-batch setup and memory stays bounded).
  *
  * The actual codecs aren't available in this environment, so the
  * decode step is a clearly-marked deterministic stub ([[stubDecode]]):
  * everything Spark-side — schema, batch shape, partitioning, column
  * plumbing — is real and tested; swapping in a real decoder is a
  * one-function change at the seam.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),  // md5 hex
    StructField("width", IntegerType, nullable = true),     // images/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true))) // audio/video

  /** Attach the metadata struct derived from the payload itself (the
    * cheap, header-only pass — pure Catalyst, no decode). Dimensions /
    * duration are stub-derived from the checksum where a real header
    * parser would read the container. */
  def withMetadata(df: DataFrame, binCol: String, kindCol: String): DataFrame = {
    val ck = md5(col(binCol))
    val h1 = conv(substring(ck, 1, 4), 16, 10).cast("int")
    val h2 = conv(substring(ck, 5, 4), 16, 10).cast("int")
    df.withColumn("media_meta", struct(
      col(kindCol).as("kind"),
      length(col(binCol)).cast("long").as("byte_len"),
      ck.as("checksum"),
      (h1 % 1920 + 1).as("width"),
      (h2 % 1080 + 1).as("height"),
      (conv(substring(ck, 9, 6), 16, 10).cast("long") % 600000L).as("duration_ms")))
  }

  /** STUB decoder seam — stands where libjpeg/ffmpeg would run. Produces
    * a deterministic `dim`-length feature vector from the payload bytes
    * (md5-mixed), so tests are exact and the plumbing is real. */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Double] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(dim) { j =>
      val b = java.util.Arrays.copyOf(d, d.length)
      b(j % b.length) = (b(j % b.length) ^ j).toByte
      val h = java.security.MessageDigest.getInstance("MD5").digest(b)
      val v = java.nio.ByteBuffer.wrap(h, 0, 8).getLong
      (v % 1000001L) / 1000000.0
    }
  }

  /** Batched per-partition feature extraction: iterate the partition in
    * batches of `batchSize`, run the (stub) decoder per batch, emit
    * (id, features). Narrow transform — no shuffle; batch size bounds
    * peak decoder memory exactly like `mapInPandas` batch shaping. */
  def decodeFeatures(df: DataFrame, idCol: String, binCol: String,
      dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val in = df.select(col(idCol).cast("long"), col(binCol))
    val rdd = in.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "decoder call" per batch — the external-library seam
        batch.iterator.map { r =>
          Row(r.getLong(0), stubDecode(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Stub resize: a real implementation decodes + scales pixels; the
    * plumbing contract is (payload, w, h) → payload', metadata updated.
    * Stub keeps the bytes, rewrites target dims in the metadata. */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("media_meta",
      col("media_meta").withField("width", lit(w))
        .withField("height", lit(h)))

  /** Perceptual-hash signature over a decoded feature vector: bit j set
    * iff features[j] >= thresh — the threshold step of pHash/aHash,
    * applied to whatever the decode seam emits (DCT coefficients from a
    * real decoder, [[stubDecode]]'s deterministic vector here, or any
    * embedding — thresh 0.0 over an embedding is the hyperplane-sign
    * sketch). Pure Catalyst; dim <= 60 keeps band math in a signed
    * long (the simhash convention). */
  def phashBits(features: org.apache.spark.sql.Column, dim: Int,
      thresh: Double = 0.5): org.apache.spark.sql.Column = {
    require(dim > 0 && dim <= 60, "dim must be in [1, 60]")
    (0 until dim).map { j =>
      when(element_at(features, j + 1) >= thresh, shiftleft(lit(1L), j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Near-duplicate media pairs by hamming distance over [[phashBits]]
    * signatures — the image/video analog of text simhash dedup (how a
    * LAION-scale corpus drops re-encodes and crops). Banding is the
    * same pigeonhole as [[Dedup.simhashPairs]]: maxHam+1 bands (the
    * last band absorbing the remainder bits) — any pair within maxHam
    * leaves at least one band untouched, so the band join finds
    * EXACTLY the all-pairs result while shuffling only band keys;
    * candidates then verify on the codegen'd XOR popcount. Input is an
    * (id, features) frame from [[decodeFeatures]] or any embedder at
    * the same seam. */
  def phashPairs(df: DataFrame, idCol: String, featuresCol: String,
      dim: Int, maxHam: Int = 2, thresh: Double = 0.5): DataFrame = {
    require(maxHam >= 0, "maxHam must be non-negative")
    val bands = maxHam + 1
    require(dim >= bands, s"need dim >= ${bands} bands (dim=$dim)")
    val width = (dim + bands - 1) / bands // ceil: all bits live in a band
    require((bands - 1) * width < dim,
      s"dim=$dim cannot split into $bands non-empty bands — lower maxHam")
    // ids compare in their NATIVE type (the simhashPairs convention): a
    // cast("long") here would turn non-numeric ids into NULLs, the
    // a.id < b.id predicate would then drop every pair, and the
    // operator would return empty instead of failing loudly
    val sig = df.select(col(idCol).as("id"),
      phashBits(col(featuresCol), dim, thresh).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until bands).map { b =>
        val w = math.min(width, dim - b * width) // last band: remainder
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * width).bitwiseAND((1L << w) - 1).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHam)
  }

  /** Frame sampling for video payloads: every `everyMs` milliseconds of
    * the (stub) duration, emit a frame row (media_id, frame_idx, ts_ms).
    * Real decode of the frame bytes happens at the [[stubDecode]] seam. */
  def sampleFrames(df: DataFrame, idCol: String, everyMs: Long = 1000L): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
        col("media_meta.duration_ms").as("dur"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), greatest(floor(col("dur") / everyMs), lit(0L)))))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * everyMs).as("ts_ms"))
}
