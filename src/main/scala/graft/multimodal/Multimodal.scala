package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.3): image/audio/video payloads as
  * opaque `BinaryType` columns with a typed metadata struct.
  *
  * The Spark-side shape — schema, partition-friendly batch processing via
  * `mapPartitions`, stable UDF signatures — is real and tested. The codec
  * step itself is a STUB: this container has no image/audio libraries, so
  * `decodeImage` parses a deterministic fake header instead of calling a
  * real decoder. Swapping in a real codec changes ONE function body and no
  * plumbing.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver collect,
  * no base64 inflation); per-partition processing amortizes decoder init
  * (the expensive part of real codecs) across a whole partition — the same
  * batching rationale as Python's `mapInPandas` on a PySpark stack.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),          // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))))))

  /** Deterministic synthetic payload: an 8-byte fake header
    * (width:int,height:int big-endian) + pseudo-random body derived from
    * the id. Stands in for real image bytes in tests.
    */
  def fakePayload(id: Long, width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 32)
    bb.putInt(width).putInt(height)
    var x = id * 0x9E3779B97F4A7C15L + 1
    (0 until 32).foreach { _ =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      bb.put((x & 0xFF).toByte)
    }
    bb.array()
  }

  /** Synthesize a deterministic media table of `n` rows. */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0L until n.toLong).map { i =>
      val w = 32 + (i % 8).toInt * 16
      val h = 32 + (i % 5).toInt * 16
      Row(i, Seq("image", "audio", "video")((i % 3).toInt),
        fakePayload(i, w, h), Row(w, h, 1 + (i % 10).toInt, "fake"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }

  /** STUB decode: parse (width, height) from the fake 8-byte header.
    * A real implementation would call an image codec here — signature,
    * batching, and output schema would be unchanged.
    */
  def decodeDims(payload: Array[Byte]): (Int, Int) = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    (bb.getInt(0), bb.getInt(4))
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("dec_width", IntegerType),
    StructField("dec_height", IntegerType),
    StructField("n_bytes", IntegerType)))

  /** Batch "decode" over partitions: one pass per partition, codec state
    * (here: none) initialized once per partition, rows streamed through.
    */
  def decodeImages(df: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    df.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { it =>
        // real codecs would init here, once per partition
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h) = decodeDims(payload)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), w, h,
            payload.length)
        }
      }(enc).toDF()
  }

  /** STUB resize: rewrite the fake header to the new dims, keep the body.
    * Plumbing (binary→binary column transform) is real.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val resizeUdf = udf { payload: Array[Byte] =>
      val out = payload.clone()
      val bb = java.nio.ByteBuffer.wrap(out)
      bb.putInt(0, w); bb.putInt(4, h)
      out
    }
    df.withColumn("payload", resizeUdf(col("payload")))
      .withColumn("meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        col("meta.n_frames").as("n_frames"), col("meta.format").as("format")))
  }

  private val audioFeatSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_windows", IntegerType),
    StructField("rms", DoubleType),
    StructField("peak", IntegerType)))

  /** STUB audio feature extraction: window the payload body into fixed
    * 8-byte frames and compute RMS energy + peak amplitude over the raw
    * bytes — a real implementation would decode PCM and window samples;
    * the per-partition batching, fixed output schema, and windowing shape
    * are the actual plumbing under test.
    */
  def extractAudioFeatures(df: DataFrame, window: Int = 8): DataFrame = {
    val enc = Encoders.row(audioFeatSchema)
    df.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val body = r.getAs[Array[Byte]]("payload").drop(8)
          val nWin = body.length / window
          val sq = body.map(b => (b & 0xFF).toDouble).map(x => x * x).sum
          val rms = if (body.isEmpty) 0.0 else math.sqrt(sq / body.length)
          val peak = if (body.isEmpty) 0 else body.map(_ & 0xFF).max
          Row(r.getAs[Long]("media_id"), nWin,
            BigDecimal(rms).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, peak)
        }
      }(enc).toDF()
  }

  /** STUB frame sampling for video: emit every `stride`-th frame index with
    * a deterministic per-frame digest. Explode shape (one row per sampled
    * frame) is the real plumbing a video pipeline needs.
    */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        col("payload"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumn("frame_digest",
        md5(concat(hex(col("payload")), lit(":"), col("frame_idx"))))
      .select(col("media_id"), col("frame_idx"), col("frame_digest"))
}
