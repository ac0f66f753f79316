package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.3): image/audio/video payloads as
  * opaque `BinaryType` columns with a typed metadata struct.
  *
  * IMAGE decode and resize are REAL: payloads are genuine PNG bytes
  * (encoded with the JDK's built-in `javax.imageio` PNG codec — no
  * external libraries) and `decodeImages`/`resize` run an actual
  * `ImageIO.read` / `Graphics2D` rescale. Audio/video codec bodies remain
  * deterministic stand-ins (no PCM/video codecs ship with the JDK); their
  * Spark-side plumbing — schema, per-partition batching, stable UDF
  * signatures — is the same tested shape as the real image path.
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

  /** Deterministic synthetic payload for AUDIO/VIDEO: an 8-byte fake header
    * (width:int,height:int big-endian) + pseudo-random body derived from
    * the id. Stands in for real sample/frame bytes in tests.
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

  /** A REAL PNG payload: deterministic per-id RGB pixels encoded with the
    * JDK's `javax.imageio` PNG writer (BufferedImage is headless-safe).
    */
  def encodePng(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = id * 0x9E3779B97F4A7C15L + 1
    var py = 0
    while (py < height) {
      var px = 0
      while (px < width) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        img.setRGB(px, py, (x & 0xFFFFFF).toInt)
        px += 1
      }
      py += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic media table of `n` rows: image rows carry
    * real PNG bytes, audio/video rows the fake-header payload.
    */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0L until n.toLong).map { i =>
      val w = 32 + (i % 8).toInt * 16
      val h = 32 + (i % 5).toInt * 16
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val payload =
        if (kind == "image") encodePng(i, w, h) else fakePayload(i, w, h)
      val fmt = if (kind == "image") "png" else "fake"
      Row(i, kind, payload, Row(w, h, 1 + (i % 10).toInt, fmt))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }

  /** REAL image decode: `ImageIO.read` over the payload bytes; returns None
    * when the bytes are not a decodable image (then callers may fall back
    * to the fake-header path for the synthetic audio/video payloads).
    */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))

  /** Fake-header dims parse for the synthetic audio/video payloads. */
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

  /** Batch decode over partitions: one pass per partition, rows streamed
    * through. Images go through the REAL `ImageIO` codec (its reader-SPI
    * registry scan is per-JVM — amortized exactly like the per-partition
    * init of heavier codecs); non-image payloads fall back to the
    * fake-header parse.
    */
  def decodeImages(df: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    df.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { it =>
        // heavier codecs would init state here, once per partition
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h) = decodeImage(payload)
            .map(im => (im.getWidth, im.getHeight))
            .getOrElse(decodeDims(payload))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), w, h,
            payload.length)
        }
      }(enc).toDF()
  }

  /** Resize: REAL `Graphics2D` bilinear rescale + PNG re-encode for image
    * payloads; fake-header rewrite for the synthetic audio/video payloads.
    * Either way a binary→binary column transform — the plumbing a 100 TB
    * image pipeline runs, with the payload never leaving the executor.
    */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val resizeUdf = udf { payload: Array[Byte] =>
      decodeImage(payload) match {
        case Some(src) =>
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          bos.toByteArray
        case None =>
          val out = payload.clone()
          val bb = java.nio.ByteBuffer.wrap(out)
          bb.putInt(0, w); bb.putInt(4, h)
          out
      }
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
