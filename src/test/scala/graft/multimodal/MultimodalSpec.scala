package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.synthetic(spark, 30)

  test("synthetic media table has the contract schema") {
    assert(media.schema == Multimodal.mediaSchema)
    assert(media.count() == 30)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("image payloads are genuine PNGs and ImageIO decodes the real dims") {
    // driver-side round trip: a real PNG goes in, real dims come out
    val png = Multimodal.encodePng(7L, 48, 80)
    assert(png.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A),
      "payload does not start with the PNG magic bytes")
    val img = Multimodal.decodeImage(png)
    assert(img.isDefined)
    assert(img.get.getWidth == 48 && img.get.getHeight == 80)
    // and the same codec runs inside the executors via decodeImages
    val dec = Multimodal.decodeImages(media.filter(col("kind") === "image"))
    val wrong = dec.join(media, "media_id")
      .filter(col("dec_width") =!= col("meta.width") ||
        col("dec_height") =!= col("meta.height"))
    assert(wrong.count() == 0)
  }

  test("audio payloads are genuine WAVs and AudioSystem decodes the real samples") {
    // driver-side round trip: real RIFF/WAVE in, the exact PCM back out
    val wav = Multimodal.encodeWav(7L, nSamples = 96)
    assert(Multimodal.isRiff(wav), "payload does not start with RIFF magic")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val pcm = Multimodal.decodeAudio(wav)
    assert(pcm.isDefined && pcm.get.length == 96)
    // decode is bit-exact: re-encoding the decoded samples reproduces the
    // deterministic generator's output
    assert(Multimodal.decodeAudio(Multimodal.encodeWav(7L, 96)).get.toSeq ==
      pcm.get.toSeq)
    // and a different id yields different samples (not a constant stub)
    assert(Multimodal.decodeAudio(Multimodal.encodeWav(8L, 96)).get.toSeq !=
      pcm.get.toSeq)
    // the same codec runs inside the executors via decodeImages:
    // audio dims = (n_samples, 1), recorded in meta at synthesis time
    val dec = Multimodal.decodeImages(media.filter(col("kind") === "audio"))
    val wrong = dec.join(media, "media_id")
      .filter(col("dec_width") =!= col("meta.width") ||
        col("dec_height") =!= lit(1))
    assert(wrong.count() == 0)
  }

  test("decode recovers the dims recorded in metadata for every kind") {
    val dec = Multimodal.decodeImages(media)
    val joined = dec.join(media, "media_id")
      .filter(col("dec_width") =!= col("meta.width") ||
        col("dec_height") =!= col("meta.height"))
    assert(joined.count() == 0)
    // video payloads are real MJPEG containers — far larger than the
    // 40-byte fake, and dims come from an actual first-frame JPEG decode
    assert(dec.filter(col("kind") === "video" && col("n_bytes") <= 40)
      .count() == 0)
    assert(dec.filter(col("kind") === "image" && col("n_bytes") <= 40)
      .count() == 0)
    // WAV = 44-byte canonical header + 2 bytes per sample
    val audioMeta = media.filter(col("kind") === "audio")
      .select(col("media_id"), col("meta.width").as("n_samples"))
    assert(dec.select(col("media_id"), col("n_bytes")).join(audioMeta, "media_id")
      .filter(col("n_bytes") =!= col("n_samples") * 2 + 44)
      .count() == 0)
  }

  test("resize rescales real images (re-decoded dims) and rewrites fakes coherently") {
    val r = Multimodal.resize(media, 224, 224)
    // audio passes through resize untouched — payload and meta both
    val dec = Multimodal.decodeImages(r.filter(col("kind") =!= "audio"))
    assert(dec.filter(col("dec_width") =!= 224 || col("dec_height") =!= 224)
      .count() == 0)
    assert(r.filter(col("kind") =!= "audio" && col("meta.width") =!= 224)
      .count() == 0)
    // audio meta survives resize verbatim
    val audioOrig = media.filter(col("kind") === "audio")
      .select(col("media_id"), col("meta").as("meta_orig"))
    assert(r.filter(col("kind") === "audio")
      .select(col("media_id"), col("meta"))
      .join(audioOrig, "media_id")
      .filter(col("meta") =!= col("meta_orig")).count() == 0)
    // resized images are still decodable PNGs at the new size (checked via
    // dec above); audio payload bodies are untouched
    val origBody = media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload").as("body"))
    val newBody = r.filter(col("kind") === "audio").select(col("media_id"),
      col("payload").as("body2"))
    assert(origBody.join(newBody, "media_id")
      .filter(col("body") =!= col("body2")).count() == 0)
    // resized videos are rebuilt STANDARD AVI containers whose frames
    // decode at the new size (and whose avih header carries the new dims)
    val vid = r.filter(col("kind") === "video").select("payload").first()
      .getAs[Array[Byte]](0)
    val (aw, ah, frames) = Multimodal.decodeAvi(vid).get
    assert(aw == 224 && ah == 224)
    assert(frames.nonEmpty && frames.forall { f =>
      val im = Multimodal.decodeImage(f).get
      im.getWidth == 224 && im.getHeight == 224
    })
  }

  test("video payloads are structurally valid RIFF/AVI: independent chunk " +
    "walk finds the headers, the frames, and genuine JPEGs") {
    val avi = Multimodal.encodeAvi(3L, 64, 48, nFrames = 5)
    // independent minimal reader (NOT decodeAvi — that would test the
    // parser with itself): little-endian RIFF walk
    val bb = java.nio.ByteBuffer.wrap(avi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int) = new String(avi, off, 4, "US-ASCII")
    assert(fcc(0) == "RIFF" && fcc(8) == "AVI ")
    assert(bb.getInt(4) == avi.length - 8, "RIFF size field wrong")
    var pos = 12
    var avihDims = (0, 0); var totalFrames = -1
    var jpegFrames = 0
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (p + 8 <= end) {
        val id = fcc(p); val len = bb.getInt(p + 4)
        id match {
          case "LIST" => walk(p + 12, p + 8 + len)
          case "avih" =>
            totalFrames = bb.getInt(p + 8 + 16)
            avihDims = (bb.getInt(p + 8 + 32), bb.getInt(p + 8 + 36))
          case "00dc" =>
            // every frame chunk is a REAL JPEG: SOI marker + ImageIO decode
            assert((avi(p + 8) & 0xFF) == 0xFF && (avi(p + 9) & 0xFF) == 0xD8,
              "frame does not start with the JPEG SOI marker")
            val frame = java.util.Arrays.copyOfRange(avi, p + 8, p + 8 + len)
            val im = Multimodal.decodeImage(frame).get
            assert(im.getWidth == 64 && im.getHeight == 48)
            jpegFrames += 1
          case _ => ()
        }
        p += 8 + len + (len % 2)
      }
    }
    walk(pos, avi.length)
    assert(avihDims == ((64, 48)) && totalFrames == 5 && jpegFrames == 5)
    // decodeAvi agrees with the independent walk
    val (w, h, frames) = Multimodal.decodeAvi(avi).get
    assert(w == 64 && h == 48 && frames.length == 5)
    // a RIFF/WAVE payload is NOT mistaken for an AVI
    assert(Multimodal.decodeAvi(Multimodal.encodeWav(1L, 32)).isEmpty)
    // the legacy MJPG container stays accepted through videoFrames
    assert(Multimodal.videoFrames(
      Multimodal.encodeMjpeg(3L, 32, 32, 2)).get.length == 2)
    assert(Multimodal.videoFrames(avi).get.length == 5)
  }

  test("audio feature extraction windows REAL decoded PCM: n_windows/rms/peak") {
    val feats = Multimodal.extractAudioFeatures(media)   // window = 64 samples
    val nAudio = media.filter(col("kind") === "audio").count()
    assert(feats.count() == nAudio)
    // n_windows comes from the DECODED sample count (meta.width), not the
    // byte length — the real-codec signal
    val wrongWin = feats.join(media, "media_id")
      .filter(col("n_windows") =!= floor(col("meta.width") / 64))
    assert(wrongWin.count() == 0)
    val rows = feats.collect()
    rows.foreach { r =>
      // 16-bit PCM noise: rms well above the byte-range 255, peak ≤ 32768
      assert(r.getAs[Double]("rms") > 255.0 && r.getAs[Double]("rms") < 32768.0)
      assert(r.getAs[Int]("peak") > 255 && r.getAs[Int]("peak") <= 32768)
    }
    assert(Multimodal.extractAudioFeatures(media).collect().toSet ==
      rows.toSet)                                    // deterministic
    // cross-check one clip end-to-end against a driver-side decode
    val id = media.filter(col("kind") === "audio").select("media_id")
      .orderBy("media_id").first().getLong(0)
    val payload = media.filter(col("media_id") === id).select("payload")
      .first().getAs[Array[Byte]](0)
    val pcm = Multimodal.decodeAudio(payload).get.map(_.toDouble)
    val expRms = BigDecimal(math.sqrt(pcm.map(x => x * x).sum / pcm.length))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = feats.filter(col("media_id") === id).first()
    assert(got.getAs[Double]("rms") == expRms)
    assert(got.getAs[Int]("peak") == pcm.map(math.abs).max.toInt)
  }

  test("frame sampling emits every stride-th frame per video with stable digests") {
    val frames = Multimodal.sampleFrames(media, stride = 2)
    val vids = media.filter(col("kind") === "video")
      .select(col("media_id"), col("meta.n_frames").as("nf")).collect()
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    vids.foreach { v =>
      val expected = (v.getInt(1) + 1) / 2
      assert(counts(v.getLong(0)) == expected.toLong,
        s"media ${v.getLong(0)}: nf=${v.getInt(1)}")
    }
    // digests deterministic across runs
    val again = Multimodal.sampleFrames(media, stride = 2)
    assert(frames.collect().toSet == again.collect().toSet)
    // REAL decode evidence: sampled frame dims equal the recorded meta
    // dims, and the digest matches a driver-side parse of the container
    val dims = frames.join(media, "media_id")
      .filter(col("f_width") =!= col("meta.width") ||
        col("f_height") =!= col("meta.height"))
    assert(dims.count() == 0)
    val v = media.filter(col("kind") === "video").orderBy("media_id").first()
    val vid = v.getAs[Long]("media_id")
    val parsed = Multimodal.decodeAvi(v.getAs[Array[Byte]]("payload")).get._3
    val md = java.security.MessageDigest.getInstance("MD5")
    val expDigest = md.digest(parsed(0)).map("%02x".format(_)).mkString
    val got = frames.filter(col("media_id") === vid && col("frame_idx") === 0)
      .first().getAs[String]("frame_digest")
    assert(got == expDigest)
  }

  test("operators stay total over corrupt payloads and reject bad params") {
    import org.apache.spark.sql.Row
    // truncated payloads shorter than the 8-byte fake header: every
    // decoder misses and the fallback must not throw inside a task
    val short = Array[Byte](1, 2, 3)
    assert(Multimodal.decodeDims(short) == ((0, 0)))
    val corrupt = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, "video", short, Row(0, 0, 1, "bin")),
        Row(1L, "image", Array[Byte](), Row(0, 0, 1, "bin"))), 2),
      Multimodal.mediaSchema)
    val dec = Multimodal.decodeImages(corrupt).collect()
    assert(dec.length == 2 &&
      dec.forall(r => r.getInt(2) == 0 && r.getInt(3) == 0))
    // resize passes un-headerable payloads through untouched — and the
    // meta keeps describing the untouched payload instead of asserting
    // target dims the payload never got
    val resized = Multimodal.resize(corrupt, 224, 224)
      .select("media_id", "payload", "meta.width", "meta.height").collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3)))).toMap
    assert(resized(0L)._1.toSeq == short.toSeq && resized(1L)._1.isEmpty)
    assert(resized(0L)._2 == 0 && resized(0L)._3 == 0 &&
      resized(1L)._2 == 0 && resized(1L)._3 == 0)
    // a corrupt MJPG length field fails the parse (None) instead of
    // attempting the multi-GB allocation the field claims
    val bomb = java.nio.ByteBuffer.allocate(16)
    bomb.put("MJPG".getBytes("US-ASCII")).putInt(1).putInt(0x7FFFFFF0)
    assert(Multimodal.decodeMjpeg(bomb.array()).isEmpty)
    val negCount = java.nio.ByteBuffer.allocate(8)
    negCount.put("MJPG".getBytes("US-ASCII")).putInt(-3)
    assert(Multimodal.decodeMjpeg(negCount.array()).isEmpty)
    // ... and an implausible frame COUNT fails before the eager
    // per-frame Range materializes (zero-length-frame amplification)
    val countBomb = java.nio.ByteBuffer.allocate(16)
    countBomb.put("MJPG".getBytes("US-ASCII")).putInt(1000)
    assert(Multimodal.decodeMjpeg(countBomb.array()).isEmpty)
    // legacy MJPG payloads resize through the shared container assembler
    val mj = Multimodal.resize(
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          Row(2L, "video", Multimodal.encodeMjpeg(2L, 32, 32, 3),
            Row(32, 32, 3, "mjpg"))), 1),
        Multimodal.mediaSchema), 224, 224)
      .select("payload").first().getAs[Array[Byte]](0)
    val mjFrames = Multimodal.decodeMjpeg(mj).get
    assert(mjFrames.length == 3 && mjFrames.forall { f =>
      val im = Multimodal.decodeImage(f).get
      im.getWidth == 224 && im.getHeight == 224
    })
    // bad params are rejected at the driver, not deep in a task
    intercept[IllegalArgumentException](Multimodal.sampleFrames(media, 0))
    intercept[IllegalArgumentException](
      Multimodal.extractAudioFeatures(media, window = 0))
  }
}
