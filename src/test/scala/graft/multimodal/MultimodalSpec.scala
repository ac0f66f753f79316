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

  test("decode recovers the dims recorded in metadata for every kind") {
    val dec = Multimodal.decodeImages(media)
    val joined = dec.join(media, "media_id")
      .filter(col("dec_width") =!= col("meta.width") ||
        col("dec_height") =!= col("meta.height"))
    assert(joined.count() == 0)
    // fake audio/video payloads are exactly header+body; PNGs are bigger
    assert(dec.filter(col("kind") =!= "image" && col("n_bytes") =!= 40)
      .count() == 0)
    assert(dec.filter(col("kind") === "image" && col("n_bytes") <= 40)
      .count() == 0)
  }

  test("resize rescales real images (re-decoded dims) and rewrites fakes coherently") {
    val r = Multimodal.resize(media, 224, 224)
    val dec = Multimodal.decodeImages(r)
    assert(dec.filter(col("dec_width") =!= 224 || col("dec_height") =!= 224)
      .count() == 0)
    assert(r.filter(col("meta.width") =!= 224).count() == 0)
    // resized images are still decodable PNGs at the new size (checked via
    // dec above); fake payload bodies beyond the 8-byte header are unchanged
    val nonImage = media.filter(col("kind") =!= "image")
    val origBody = nonImage.select(col("media_id"),
      expr("substring(payload, 9, 32)").as("body"))
    val newBody = r.filter(col("kind") =!= "image").select(col("media_id"),
      expr("substring(payload, 9, 32)").as("body2"))
    assert(origBody.join(newBody, "media_id")
      .filter(col("body") =!= col("body2")).count() == 0)
  }

  test("audio feature extraction: deterministic windows/rms/peak over audio rows only") {
    val feats = Multimodal.extractAudioFeatures(media)
    val nAudio = media.filter(col("kind") === "audio").count()
    assert(feats.count() == nAudio)
    val rows = feats.collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("n_windows") == 4)        // 32-byte body / 8
      assert(r.getAs[Double]("rms") >= 0.0)
      assert(r.getAs[Int]("peak") >= 0 && r.getAs[Int]("peak") <= 255)
    }
    assert(Multimodal.extractAudioFeatures(media).collect().toSet ==
      rows.toSet)                                    // deterministic
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
  }
}
