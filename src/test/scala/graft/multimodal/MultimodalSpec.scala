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

  test("decode (stub) recovers the dims recorded in metadata, per partition") {
    val dec = Multimodal.decodeImages(media)
    val joined = dec.join(media, "media_id")
      .filter(col("dec_width") =!= col("meta.width") ||
        col("dec_height") =!= col("meta.height"))
    assert(joined.count() == 0)
    assert(dec.filter(col("n_bytes") =!= 40).count() == 0)
  }

  test("resize rewrites payload header and metadata coherently") {
    val r = Multimodal.resize(media, 224, 224)
    val dec = Multimodal.decodeImages(r)
    assert(dec.filter(col("dec_width") =!= 224 || col("dec_height") =!= 224)
      .count() == 0)
    assert(r.filter(col("meta.width") =!= 224).count() == 0)
    // body bytes (beyond the 8-byte header) unchanged
    val origBody = media.select(col("media_id"),
      expr("substring(payload, 9, 32)").as("body"))
    val newBody = r.select(col("media_id"),
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
