package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal plumbing: binary payloads round-trip through the codec
  * boundary, partition-streamed decode/resize/frame-sample/features.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def img(id: Long, w: Int, h: Int, c: Int): Image =
    Image(id, w, h, c,
      Array.tabulate(w * h * c)(i => ((i * 37 + id) % 256).toByte))

  private lazy val media = Seq(
    MediaRow(1, "image", SyntheticCodec.encode(img(1, 4, 4, 3)), "gft"),
    MediaRow(2, "image", SyntheticCodec.encode(img(2, 8, 2, 1)), "gft"),
    MediaRow(3, "image", Array[Byte](1, 2, 3), "junk"), // undecodable
    MediaRow(4, "video", Multimodal.packFrames(
      (0 until 6).map(i => SyntheticCodec.encode(img(100 + i, 2, 2, 1)))),
      "gftv")
  ).toDS().repartition(3) // exercise multi-partition mapPartitions

  test("metadata extraction flags undecodable payloads") {
    val got = Multimodal.imageMeta(media).collect()
      .map(m => m.mediaId -> m).toMap
    assert(got(1L) == ImageMeta(1, 4, 4, 3, ok = true))
    assert(got(2L) == ImageMeta(2, 8, 2, 1, ok = true))
    assert(!got(3L).ok)
  }

  test("resize resamples pixels and re-encodes; junk rows dropped") {
    val out = Multimodal.resize(media.filter(_.kind == "image"), 2, 2)
    val metas = Multimodal.imageMeta(out).collect()
    assert(metas.forall(m => m.ok && m.width == 2 && m.height == 2))
    // nearest-neighbor: top-left pixel survives exactly
    val orig = img(1, 4, 4, 3)
    val resized = out.filter(_.mediaId == 1).head()
    val decoded = SyntheticCodec.decode(resized.data).get
    assert(decoded.pixels(0) == orig.pixels(0))
    assert(decoded.channels == 3)
  }

  test("frame sampling explodes every Nth frame to rows") {
    val frames = Multimodal.sampleFrames(media, everyN = 2).collect()
    assert(frames.map(_.frameIdx).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.mediaId == 4))
    assert(frames.forall(f => f.image.width == 2 && f.image.height == 2))
  }

  test("features are fixed-width float vectors in the ANN input shape") {
    val feats = Multimodal.imageFeatures(media.filter(_.kind == "image"))
    val rows = feats.collect()
    assert(rows.length == 2) // junk payload dropped
    val v = rows.find(_.getLong(0) == 1L).get.getSeq[Float](1)
    assert(v.length == 3 + 8) // channels + histogram bins
    // deterministic: same input → same features
    val again = Multimodal.imageFeatures(media.filter(_.kind == "image"))
      .collect().find(_.getLong(0) == 1L).get.getSeq[Float](1)
    assert(v == again)
  }
}
