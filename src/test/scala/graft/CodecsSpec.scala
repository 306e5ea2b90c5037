package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.multimodal.{Codecs, Multimodal}
import graft.multimodal.Codecs.{AutoCodec, BmpCodec, JdkImageCodec, PpmCodec}
import graft.multimodal.Multimodal.{Image, MediaRow}
import graft.operators.Similarity

/** Real-format codecs: the hand-rolled BMP parser is cross-validated in
  * BOTH directions against the JDK's independent ImageIO BMP plugin
  * (genuine foreign bytes, not our own format), PPM round-trips, PNG is
  * lossless, AutoCodec dispatches by magic — and a real-BMP corpus runs
  * the full decode → resize → features → ANN chain.
  */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic RGB test pattern. */
  private def pattern(w: Int, h: Int, seed: Int): Image =
    Image(seed, w, h, 3,
      Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 7) % 256).toByte))

  /** Render via AWT and encode with the JDK's own BMP writer —
    * independently produced bytes our parser must understand.
    */
  private def imageIoBmp(img: Image): Array[Byte] = {
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.height; x <- 0 until img.width) {
      val s = (y * img.width + x) * 3
      bi.setRGB(x, y, ((img.pixels(s) & 0xff) << 16)
        | ((img.pixels(s + 1) & 0xff) << 8) | (img.pixels(s + 2) & 0xff))
    }
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "bmp", out))
    out.toByteArray
  }

  test("BmpCodec decodes ImageIO-written BMP bytes pixel-exactly") {
    val img = pattern(7, 5, 3) // odd width → row padding exercised
    val foreign = imageIoBmp(img)
    val got = BmpCodec.decode(foreign).get
    assert((got.width, got.height, got.channels) == (7, 5, 3))
    assert(got.pixels.sameElements(img.pixels))
  }

  test("ImageIO reads BmpCodec-encoded bytes pixel-exactly") {
    val img = pattern(6, 4, 9)
    val ours = BmpCodec.encode(img)
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ours))
    assert(bi != null && bi.getWidth == 6 && bi.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 6) {
      val s = (y * 6 + x) * 3
      val expected = ((img.pixels(s) & 0xff) << 16) |
        ((img.pixels(s + 1) & 0xff) << 8) | (img.pixels(s + 2) & 0xff)
      assert((bi.getRGB(x, y) & 0xffffff) == expected, s"($x,$y)")
    }
  }

  test("BmpCodec rejects malformed payloads without throwing") {
    assert(BmpCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(BmpCodec.decode("BMgarbage".getBytes).isEmpty)
    val truncated = imageIoBmp(pattern(8, 8, 1)).take(60)
    assert(BmpCodec.decode(truncated).isEmpty)
  }

  test("PpmCodec: P6 round-trip, P5 grayscale, comment-tolerant header") {
    val img = pattern(5, 3, 4)
    val round = PpmCodec.decode(PpmCodec.encode(img)).get
    assert(round.pixels.sameElements(img.pixels))
    // P5 gray with a header comment
    val gray = "P5\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40)
    val g = PpmCodec.decode(gray).get
    assert((g.width, g.height, g.channels) == (2, 2, 1))
    assert(g.pixels.toSeq == Seq[Byte](10, 20, 30, 40))
  }

  test("JdkImageCodec: PNG encode is lossless, JPEG/PNG magic decode") {
    val img = pattern(9, 6, 5)
    val png = JdkImageCodec.encode(img)
    assert((png(1) & 0xff, png(2) & 0xff, png(3) & 0xff)
      == ('P'.toInt, 'N'.toInt, 'G'.toInt))
    val back = JdkImageCodec.decode(png).get
    assert(back.pixels.sameElements(img.pixels))
  }

  test("AutoCodec dispatches BMP/PPM/PNG/GFT0 by magic bytes") {
    val img = pattern(4, 4, 2)
    for (bytes <- Seq(BmpCodec.encode(img), PpmCodec.encode(img),
        JdkImageCodec.encode(img),
        Multimodal.SyntheticCodec.encode(img))) {
      val got = AutoCodec.decode(bytes).get
      assert((got.width, got.height) == (4, 4))
      assert(Codecs.BmpCodec.encode(got)
        .sameElements(Codecs.BmpCodec.encode(img.copy(mediaId = -1))))
    }
  }

  test("real-BMP corpus: decode → resize → features → ANN round-trip") {
    // corpus of genuine BMP payloads: 0 and 1 are near-duplicates (one
    // pixel differs), the rest are unrelated patterns
    val base = pattern(16, 16, 0)
    val twin = base.copy(pixels = {
      val p = base.pixels.clone(); p(0) = (p(0) ^ 0x01).toByte; p
    })
    val rows = Seq(
      MediaRow(0, "image", imageIoBmp(base), "bmp"),
      MediaRow(1, "image", BmpCodec.encode(twin), "bmp")) ++
      (2 to 6).map(i =>
        MediaRow(i, "image", imageIoBmp(pattern(16, 16, i * 100)), "bmp"))
    val media = rows.toDS().repartition(3)

    val small = Multimodal.resize(media, 8, 8, AutoCodec)
    assert(small.count() == 7) // every real BMP decoded
    val feats = Multimodal.imageFeatures(small, codec = AutoCodec)
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    val knn = Similarity.bruteForceKnn(feats, feats, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(knn(0L) == 1L) // nearest neighbor of each twin is the other
    assert(knn(1L) == 0L)
  }
}
