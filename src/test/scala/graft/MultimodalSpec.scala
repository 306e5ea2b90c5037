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

  // --------------------------------------------------- perceptual hashing

  /** Smooth synthetic photo: two crossing gradients + a bright blob, so
    * the dHash gradient field is structured (a flat or pure-noise image
    * would hash degenerately).
    */
  private def scene(w: Int, h: Int, seed: Int = 0): Image = {
    val px = new Array[Byte](w * h * 3)
    // the seed must alter the HORIZONTAL structure (dHash encodes the
    // x-gradient sign field): flip gradient direction and move the blob
    val (bx, by) = if (seed % 2 == 0) (0.3, 0.4) else (0.7, 0.6)
    for (y <- 0 until h; x <- 0 until w) {
      val fx = x.toDouble / w
      val fy = y.toDouble / h
      val blob = 90 * math.exp(-((fx - bx) * (fx - bx) +
        (fy - by) * (fy - by)) * 14)
      val grad = if (seed % 2 == 0) 120 * fx else 120 * (1 - fx)
      val wave = if (seed % 2 == 0) math.sin(fy * 6) else math.sin(fx * 5)
      val base = 60 + grad + 50 * wave + blob
      val o = (y * w + x) * 3
      px(o) = math.min(255, math.max(0, base)).toInt.toByte
      px(o + 1) = math.min(255, math.max(0, base * 0.8)).toInt.toByte
      px(o + 2) = math.min(255, math.max(0, base * 0.6)).toInt.toByte
    }
    Image(-1, w, h, 3, px)
  }

  /** Deterministic pixel noise (xorshift over the index). */
  private def noised(img: Image, amp: Int): Image = {
    val px = img.pixels.clone()
    var i = 0
    while (i < px.length) {
      val r = (i * 2654435761L >>> 16).toInt % (2 * amp + 1) - amp
      px(i) = math.min(255, math.max(0, (px(i) & 0xff) + r)).toByte
      i += 1
    }
    img.copy(pixels = px)
  }

  test("perceptual hashes survive resize and noise, separate scenes") {
    import graft.multimodal.{Codecs, ImageHash}
    val base = scene(64, 48)
    val small = scene(32, 24) // same scene rendered at half resolution
    val noisy = noised(base, amp = 10)
    val other = scene(64, 48, seed = 3) // different scene
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (hash <- Seq(ImageHash.dHash64 _, ImageHash.aHash64 _)) {
      val (hb, hs, hn, ho) = (hash(base), hash(small), hash(noisy),
        hash(other))
      assert(ham(hb, hs) <= 6, s"resize moved the hash ${ham(hb, hs)} bits")
      assert(ham(hb, hn) <= 6, s"noise moved the hash ${ham(hb, hn)} bits")
      assert(ham(hb, ho) > 12, s"distinct scenes only ${ham(hb, ho)} apart")
    }
  }

  test("blocked Hamming join finds planted BMP near-duplicates") {
    import graft.multimodal.{Codecs, ImageHash}
    val rows = Seq(
      MediaRow(1, "image", Codecs.BmpCodec.encode(scene(64, 48)), "bmp"),
      MediaRow(2, "image", Codecs.BmpCodec.encode(scene(32, 24)), "bmp"),
      MediaRow(3, "image",
        Codecs.BmpCodec.encode(noised(scene(64, 48), 10)), "bmp"),
      MediaRow(4, "image", Codecs.BmpCodec.encode(scene(64, 48, 3)), "bmp"),
      MediaRow(5, "image", Array[Byte](9, 9, 9), "junk") // dropped
    ).toDS().repartition(3)
    val pairs = ImageHash.nearDuplicates(rows, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the planted near-dup cluster, got $pairs")
  }

  test("jointDedup: only pairs near-dup in BOTH modalities merge") {
    import graft.multimodal.{Codecs, ImageHash}
    // images: 1,2,3 same scene (near-dup cluster), 4 distinct scene.
    // captions: 1,2 share text; 3's caption is unrelated (image-near but
    // caption-far → must NOT merge); 4 shares 1's caption (caption-near
    // but image-far → must NOT merge either).
    val rows = Seq(
      MediaRow(1, "image", Codecs.BmpCodec.encode(scene(64, 48)), "bmp"),
      MediaRow(2, "image", Codecs.BmpCodec.encode(scene(32, 24)), "bmp"),
      MediaRow(3, "image",
        Codecs.BmpCodec.encode(noised(scene(64, 48), 10)), "bmp"),
      MediaRow(4, "image", Codecs.BmpCodec.encode(scene(64, 48, 3)), "bmp")
    ).toDS().repartition(2)
    val caps = Seq(
      (1L, "a shared caption about the same thing"),
      (2L, "a shared caption about the same thing"),
      (3L, "entirely unrelated words describing another subject matter"),
      (4L, "a shared caption about the same thing")).toDF("id", "caption")
    val out = ImageHash.jointDedup(rows, caps, "id", "caption",
        maxImageHamming = 6, maxTextHamming = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1L) == (1L, true))
    assert(out(2L) == (1L, false), s"1-2 (both-near) should merge: $out")
    assert(out(3L) == (3L, true), s"3 (caption-far) must survive: $out")
    assert(out(4L) == (4L, true), s"4 (image-far) must survive: $out")
  }

  test("jointDedup exact-hash-first scale route == direct form on a " +
    "planted corpus (exact dups, near dups, caption conjunction)") {
    import graft.multimodal.{Codecs, ImageHash}
    // planted: 1,2 exact-same image (same code); 3 near-dup of 1;
    // 4 distinct image sharing 1's caption; 5 image-near but
    // caption-far; 6 exact image dup of 1 with caption-far (exact-code
    // collapse must NOT merge it — the conjunction still gates)
    val rows = Seq(
      MediaRow(1, "image", Codecs.BmpCodec.encode(scene(64, 48)), "bmp"),
      MediaRow(2, "image", Codecs.BmpCodec.encode(scene(64, 48)), "bmp"),
      MediaRow(3, "image",
        Codecs.BmpCodec.encode(noised(scene(64, 48), 10)), "bmp"),
      MediaRow(4, "image", Codecs.BmpCodec.encode(scene(64, 48, 3)), "bmp"),
      MediaRow(5, "image", Codecs.BmpCodec.encode(scene(32, 24)), "bmp"),
      MediaRow(6, "image", Codecs.BmpCodec.encode(scene(64, 48)), "bmp")
    ).toDS().repartition(3)
    val caps = Seq(
      (1L, "a shared caption about the same thing"),
      (2L, "a shared caption about the same thing"),
      (3L, "a shared caption about the same thing"),
      (4L, "a shared caption about the same thing"),
      (5L, "entirely unrelated words describing another subject matter"),
      (6L, "totally different sentence with novel vocabulary throughout")
    ).toDF("id", "caption")
    def run(exactFirst: Boolean) =
      ImageHash.jointDedup(rows, caps, "id", "caption",
          maxImageHamming = 6, maxTextHamming = 12,
          exactFirstMaxDistinctRatio = if (exactFirst) 2.0 else 0.0)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap
    val direct = run(exactFirst = false)
    val scaled = run(exactFirst = true)
    assert(direct == scaled,
      s"exact-first route diverged:\ndirect=$direct\nscaled=$scaled")
    // the semantics themselves: 1,2,3 merge (image+caption near);
    // 4 (image-far), 5 (caption-far), 6 (caption-far exact-image copy)
    // all survive
    assert(direct(1L) == (1L, true) && direct(2L) == (1L, false) &&
      direct(3L) == (1L, false), s"cluster wrong: $direct")
    assert(direct(4L)._2 && direct(5L)._2 && direct(6L)._2,
      s"conjunction failed to gate: $direct")
  }

  test("jointDedup refuses a non-integral caption id column (a lossy " +
    "cast would silently null every join key → kept=true everywhere)") {
    import graft.multimodal.{Codecs, ImageHash}
    val rows = Seq(
      MediaRow(1, "image", Codecs.BmpCodec.encode(scene(16, 12)), "bmp")
    ).toDS()
    val caps = Seq(("1", "caption")).toDF("id", "caption") // string id
    val e = intercept[IllegalArgumentException] {
      ImageHash.jointDedup(rows, caps, "id", "caption", 6, 12)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("image nearDuplicates refuses above routeThreshold, routing to " +
    "dedupCorpus") {
    import graft.multimodal.{Codecs, ImageHash}
    val rows = (1 to 4).map(i =>
      MediaRow(i.toLong, "image",
        Codecs.BmpCodec.encode(scene(16, 12, i)), "bmp")).toDS()
    // at the threshold: runs fine (same pairs as an unguarded call)
    ImageHash.nearDuplicates(rows, maxHamming = 6, routeThreshold = 4L)
      .count()
    // above it: loud refusal naming the corpus-rollup deployment form
    val ex = intercept[IllegalArgumentException] {
      ImageHash.nearDuplicates(rows, maxHamming = 6, routeThreshold = 3L)
    }
    assert(ex.getMessage.contains("dedupCorpus"), ex.getMessage)
    assert(ex.getMessage.contains("routeThreshold"), ex.getMessage)
  }

  test("imageStats reports exact integer channel sums and pixel extremes") {
    import graft.multimodal.Codecs
    // 2×1 RGB: (10,20,30), (250,0,128) — hand-checkable sums/extremes
    val img = Multimodal.Image(7L, 2, 1, 3,
      Array[Byte](10, 20, 30, 250.toByte, 0, 128.toByte))
    val rows = Seq(
      MediaRow(7, "image", Codecs.BmpCodec.encode(img), "bmp"),
      MediaRow(8, "image", Array[Byte](1, 2, 3), "junk") // dropped
    ).toDS()
    val got = Multimodal.imageStats(rows, Codecs.AutoCodec).collect()
    assert(got.length == 1, "undecodable payload must drop")
    val r = got.head
    assert((r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)) ==
      ((7L, 2, 1, 3)))
    assert(r.getSeq[Long](4) == Seq(260L, 20L, 158L))
    assert((r.getInt(5), r.getInt(6)) == ((0, 250)))
  }

  test("dHash recovers a target 60-bit fingerprint from a staircase BMP") {
    import graft.multimodal.{Codecs, ImageHash}
    // the q109 oracle model: a 9×8 r=g=b staircase whose horizontal
    // gradient signs encode fp bit (y·8+x); encode→decode→dHash must be
    // the identity on the fingerprint (bits 60-63 read 0)
    def staircase(id: Long, fp: Long): Image = {
      val w = 9; val h = 8
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var v = 128
        var x = 0
        while (x <= 8) {
          if (x > 0) {
            val bit = y * 8 + (x - 1)
            v += (if (bit < 60 && ((fp >> bit) & 1L) == 1L) 1 else -1)
          }
          val o = (y * w + x) * 3
          px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
          x += 1
        }
        y += 1
      }
      Image(id, w, h, 3, px)
    }
    val fps = Seq(0L, (1L << 60) - 1, 0x0123456789abcdeL, 0xfedcba987654321L)
    fps.foreach { fp =>
      val bytes = Codecs.BmpCodec.encode(staircase(fp, fp))
      val decoded = Codecs.BmpCodec.decode(bytes).get
      assert(ImageHash.dHash64(decoded) == fp,
        s"fp ${fp.toHexString} did not round-trip")
    }
    // and the blocked Hamming join over staircase media equals all-pairs
    val rows = (0L until 16L).map { d =>
      val base = 0x5a5a5a5a5a5a5aL ^ (d / 4) * 0x111111111111111L
      val fp = (base ^ (if (d % 4 > 0) 7L << (d % 4 * 3) else 0L)) &
        ((1L << 60) - 1)
      MediaRow(d, "image", Codecs.BmpCodec.encode(staircase(d, fp)), "bmp")
    }.toDS()
    val blocked = ImageHash.nearDuplicates(rows, maxHamming = 8)
      .orderBy("id_a", "id_b").collect().toSeq
    val allPairs = graft.operators.Dedup.simHashPairs(
        ImageHash.fingerprints(rows).withColumnRenamed("media_id", "id"),
        "id", "fp", maxHamming = 8, fp = identity)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(blocked == allPairs && blocked.nonEmpty)
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

  // ---- VideoHash: temporal near-dup --------------------------------

  /** 9×8 grayscale staircase whose dHash IS `fp` (the q109 bit model). */
  private def stairFrame(id: Long, fp: Long): Array[Byte] = {
    val w = 9; val h = 8
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var v = 128
      var x = 0
      while (x <= 8) {
        if (x > 0) {
          val bit = y * 8 + (x - 1)
          v += (if (bit < 60 && ((fp >> bit) & 1L) == 1L) 1 else -1)
        }
        val o = (y * w + x) * 3
        px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
        x += 1
      }
      y += 1
    }
    graft.multimodal.Codecs.BmpCodec.encode(Image(id, w, h, 3, px))
  }

  private def video(id: Long, frameFps: Seq[Long]): MediaRow =
    MediaRow(id, "video",
      Multimodal.packFrames(frameFps.map(stairFrame(id, _))), "gftv")

  test("VideoHash: majority signature, blocked candidates, alignment " +
    "verify separates static dups from timeline-scrambled twins") {
    import graft.multimodal.VideoHash
    val base = 0x0123456789ABCDL // 56-bit fp, bits 60+ clear
    val near = base ^ 0x7L // 3 bits away
    // v1/v2: identical static footage → signature dist 0, all aligned.
    // v3: same MAJORITY signature as v1 (each window bit flipped in
    //     only 1 of 4 frames) but every frame ≥ 12 bits from v1's →
    //     signature candidate, killed by alignment.
    // v4: near-identical static footage (3 bits) → kept.
    val masks = Seq(0xFFFL, 0xFFF000L, 0xFFF000000L, 0xFFF000000000L)
    val vids = Seq(
      video(1, Seq.fill(4)(base)),
      video(2, Seq.fill(4)(base)),
      video(3, masks.map(base ^ _)),
      video(4, Seq.fill(4)(near))).toDS()
    val sig = VideoHash.temporalSignature(
      VideoHash.frameFingerprints(vids, everyN = 1,
        codec = graft.multimodal.Codecs.BmpCodec))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    assert(sig(1L) == (base, 4) && sig(3L) == (base, 4) &&
      sig(4L) == (near, 4), s"signatures wrong: $sig")
    val pairs = VideoHash.nearDuplicates(vids, maxHamming = 8,
        everyN = 1, frameRadius = 8, minAlignedFrac = 0.5,
        codec = graft.multimodal.Codecs.BmpCodec)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"verified pairs wrong: $pairs — member 3 must die in alignment")
  }

  test("VideoHash: maxShift trim tolerance — a one-frame-trimmed copy " +
    "fails zero-offset verify but aligns at the shifted offset") {
    import graft.multimodal.VideoHash
    val base = 0x0123456789ABCDL
    val masks = Seq(0xFFFL, 0xFFF000L, 0xFFF000000L, 0xFFF000000000L)
    // v2 = v1 with the first frame trimmed (timeline rotated): same
    // majority signature (each window bit set in 1 of 4 frames), but
    // every zero-offset position is 24 bits apart
    val vids = Seq(
      video(1, masks.map(base ^ _)),
      video(2, (masks.tail :+ masks.head).map(base ^ _))).toDS()
    def run(shift: Int) = VideoHash.nearDuplicates(vids, maxHamming = 8,
      everyN = 1, frameRadius = 8, minAlignedFrac = 0.5,
      codec = graft.multimodal.Codecs.BmpCodec, maxShift = shift)
    assert(run(0).collect().isEmpty,
      "zero-offset verify must reject the trimmed copy")
    val out = run(1).collect()
    assert(out.length == 1, s"expected one shifted pair: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getLong(3) == 3L && r.getLong(4) == 3L &&
      r.getInt(5) == -1,
      s"shifted alignment wrong: $r (want n_aligned=3/3 at shift -1)")
  }

  test("VideoHash: maxShift best-offset ranks by aligned COUNT first — " +
    "a 1-frame-overlap frac-1.0 extreme offset must not beat a genuine " +
    "3/4 full-overlap alignment") {
    import graft.multimodal.VideoHash
    // four mutually-distant frames (16+ bits apart): at offset 0 three
    // positions align within 1 bit; every intermediate offset aligns
    // NOTHING; offset +3's single overlapping position (v1 rk1 ↔ v2 rk4)
    // is 2 bits apart → frac 1.0 on n_pos=1. Ranking by frac alone picks
    // the degenerate offset; aligned-count-first picks offset 0.
    val (a, b, c, d) = (0L, 0xFFFFL, 0xFFFF0000L, 0xFFFF00000000L)
    val vids = Seq(
      video(1, Seq(a, b, c, d)),
      video(2, Seq(a ^ 1L, b ^ 1L, c ^ 1L, a ^ 2L))).toDS()
    val out = VideoHash.nearDuplicates(vids, maxHamming = 8, everyN = 1,
        frameRadius = 8, minAlignedFrac = 0.5,
        codec = graft.multimodal.Codecs.BmpCodec, maxShift = 3)
      .collect()
    assert(out.length == 1, s"expected one pair: ${out.toSeq}")
    val r = out.head
    assert(r.getLong(3) == 3L && r.getLong(4) == 4L && r.getInt(5) == 0,
      s"best offset wrong: $r (want n_aligned=3, n_pos=4, best_shift=0)")
  }

  test("VideoHash: route guard refuses above threshold, names the " +
    "corpus alternative; dedupCorpus collapses signature clusters") {
    import graft.multimodal.VideoHash
    val base = 0x00FFAA5500FF55L
    val vids = (1L to 6L).map(i =>
      video(i, Seq.fill(3)(if (i <= 3) base else base ^ (0xFFL << 20))))
      .toDS()
    val e = intercept[IllegalArgumentException] {
      VideoHash.nearDuplicates(vids, maxHamming = 4, everyN = 1,
        codec = graft.multimodal.Codecs.BmpCodec, routeThreshold = 2L)
    }
    assert(e.getMessage.contains("dedupCorpus"),
      "route guard must name the scale-safe alternative")
    val cc = VideoHash.dedupCorpus(vids, maxHamming = 4, everyN = 1,
        codec = graft.multimodal.Codecs.BmpCodec)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 3L).forall(cc(_) == 1L) && (4L to 6L).forall(cc(_) == 4L),
      s"corpus components wrong: $cc")
  }
}
