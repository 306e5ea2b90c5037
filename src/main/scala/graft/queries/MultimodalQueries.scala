package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.{Audio, Codecs, ImageHash, Multimodal}
import graft.multimodal.Multimodal.{Image, MediaRow}

/** Oracle-gated multimodal queries.
  *
  * The driver tables carry no binary columns, so the image payloads are
  * GENERATED deterministically from `doc_id` by a closed-form pixel model,
  * then round-tripped through the real Windows BMP codec
  * (graft.multimodal.Codecs.BmpCodec — hand-rolled BITMAPINFOHEADER
  * writer/parser) via magic-byte dispatch. The DuckDB oracle never touches
  * bytes: it recomputes the expected statistics straight from the pixel
  * model, so a hash match proves encode → container bytes → decode →
  * feature-extract is exact, stride padding and BGR row order included.
  *
  * Every emitted column is integer-exact (sums/min/max, not float means),
  * which is what makes an independent SQL replica possible — see
  * Multimodal.imageStats.
  */
object MultimodalQueries {

  /** Pixel model: w = 4 + d%5 (exercises all four BMP stride paddings:
    * w=5,6,7 pad rows to 16/20/24 bytes, w=4,8 need none), h = 4 + (d%3)*2,
    * channel values are independent mod-256 linear forms of (d, x, y).
    */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      val w = (4 + d % 5).toInt
      val h = (4 + (d % 3) * 2).toInt
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          px(o) = ((d * 31 + x * 7 + y * 13) % 256).toByte
          px(o + 1) = ((d * 17 + x * 11 + y * 5) % 256).toByte
          px(o + 2) = ((d * 29 + x * 3 + y * 19) % 256).toByte
          x += 1
        }
        y += 1
      }
      MediaRow(d, "image", Codecs.BmpCodec.encode(Image(d, w, h, 3, px)),
        "bmp")
    })
    Multimodal.imageStats(media, Codecs.AutoCodec)
      .select(col("media_id").as("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        element_at(col("ch_sums"), 1).as("r_sum"),
        element_at(col("ch_sums"), 2).as("g_sum"),
        element_at(col("ch_sums"), 3).as("b_sum"),
        col("px_min").cast("long").as("px_min"),
        col("px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"))
  }

  private val q106Sql =
    """WITH dims AS (
      |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
      |         CAST(4 + (doc_id % 3) * 2 AS BIGINT) AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    (doc_id*31 + x*7 + y*13) % 256 AS r,
      |    (doc_id*17 + x*11 + y*5) % 256 AS g,
      |    (doc_id*29 + x*3 + y*19) % 256 AS b
      |  FROM dims, LATERAL (SELECT unnest(generate_series(0, w-1)) AS x),
      |             LATERAL (SELECT unnest(generate_series(0, h-1)) AS y))
      |SELECT doc_id, MAX(w) AS width, MAX(h) AS height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(SUM(r) AS BIGINT) AS r_sum, CAST(SUM(g) AS BIGINT) AS g_sum,
      |  CAST(SUM(b) AS BIGINT) AS b_sum,
      |  CAST(LEAST(MIN(r), MIN(g), MIN(b)) AS BIGINT) AS px_min,
      |  CAST(GREATEST(MAX(r), MAX(g), MAX(b)) AS BIGINT) AS px_max
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Audio analog of q106: per doc_id, a hand-assembled RIFF/WAVE payload
    * (PCM 16-bit; rate/channels/length vary with doc_id; a LIST chunk
    * precedes `data` so the decoder's chunk walk is exercised, odd-length
    * pad byte included) whose int16 samples follow a closed form. The
    * real WavCodec decodes to normalized float32 — an EXACT power-of-two
    * scale — and Audio.audioStats reconstructs the integers via Q15, so
    * the DuckDB oracle recomputes every column from the sample model
    * without touching bytes.
    */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      val rate = (8000 + (d % 3) * 4000).toInt
      val channels = (1 + d % 2).toInt
      val n = ((50 + d % 20) * channels).toInt
      val le = java.nio.ByteOrder.LITTLE_ENDIAN
      // RIFF | LIST(5, padded to 6) | fmt(16) | data(2n)
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + 6 + 24 + 8 + n * 2)
        .order(le)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 14 + 24 + 8 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put("LIST".getBytes("US-ASCII")).putInt(5)
        .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // odd len + pad
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort)
        .putInt(rate).putInt(rate * channels * 2)
        .putShort((channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
      var i = 0
      while (i < n) {
        bb.putShort((((d * 131 + i * 7919) % 65536) - 32768).toShort)
        i += 1
      }
      Multimodal.MediaRow(d, "audio", bb.array(), "wav")
    })
    graft.multimodal.Audio.audioStats(media)
      .select(col("media_id").as("doc_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("channels").cast("long").as("channels"),
        col("n_samples"), col("sum_q15"), col("min_q15"), col("max_q15"))
      .orderBy(col("doc_id"))
  }

  private val q107Sql =
    """WITH dims AS (
      |  SELECT doc_id, CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS rate,
      |         CAST(1 + doc_id % 2 AS BIGINT) AS ch,
      |         CAST((50 + doc_id % 20) * (1 + doc_id % 2) AS BIGINT) AS n
      |  FROM documents),
      |smp AS (
      |  SELECT doc_id, rate, ch, n,
      |    (doc_id*131 + i*7919) % 65536 - 32768 AS s
      |  FROM dims, LATERAL (SELECT unnest(generate_series(0, n-1)) AS i))
      |SELECT doc_id, MAX(rate) AS sample_rate, MAX(ch) AS channels,
      |  MAX(n) AS n_samples,
      |  CAST(SUM(s) AS BIGINT) AS sum_q15,
      |  CAST(MIN(s) AS BIGINT) AS min_q15,
      |  CAST(MAX(s) AS BIGINT) AS max_q15
      |FROM smp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Video analog: per doc_id, a synthetic length-prefixed container of
    * 2 + d%3 BMP frames (6×4 — stride pads 18→20 bytes), sampled every
    * 2nd frame by `Multimodal.sampleFrames`, each decoded frame reduced
    * to exact integer stats by `Multimodal.frameStats`. The frame pixel
    * model folds the frame index into the q106 linear forms, so the
    * DuckDB oracle enumerates (doc, sampled frame) pairs and recomputes
    * everything closed-form.
    */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      val k = (2 + d % 3).toInt
      val frames = (0 until k).map { f =>
        val w = 6
        val h = 4
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = (y * w + x) * 3
            px(o) = ((d * 31 + f * 41 + x * 7 + y * 13) % 256).toByte
            px(o + 1) = ((d * 17 + f * 53 + x * 11 + y * 5) % 256).toByte
            px(o + 2) = ((d * 29 + f * 67 + x * 3 + y * 19) % 256).toByte
            x += 1
          }
          y += 1
        }
        Codecs.BmpCodec.encode(Image(d, w, h, 3, px))
      }
      MediaRow(d, "video", Multimodal.packFrames(frames), "gftv")
    })
    val sampled = Multimodal.sampleFrames(media, everyN = 2,
      codec = Codecs.BmpCodec)
    Multimodal.frameStats(sampled)
      .select(col("media_id").as("doc_id"), col("frame_idx").cast("long"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        element_at(col("ch_sums"), 1).as("r_sum"),
        element_at(col("ch_sums"), 2).as("g_sum"),
        element_at(col("ch_sums"), 3).as("b_sum"),
        col("px_min").cast("long").as("px_min"),
        col("px_max").cast("long").as("px_max"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private val q108Sql =
    """WITH dims AS (
      |  SELECT doc_id, CAST(2 + doc_id % 3 AS BIGINT) AS k FROM documents),
      |frames AS (
      |  SELECT doc_id, f FROM dims,
      |    LATERAL (SELECT unnest(generate_series(0, k-1)) AS f)
      |  WHERE f % 2 = 0),
      |px AS (
      |  SELECT doc_id, f,
      |    (doc_id*31 + f*41 + x*7 + y*13) % 256 AS r,
      |    (doc_id*17 + f*53 + x*11 + y*5) % 256 AS g,
      |    (doc_id*29 + f*67 + x*3 + y*19) % 256 AS b
      |  FROM frames, LATERAL (SELECT unnest(generate_series(0, 5)) AS x),
      |               LATERAL (SELECT unnest(generate_series(0, 3)) AS y))
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(6 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
      |  CAST(SUM(r) AS BIGINT) AS r_sum, CAST(SUM(g) AS BIGINT) AS g_sum,
      |  CAST(SUM(b) AS BIGINT) AS b_sum,
      |  CAST(LEAST(MIN(r), MIN(g), MIN(b)) AS BIGINT) AS px_min,
      |  CAST(GREATEST(MAX(r), MAX(g), MAX(b)) AS BIGINT) AS px_max
      |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin

  /** Perceptual image dedup (ImageHash.dHash64 + blocked Hamming join),
    * oracle-gated by constructing images whose dHash is KNOWN closed-form.
    *
    * Pixel model: each doc renders a 9×8 grayscale-in-RGB staircase
    * (r=g=b, values in 128±8) whose horizontal gradient signs ARE a target
    * 60-bit fingerprint — dHash's 9×8 box-average grid is the identity on
    * a 9×8 source, so decode → grayGrid → gradient signs reproduces the
    * fingerprint bit-for-bit (bits 60-63 always 0; adjacent luma always
    * differs by exactly ±1, so float BT.601 luma of equal channels can
    * never flip a comparison). The fingerprint is md5(doc_id/4) — the
    * oracle's `CAST(concat('0x', substr(md5(g),1,15)) AS BIGINT)` twin —
    * XOR a 4-bit member perturbation, giving each 4-doc group Hamming
    * distances 4 (member 0 ↔ m) and 8 (m₁ ↔ m₂) while cross-group
    * distances are cryptographically ~Binomial(60, ½) (P[≤8] ≈ 4e-10 per
    * pair — no spurious pairs at any test scale). DuckDB recomputes every
    * pair from the bit model without touching pixels: a hash match proves
    * encode → BMP bytes → decode → box-average → dHash → pigeonhole-
    * blocked Hamming join end-to-end.
    */
  /** Shared 60-bit closed-form fingerprint: md5(doc_id/4) bits XOR a
    * 4-bit member mask (flip {i₀, i₀+15, i₀+30, i₀+45}, i₀ = 5m−4).
    * Each 4-doc group then has Hamming distances 4 (member 0 ↔ m) and 8
    * (m₁ ↔ m₂); cross-group distances are cryptographically
    * ~Binomial(60, ½). q109 renders it as pixel gradients, q116 as
    * audio energy steps — one oracle bit model gates both modalities.
    */
  private def fpOf(group: Long, member: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(group.toString.getBytes("UTF-8"))
    val hex = md.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15)
    var fp = java.lang.Long.parseLong(hex, 16) // 60 bits
    if (member >= 1) {
      var i = 5 * member - 4
      while (i < 60) { fp ^= 1L << i; i += 15 }
    }
    fp
  }

  private def groupFp(d: Long): Long = fpOf(d / 4, (d % 4).toInt)

  /** Render a fingerprint as q109's 9×8 grayscale staircase BMP (dHash
    * of the image reproduces `fp` bit-for-bit — see q109's scaladoc).
    */
  private def staircaseBmp(d: Long, fp: Long): Array[Byte] = {
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
    Codecs.BmpCodec.encode(Image(d, w, h, 3, px))
  }

  private def q109(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      MediaRow(d, "image", staircaseBmp(d, groupFp(d)), "bmp")
    })
    ImageHash.nearDuplicates(media, maxHamming = 8)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // flip mask per member m ≥ 1: (1<<i₀)·(1 + 2¹⁵ + 2³⁰ + 2⁴⁵), i₀ = 5m−4
  private val q109Sql =
    """WITH f AS (
      |  SELECT doc_id,
      |    xor(CAST(concat('0x',
      |          substr(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 15)) AS BIGINT),
      |        CASE WHEN doc_id % 4 = 0 THEN 0
      |             ELSE 35185445863425 *
      |                  (CAST(1 AS BIGINT) <<
      |                   CAST(5 * (doc_id % 4) - 4 AS INTEGER)) END) AS fp
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
      |FROM f a JOIN f b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.fp, b.fp)) <= 8
      |ORDER BY id_a, id_b""".stripMargin

  /** Perceptual audio dedup (Audio.envelopeHash64 + blocked Hamming
    * join), oracle-gated by constructing WAV clips whose 64-bit envelope
    * hash is KNOWN closed-form — the audio twin of q109.
    *
    * Sample model: 65 energy cells × 40 samples, each cell holding a
    * constant Q15 amplitude v_c/32768 from the same ±1 staircase walk as
    * q109's pixels (v_0 = 128; fingerprint bit b decides
    * v_{b+1} − v_b = ±1, bits ≥ 60 are 0). The cell count divides the
    * sample count so cell assignment is exact; the 16-bit PCM
    * encode→decode round-trip is the identity for these amplitudes
    * (round(q/32768·32767) = q for q ≤ 192); each cell's mean-square
    * energy is exactly (v_c/2^15)² (40 identical q²/2^30 terms sum
    * exactly in double), and v_c > 0 makes energy strictly monotone in
    * v_c — so envelopeHash64's bit b = [e_{b+1} > e_b] reproduces the
    * fingerprint bit-for-bit. The DuckDB twin recomputes every pair from
    * the bit model alone: a hash match proves encode → WAV container →
    * decode → envelope energies → pigeonhole-blocked Hamming join
    * end-to-end without the oracle ever touching audio bytes.
    */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      val fp = groupFp(d)
      val k = 40
      val samples = new Array[Float](65 * k)
      var v = 128
      var c = 0
      while (c < 65) {
        if (c > 0)
          v += (if (c - 1 < 60 && ((fp >> (c - 1)) & 1L) == 1L) 1 else -1)
        var j = 0
        while (j < k) { samples(c * k + j) = v / 32768f; j += 1 }
        c += 1
      }
      MediaRow(d, "audio",
        Audio.WavCodec.encode(Audio.AudioClip(d, 8000, 1, samples)), "wav")
    })
    Audio.nearDuplicates(media, maxHamming = 8)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // q116's oracle IS q109's: both render the same closed-form bit model,
  // so the same SQL gates both (the modality difference lives entirely on
  // the Spark side: pixels vs PCM energies).
  private val q116Sql = q109Sql

  /** Corpus-scale perceptual dedup (`ImageHash.dedupCorpus` =
    * exact-code grouping → blocked Hamming join over DISTINCT codes →
    * connected components), oracle-gated closed-form.
    *
    * Construction: 8 docs per group, codes shared PAIRWISE — doc d
    * renders fpOf(d/8, (d%8)/2), so each of the 4 member codes belongs
    * to exactly two docs (the exact-dup mass the distinct-code rollup
    * collapses), and the 4 codes are pairwise within Hamming 8 (member
    * distances 4 and 8) — every group is one complete duplicate cluster,
    * while cross-group distances are cryptographically ~Binomial(60, ½).
    * The canonical assignment is therefore closed-form:
    * min(doc_id) per doc_id/8 group — which the oracle states directly
    * with a window MIN, plus the fingerprint itself from the shared bit
    * model. A hash match proves decode → dHash → code rollup → blocked
    * join over distinct codes → label propagation → per-doc mapping.
    */
  private def q117(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      MediaRow(d, "image",
        staircaseBmp(d, fpOf(d / 8, ((d % 8) / 2).toInt)), "bmp")
    })
    ImageHash.dedupCorpus(media, maxHamming = 8)
      .select(col("media_id").as("doc_id"), col("fp"),
        col("canonical_id"), col("kept"))
      .orderBy(col("doc_id"))
  }

  private val q117Sql =
    """WITH f AS (
      |  SELECT doc_id,
      |    xor(CAST(concat('0x',
      |          substr(md5(CAST(doc_id // 8 AS VARCHAR)), 1, 15)) AS BIGINT),
      |        CASE WHEN (doc_id % 8) // 2 = 0 THEN 0
      |             ELSE 35185445863425 *
      |                  (CAST(1 AS BIGINT) <<
      |                   CAST(5 * ((doc_id % 8) // 2) - 4 AS INTEGER)) END)
      |      AS fp
      |  FROM documents)
      |SELECT doc_id, fp,
      |  MIN(doc_id) OVER (PARTITION BY doc_id // 8) AS canonical_id,
      |  doc_id = MIN(doc_id) OVER (PARTITION BY doc_id // 8) AS kept
      |FROM f ORDER BY doc_id""".stripMargin

  /** Joint image+caption dedup (`ImageHash.jointDedup`): an edge needs
    * BOTH the image dHash (≤ 8 bits, the q109 bit model) AND the caption
    * SimHash (≤ 12 of 60 md5 bits, the q27 fingerprint) to agree.
    *
    * Construction: images reuse q109's 4-doc groups (all 6 within-group
    * pairs are image-near at Hamming 4/8); captions are the GROUP BASE
    * doc's text, verbatim for members 0–1 and with one appended marker
    * token for members 2–3 — so (0,1) are caption-exact (SimHash 0,
    * always a joint edge), while pairs involving 2/3 have a
    * data-dependent caption distance the oracle recomputes exactly from
    * the same token votes. Cross-group pairs fail the image filter
    * (~Binomial(60,½) distances), one-token caption noise fails or
    * passes per the votes — the conjunction is exercised in both
    * directions. Capped at 2000 docs for oracle tractability (the
    * DuckDB twin joins all pairs; Spark runs the blocked joins).
    */
  private val JointCapId = 2000L

  /** The q136 fixture (shared with the Soak's uncapped `s136` row):
    * q109 bit-model staircase images + group-base-derived captions. */
  /** `exactDup` > 1 gives every run of that many consecutive doc ids
    * the SAME image code (the base id's groupFp) — the exact-dup-heavy
    * corpus shape of a real crawl, used by the s136_exactdup soak rows
    * to measure jointDedup's adaptive exact-first route; the default 1
    * keeps the original one-unique-code-per-doc model. */
  private[graft] def jointFixture(s: SparkSession, dir: String,
      cap: Option[Long], exactDup: Int = 1)
      : (org.apache.spark.sql.Dataset[MediaRow], DataFrame) = {
    import s.implicits._
    val docs = cap.foldLeft(Tables.documents(s, dir))(
      (d, c) => d.filter(col("doc_id") < c))
    val media = docs.select(col("doc_id")).as[Long].mapPartitions(_.map {
      d => MediaRow(d, "image", staircaseBmp(d, groupFp(d / exactDup)),
        "bmp")
    })
    val captions = docs.select(col("doc_id"),
        expr("(doc_id div 4) * 4").as("bid"))
      .join(docs.select(col("doc_id").as("bid"), col("text").as("btext")),
        Seq("bid"))
      .select(col("doc_id"),
        when(col("doc_id") % 4 >= 2,
            concat(col("btext"), lit(" xtra"),
              (col("doc_id") % 4).cast("string")))
          .otherwise(col("btext")).as("caption"))
    (media, captions)
  }

  private def q136(s: SparkSession, dir: String): DataFrame = {
    val (media, captions) = jointFixture(s, dir, Some(JointCapId))
    ImageHash.jointDedup(media, captions, "doc_id", "caption",
        maxImageHamming = 8, maxTextHamming = 12)
      .select(col("id").as("doc_id"), col("canonical_id"), col("kept"))
      .orderBy(col("doc_id"))
  }

  private val q136Sql =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < $JointCapId),
       |f AS (
       |  SELECT doc_id,
       |    xor(CAST(concat('0x',
       |          substr(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 15)) AS BIGINT),
       |        CASE WHEN doc_id % 4 = 0 THEN 0
       |             ELSE 35185445863425 *
       |                  (CAST(1 AS BIGINT) <<
       |                   CAST(5 * (doc_id % 4) - 4 AS INTEGER)) END) AS fp
       |  FROM d),
       |caps AS (
       |  SELECT a.doc_id,
       |    CASE WHEN a.doc_id % 4 >= 2
       |         THEN b.text || ' xtra' || CAST(a.doc_id % 4 AS VARCHAR)
       |         ELSE b.text END AS caption
       |  FROM d a JOIN d b ON b.doc_id = (a.doc_id // 4) * 4),
       |toks AS (
       |  SELECT doc_id,
       |    unnest(string_split_regex(trim(caption), '\\s+')) AS tok
       |  FROM caps),
       |h AS (SELECT doc_id,
       |        CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS th
       |      FROM toks),
       |bits AS (SELECT unnest(range(60)) AS b),
       |votes AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM h CROSS JOIN bits GROUP BY doc_id, b),
       |sfp AS (SELECT doc_id,
       |          CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
       |            ELSE 0 END) AS BIGINT) AS sfp
       |        FROM votes GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM f a JOIN f b ON a.doc_id < b.doc_id
       |  JOIN sfp sa ON sa.doc_id = a.doc_id
       |  JOIN sfp sb ON sb.doc_id = b.doc_id
       |  WHERE bit_count(xor(a.fp, b.fp)) <= 8
       |    AND bit_count(xor(sa.sfp, sb.sfp)) <= 12),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b, id_a FROM pairs),
       |-- seed from caps, not d: the Spark fixture's caption inner-join
       |-- drops docs whose group-base id is absent, and jointDedup seeds
       |-- its component ids from captions — the oracle must match that
       |-- membership under NON-contiguous doc_ids too
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM caps
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |labels AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id)
       |SELECT id AS doc_id, label AS canonical_id, id = label AS kept
       |FROM labels
       |ORDER BY doc_id""".stripMargin

  /** Temporally-verified video near-dup (`VideoHash.nearDuplicates`),
    * oracle-gated by the shared q109/q116 bit model extended with a
    * TEMPORAL twist.
    *
    * Construction: each doc packs a 12-frame video (sampled every 2nd →
    * 6 frames). Members 0–2 of each 4-doc group render their group
    * fingerprint on EVERY frame (static footage); member 3 renders
    * frame j as fp XOR a 12-bit window mask 4095 << 12·(j mod 5) — each
    * signature bit is flipped in at most 2 of the 6 frames, so the
    * per-bit MAJORITY signature still equals fp (the signature stage
    * sees exactly q109's group geometry: distances 4/8, all 6 pairs are
    * candidates), but member 3's per-POSITION frame distances to every
    * other member are ≥ 14 bits (12-bit mask minus ≤ 2·overlap with the
    * member-diff bits, hand-checked per window) — the alignment verify
    * kills every pair involving member 3 while keeping the static
    * pairs. The oracle recomputes signatures, per-position distances,
    * and the alignment fractions closed-form from the same masks: a
    * hash match proves frame packing → sampling → decode → dHash →
    * majority vote → blocked signature join → rank-aligned verify
    * end-to-end.
    */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
    val media = docs.mapPartitions(_.map { d =>
      val fpD = groupFp(d)
      val frames = (0 until 12).map { i =>
        val j = i / 2
        val f = if (d % 4 == 3) fpD ^ (4095L << (12 * (j % 5))) else fpD
        staircaseBmp(d, f)
      }
      MediaRow(d, "video", Multimodal.packFrames(frames), "gftv")
    })
    graft.multimodal.VideoHash.nearDuplicates(media, maxHamming = 8,
        everyN = 2, frameRadius = 8, minAlignedFrac = 0.5,
        codec = Codecs.BmpCodec)
      .select(col("id_a"), col("id_b"), col("hamming"),
        col("n_aligned"), col("n_pos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val q144Sql =
    """WITH f AS (
      |  SELECT doc_id,
      |    xor(CAST(concat('0x',
      |          substr(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 15)) AS BIGINT),
      |        CASE WHEN doc_id % 4 = 0 THEN 0
      |             ELSE 35185445863425 *
      |                  (CAST(1 AS BIGINT) <<
      |                   CAST(5 * (doc_id % 4) - 4 AS INTEGER)) END) AS fp
      |  FROM documents),
      |sigpairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming,
      |    a.fp AS fp_a, b.fp AS fp_b,
      |    a.doc_id % 4 AS m_a, b.doc_id % 4 AS m_b
      |  FROM f a JOIN f b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.fp, b.fp)) <= 8),
      |pos AS (
      |  SELECT p.*, j,
      |    CASE WHEN p.m_a = 3
      |         THEN CAST(4095 AS BIGINT) << CAST(12 * (j % 5) AS INTEGER)
      |         ELSE 0 END AS mask_a,
      |    CASE WHEN p.m_b = 3
      |         THEN CAST(4095 AS BIGINT) << CAST(12 * (j % 5) AS INTEGER)
      |         ELSE 0 END AS mask_b
      |  FROM sigpairs p, LATERAL (SELECT unnest(range(0, 6)) AS j)),
      |al AS (
      |  SELECT id_a, id_b, hamming,
      |    CAST(SUM(CASE WHEN bit_count(xor(xor(fp_a, mask_a),
      |        xor(fp_b, mask_b))) <= 8 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_aligned,
      |    CAST(COUNT(*) AS BIGINT) AS n_pos
      |  FROM pos GROUP BY id_a, id_b, hamming)
      |SELECT id_a, id_b, hamming, n_aligned, n_pos FROM al
      |WHERE CAST(n_aligned AS DOUBLE) >= 0.5 * n_pos
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q144_video_near_dup" -> (q144(_, _)),
    "q106_image_stats" -> (q106(_, _)),
    "q107_audio_stats" -> (q107(_, _)),
    "q108_video_frame_stats" -> (q108(_, _)),
    "q109_image_near_dup" -> (q109(_, _)),
    "q116_audio_near_dup" -> (q116(_, _)),
    "q117_image_dedup_corpus" -> (q117(_, _)),
    "q136_joint_image_text_dedup" -> (q136(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q144_video_near_dup" -> q144Sql,
    "q106_image_stats" -> q106Sql,
    "q107_audio_stats" -> q107Sql,
    "q108_video_frame_stats" -> q108Sql,
    "q109_image_near_dup" -> q109Sql,
    "q116_audio_near_dup" -> q116Sql,
    "q117_image_dedup_corpus" -> q117Sql,
    "q136_joint_image_text_dedup" -> q136Sql)
}
