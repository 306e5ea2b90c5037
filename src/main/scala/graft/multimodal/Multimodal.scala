package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline at 100 TB.
  *
  * Media ride as OPAQUE `binary` columns plus typed metadata — Spark never
  * interprets the bytes until an explicit decode stage. Decode / resize /
  * frame-sample / feature-extract run as `mapPartitions` over typed
  * Datasets (the Scala analog of `mapInPandas`: one iterator per partition,
  * no per-row lambda dispatch, no driver collect), so:
  *
  *   - partitioning and batch shape are real — each task streams its
  *     partition through the codec without materializing it;
  *   - the codec is a pluggable trait with REAL implementations in
  *     [[Codecs]]: hand-rolled BMP and PPM parsers, the JDK-builtin
  *     `javax.imageio` codec (PNG/JPEG/BMP/GIF), and a magic-byte
  *     [[Codecs.AutoCodec]] for mixed corpora. [[SyntheticCodec]] remains
  *     for deterministic volume tests of the plumbing itself;
  *   - downstream features are `Array[Float]` columns — the same shape the
  *     ANN operators (graft.operators.Similarity) consume.
  */
object Multimodal {

  /** One media object: opaque payload + the metadata a catalog would carry. */
  final case class MediaRow(
      mediaId: Long,
      kind: String, // "image" | "audio" | "video"
      data: Array[Byte],
      format: String)

  /** Decoded-image metadata. */
  final case class ImageMeta(
      mediaId: Long, width: Int, height: Int, channels: Int, ok: Boolean)

  /** Decoded image: row-major channel-interleaved pixels. */
  final case class Image(
      mediaId: Long, width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Per-frame sample from a video payload. */
  final case class Frame(mediaId: Long, frameIdx: Int, image: Image)

  /** Pluggable codec boundary. A production deployment implements this with
    * real decoders; the pipeline code is codec-agnostic.
    */
  trait ImageCodec extends Serializable {
    def decode(data: Array[Byte]): Option[Image]
    def encode(img: Image): Array[Byte]
  }

  /** Codec for the synthetic container format
    * `GFT0 | width:int32 | height:int32 | channels:int32 | pixels…` —
    * deterministic raw-pixel payloads for volume/partitioning tests.
    * Real formats (BMP, PPM, PNG/JPEG/GIF) live in [[Codecs]].
    */
  object SyntheticCodec extends ImageCodec {
    private val Magic = Array[Byte]('G', 'F', 'T', '0')

    def encode(img: Image): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + img.pixels.length)
      bb.put(Magic).putInt(img.width).putInt(img.height)
        .putInt(img.channels).put(img.pixels)
      bb.array()
    }

    def decode(data: Array[Byte]): Option[Image] = {
      if (data.length < 16 || !data.take(4).sameElements(Magic)) return None
      val bb = java.nio.ByteBuffer.wrap(data)
      bb.position(4)
      val (w, h, c) = (bb.getInt, bb.getInt, bb.getInt)
      val n = w * h * c
      if (w <= 0 || h <= 0 || c <= 0 || data.length < 16 + n) None
      else Some(Image(-1, w, h, c, data.slice(16, 16 + n)))
    }
  }

  /** Metadata extraction: one pass over the payload header per row, no
    * pixel materialization for invalid rows. Typed mapPartitions — the
    * iterator streams; nothing is collected.
    */
  def imageMeta(media: Dataset[MediaRow],
                codec: ImageCodec = SyntheticCodec): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      codec.decode(m.data) match {
        case Some(img) =>
          ImageMeta(m.mediaId, img.width, img.height, img.channels, ok = true)
        case None => ImageMeta(m.mediaId, 0, 0, 0, ok = false)
      }
    })
  }

  /** Nearest-neighbor resize: decode → resample → re-encode, streamed per
    * partition. Undecodable payloads are dropped (dead-letter them in a
    * real pipeline).
    */
  def resize(media: Dataset[MediaRow], outW: Int, outH: Int,
             codec: ImageCodec = SyntheticCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      codec.decode(m.data).map { img =>
        val out = new Array[Byte](outW * outH * img.channels)
        var y = 0
        while (y < outH) {
          val sy = y * img.height / outH
          var x = 0
          while (x < outW) {
            val sx = x * img.width / outW
            var ch = 0
            while (ch < img.channels) {
              out((y * outW + x) * img.channels + ch) =
                img.pixels((sy * img.width + sx) * img.channels + ch)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        m.copy(data = codec.encode(
          Image(m.mediaId, outW, outH, img.channels, out)))
      }
    })
  }

  /** Video frame sampling: a video payload is a sequence of encoded frames
    * (length-prefixed in the synthetic container); emit every `everyN`-th
    * frame as its own row — a flatMap, so one task fans out its own
    * partition without shuffling.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int,
                   codec: ImageCodec = SyntheticCodec): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      splitFrames(m.data).zipWithIndex.collect {
        case (bytes, i) if i % everyN == 0 =>
          codec.decode(bytes).map(img =>
            Frame(m.mediaId, i, img.copy(mediaId = m.mediaId)))
      }.flatten
    })
  }

  /** Synthetic video container: `int32 frameLen | frame bytes | …`. */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(frames.map(_.length + 4).sum)
    frames.foreach(f => bb.putInt(f.length).put(f))
    bb.array()
  }

  private def splitFrames(data: Array[Byte]): Seq[Array[Byte]] = {
    val bb = java.nio.ByteBuffer.wrap(data)
    val out = Seq.newBuilder[Array[Byte]]
    while (bb.remaining() > 4) {
      val len = bb.getInt
      if (len <= 0 || len > bb.remaining()) return out.result()
      val f = new Array[Byte](len)
      bb.get(f)
      out += f
    }
    out.result()
  }

  /** Exact integer image statistics: per-channel sums plus global pixel
    * min/max — the corpus-QA pass that flags blank, clipped, or constant
    * images before any float feature is computed. All-integer outputs make
    * this the oracle-gated face of the image modality: an independent SQL
    * engine can recompute every column exactly (no float32 luma rounding
    * to replicate), so encode → decode → stats is hash-checkable
    * end-to-end. Partition-streamed like every decode stage; undecodable
    * payloads drop (dead-letter them in a real pipeline).
    */
  def imageStats(media: Dataset[MediaRow],
                 codec: ImageCodec = SyntheticCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      codec.decode(m.data).map { img =>
        val sums = new Array[Long](img.channels)
        var mn = 255
        var mx = 0
        val px = img.pixels
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          sums(i % img.channels) += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        (m.mediaId, img.width, img.height, img.channels, sums.toSeq, mn, mx)
      }
    }).toDF("media_id", "width", "height", "channels", "ch_sums",
      "px_min", "px_max")
  }

  /** [[imageStats]] for sampled video frames: one exact-integer stats row
    * per (media, frame) — the same corpus-QA columns, keyed by frame
    * index, so black-frame runs and corrupt segments surface per frame.
    */
  def frameStats(frames: Dataset[Frame]): DataFrame = {
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map { f =>
      val img = f.image
      val sums = new Array[Long](img.channels)
      var mn = 255
      var mx = 0
      val px = img.pixels
      var i = 0
      while (i < px.length) {
        val v = px(i) & 0xff
        sums(i % img.channels) += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      (f.mediaId, f.frameIdx, img.width, img.height, img.channels,
        sums.toSeq, mn, mx)
    }).toDF("media_id", "frame_idx", "width", "height", "channels",
      "ch_sums", "px_min", "px_max")
  }

  /** Feature extraction: per-channel mean + a small luminance histogram as
    * `Array[Float]` — the embedding shape the ANN operators consume. Real
    * pipelines put a vision model here; the plumbing (partition-streamed
    * decode → fixed-width vector) is identical.
    */
  def imageFeatures(media: Dataset[MediaRow], histBins: Int = 8,
                    codec: ImageCodec = SyntheticCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      codec.decode(m.data).map { img =>
        val chMean = new Array[Float](img.channels)
        val hist = new Array[Float](histBins)
        val px = img.pixels
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          chMean(i % img.channels) += v
          hist(v * histBins / 256) += 1f
          i += 1
        }
        val nPix = (img.width * img.height).toFloat
        (m.mediaId,
          (chMean.map(_ / nPix) ++ hist.map(_ / px.length)).toSeq)
      }
    }).toDF("media_id", "features")
      .withColumn("features", col("features").cast("array<float>"))
  }
}
