package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.MediaRow

/** Audio-modality plumbing: a REAL dependency-free WAV (RIFF/PCM) codec
  * plus the partition-streamed decode / segment / feature stages, mirror
  * of the image pipeline in [[Multimodal]].
  *
  * Samples decode to normalized Float [-1, 1] interleaved by channel —
  * the shape a feature extractor or an acoustic model consumes. All
  * stages are `mapPartitions` over typed Datasets: one iterator per
  * partition, no driver collect, malformed payloads become `None` (route
  * to dead-letter), never exceptions.
  */
object Audio {

  /** Decoded clip: interleaved normalized samples. */
  final case class AudioClip(
      mediaId: Long, sampleRate: Int, channels: Int,
      samples: Array[Float])

  final case class AudioMeta(
      mediaId: Long, sampleRate: Int, channels: Int, nFrames: Int,
      durationSec: Double, ok: Boolean)

  /** One fixed-length segment of a longer clip (audio analog of video
    * frame sampling).
    */
  final case class AudioSegment(
      mediaId: Long, segmentIdx: Int, clip: AudioClip)

  trait AudioCodec extends Serializable {
    def decode(data: Array[Byte]): Option[AudioClip]
    def encode(clip: AudioClip): Array[Byte]
  }

  /** RIFF/WAVE parser + writer. Decode walks the chunk list (skipping
    * LIST/fact/cue… correctly, including the odd-size pad byte), accepts
    * PCM (format 1) at 8/16/24/32 bits and IEEE float (format 3) at 32
    * bits, mono or multichannel. Encode writes canonical 44-byte-header
    * 16-bit PCM. MultimodalSpec cross-validates both directions against
    * the JDK's independent `javax.sound.sampled` WAV implementation.
    */
  object WavCodec extends AudioCodec {

    def decode(data: Array[Byte]): Option[AudioClip] = Try {
      if (data.length < 12) return None
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int) = new String(data, off, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None

      var fmtCode = -1
      var channels = 0
      var sampleRate = 0
      var bits = 0
      var dataOff = -1
      var dataLen = 0
      var off = 12
      while (off + 8 <= data.length) {
        val id = tag(off)
        val len = bb.getInt(off + 4)
        if (len < 0 || off + 8 + len > data.length) {
          // tolerate a truncated final data chunk (common in the wild)
          if (id == "data" && off + 8 < data.length) {
            dataOff = off + 8; dataLen = data.length - off - 8
          }
          off = data.length
        } else {
          id match {
            case "fmt " if len >= 16 =>
              fmtCode = bb.getShort(off + 8) & 0xffff
              channels = bb.getShort(off + 10) & 0xffff
              sampleRate = bb.getInt(off + 12)
              bits = bb.getShort(off + 22) & 0xffff
            case "data" =>
              dataOff = off + 8; dataLen = len
            case _ => () // LIST, fact, cue, bext… — skip
          }
          off += 8 + len + (len & 1) // chunks are word-aligned
        }
      }
      val pcmOk = fmtCode == 1 && Set(8, 16, 24, 32).contains(bits)
      val floatOk = fmtCode == 3 && bits == 32
      if ((!pcmOk && !floatOk) || channels <= 0 || sampleRate <= 0 ||
        dataOff < 0) return None
      val bytesPer = bits / 8
      val n = dataLen / bytesPer
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        val o = dataOff + i * bytesPer
        out(i) = (fmtCode, bits) match {
          case (1, 8) => ((data(o) & 0xff) - 128) / 128f // unsigned
          case (1, 16) => bb.getShort(o) / 32768f
          case (1, 24) =>
            val v = (data(o) & 0xff) | ((data(o + 1) & 0xff) << 8) |
              (data(o + 2) << 16) // sign from the top byte
            v / 8388608f
          case (1, 32) => (bb.getInt(o) / 2147483648.0).toFloat
          case (3, 32) => bb.getFloat(o)
          case _ => 0f
        }
        i += 1
      }
      Some(AudioClip(-1, sampleRate, channels, out))
    }.toOption.flatten

    /** Canonical 16-bit PCM WAV; samples clamp to [-1, 1]. */
    def encode(clip: AudioClip): Array[Byte] = {
      val n = clip.samples.length
      val bb = ByteBuffer.allocate(44 + n * 2).order(ByteOrder.LITTLE_ENDIAN)
      val byteRate = clip.sampleRate * clip.channels * 2
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(clip.channels.toShort)
        .putInt(clip.sampleRate).putInt(byteRate)
        .putShort((clip.channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(n * 2)
      var i = 0
      while (i < n) {
        val v = math.max(-1f, math.min(1f, clip.samples(i)))
        bb.putShort(math.round(v * 32767f).toShort)
        i += 1
      }
      bb.array()
    }
  }

  /** Header-level metadata per payload — the catalog pass. */
  def audioMeta(media: Dataset[MediaRow],
                codec: AudioCodec = WavCodec): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      codec.decode(m.data) match {
        case Some(c) =>
          val frames = c.samples.length / math.max(c.channels, 1)
          AudioMeta(m.mediaId, c.sampleRate, c.channels, frames,
            frames.toDouble / c.sampleRate, ok = true)
        case None => AudioMeta(m.mediaId, 0, 0, 0, 0.0, ok = false)
      }
    })
  }

  /** Linear-interpolation resample to `targetRate` (the audio "resize"),
    * first channel only beyond mono is preserved per channel. Re-encodes
    * through the codec so downstream stages see a normal payload.
    */
  def resample(media: Dataset[MediaRow], targetRate: Int,
               codec: AudioCodec = WavCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      // zero-frame clips (valid WAV, empty data chunk) would index
      // samples(-1) below — drop them, honoring the module contract that
      // degenerate payloads never become exceptions
      codec.decode(m.data).filter(_.samples.nonEmpty).map { c =>
        val inFrames = c.samples.length / c.channels
        val outFrames =
          math.max(1, (inFrames.toLong * targetRate / c.sampleRate).toInt)
        val out = new Array[Float](outFrames * c.channels)
        var f = 0
        while (f < outFrames) {
          val pos = f.toDouble * c.sampleRate / targetRate
          val i0 = math.min(pos.toInt, inFrames - 1)
          val i1 = math.min(i0 + 1, inFrames - 1)
          val frac = (pos - i0).toFloat
          var ch = 0
          while (ch < c.channels) {
            out(f * c.channels + ch) =
              c.samples(i0 * c.channels + ch) * (1 - frac) +
                c.samples(i1 * c.channels + ch) * frac
            ch += 1
          }
          f += 1
        }
        m.copy(data = codec.encode(
          AudioClip(m.mediaId, targetRate, c.channels, out)))
      }
    })
  }

  /** Splits clips into fixed-duration segments (flatMap fan-out, no
    * shuffle) — the unit a training pipeline embeds or transcribes.
    */
  def segment(media: Dataset[MediaRow], seconds: Double,
              codec: AudioCodec = WavCodec): Dataset[AudioSegment] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.flatMap { m =>
      codec.decode(m.data).toSeq.flatMap { c =>
        val segFrames = math.max(1, (seconds * c.sampleRate).toInt)
        val frames = c.samples.length / c.channels
        (0 until frames by segFrames).zipWithIndex.map {
          case (start, idx) =>
            val end = math.min(start + segFrames, frames)
            AudioSegment(m.mediaId, idx,
              AudioClip(m.mediaId, c.sampleRate, c.channels,
                c.samples.slice(start * c.channels, end * c.channels)))
        }
      }
    })
  }

  /** 64-bit perceptual envelope hash: the clip splits into 65 equal-time
    * cells, each reduced to its RMS loudness, and bit i is set iff cell
    * i+1 is louder than cell i — the audio analog of the image dHash
    * (gradient-sign field over a box-averaged grid). Invariant to sample
    * rate (cells are fractions of the clip, so resampling preserves them)
    * and overall gain (RMS ratios survive scaling); robust to mild noise
    * (box averaging). Channels fold together (loudness is summed across
    * interleaved samples per cell).
    */
  def envelopeHash64(clip: AudioClip): Long = {
    val cells = 65
    val acc = new Array[Double](cells)
    val cnt = new Array[Int](cells)
    val s = clip.samples
    var i = 0
    while (i < s.length) {
      val c = (i.toLong * cells / s.length).toInt.min(cells - 1)
      acc(c) += s(i).toDouble * s(i)
      cnt(c) += 1
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      val lo = if (cnt(b) > 0) acc(b) / cnt(b) else 0.0
      val hi = if (cnt(b + 1) > 0) acc(b + 1) / cnt(b + 1) else 0.0
      if (hi > lo) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** (media_id, fp) envelope fingerprints for every decodable clip with
    * at least one sample — partition-streamed like every decode stage.
    */
  def fingerprints(media: Dataset[MediaRow],
                   codec: AudioCodec = WavCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      codec.decode(m.data).filter(_.samples.nonEmpty)
        .map(c => (m.mediaId, envelopeHash64(c)))
    }).toDF("media_id", "fp")
  }

  /** Near-duplicate audio pairs within `maxHamming` envelope-hash bits —
    * the same pigeonhole-blocked Hamming join as text SimHash and image
    * dHash ([[graft.operators.Dedup.simHashPairsBlocked]] unchanged);
    * only 16-byte (id, fp) rows ever shuffle.
    *
    * ROUTE GUARD: above `routeThreshold` clips the call REFUSES and
    * points at [[dedupCorpus]] — same rationale and pattern as
    * [[graft.multimodal.ImageHash.nearDuplicates]] (the pair list is the
    * superlinear object; the corpus rollup is the deployment form).
    */
  def nearDuplicates(media: Dataset[MediaRow], maxHamming: Int,
                     codec: AudioCodec = WavCodec,
                     numBlocks: Int = -1,
                     routeThreshold: Long = 1L << 23): DataFrame = {
    val n = media.count()
    require(n <= routeThreshold,
      s"Audio.nearDuplicates: corpus has $n clips > " +
        s"routeThreshold=$routeThreshold. The Hamming PAIR LIST has an " +
        "N²-scale candidate floor (SCALE.md q109); at this scale use " +
        "Audio.dedupCorpus (exact-code collapse + distinct-code join — " +
        "the q117 deployment form), or raise routeThreshold explicitly " +
        "to accept the pair-join cost.")
    graft.operators.Dedup.simHashPairsBlocked(
      fingerprints(media, codec), "media_id", "fp", maxHamming,
      fp = identity, numBlocks = numBlocks)
  }

  /** Corpus-scale perceptual audio dedup: exact-code grouping, blocked
    * Hamming join over DISTINCT envelope hashes, connected components —
    * per-clip canonical assignment, never a pair list
    * ([[graft.operators.Dedup.hammingDedupCorpus]]).
    */
  def dedupCorpus(media: Dataset[MediaRow], maxHamming: Int,
                  codec: AudioCodec = WavCodec,
                  numBlocks: Int = -1): DataFrame =
    graft.operators.Dedup.hammingDedupCorpus(fingerprints(media, codec),
      "media_id", "fp", maxHamming, numBlocks)

  /** Exact integer audio statistics in Q15 — the corpus-QA pass that
    * flags clipped, silent, or DC-offset clips before any float feature.
    * `q15 = round(sample × 32768)`: for anything decoded from 16-bit PCM
    * this reconstructs the original int16 EXACTLY (the decoder's
    * `/ 32768f` is a power-of-two scale, lossless in float32), which
    * makes the whole encode → container bytes → decode → stats path
    * hash-checkable by an independent SQL engine — the audio analog of
    * `Multimodal.imageStats`. For float-format WAVs the same column is a
    * well-defined Q15 quantization. Partition-streamed; undecodable
    * payloads drop.
    */
  def audioStats(media: Dataset[MediaRow],
                 codec: AudioCodec = WavCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      codec.decode(m.data).map { c =>
        var sum = 0L
        var mn = Long.MaxValue
        var mx = Long.MinValue
        var i = 0
        while (i < c.samples.length) {
          val q = math.round(c.samples(i) * 32768f).toLong
          sum += q
          if (q < mn) mn = q
          if (q > mx) mx = q
          i += 1
        }
        if (c.samples.isEmpty) { mn = 0L; mx = 0L }
        (m.mediaId, c.sampleRate, c.channels, c.samples.length.toLong,
          sum, mn, mx)
      }
    }).toDF("media_id", "sample_rate", "channels", "n_samples",
      "sum_q15", "min_q15", "max_q15")
  }

  /** Fixed-width acoustic features per clip: overall RMS, zero-crossing
    * rate, and `bands` windowed RMS values — the `Array[Float]` shape the
    * ANN operators consume (a real pipeline puts an acoustic model here;
    * the plumbing is identical).
    */
  def audioFeatures(media: Dataset[MediaRow], bands: Int = 8,
                    codec: AudioCodec = WavCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      codec.decode(m.data).map { c =>
        val s = c.samples
        val n = math.max(s.length, 1)
        var sumSq = 0.0
        var zc = 0
        var i = 0
        while (i < s.length) {
          sumSq += s(i) * s(i)
          if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
          i += 1
        }
        val bandRms = new Array[Float](bands)
        var b = 0
        while (b < bands) {
          val from = (b.toLong * s.length / bands).toInt
          val until = ((b + 1).toLong * s.length / bands).toInt
          var acc = 0.0
          var j = from
          while (j < until) { acc += s(j) * s(j); j += 1 }
          bandRms(b) =
            math.sqrt(acc / math.max(until - from, 1)).toFloat
          b += 1
        }
        (m.mediaId,
          (Array(math.sqrt(sumSq / n).toFloat, zc.toFloat / n) ++
            bandRms).toSeq)
      }
    }).toDF("media_id", "features")
      .withColumn("features", col("features").cast("array<float>"))
  }
}
