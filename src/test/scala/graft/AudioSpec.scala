package graft

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.Audio
import graft.multimodal.Audio.{AudioClip, WavCodec}
import graft.multimodal.Multimodal.MediaRow

class AudioSpec extends SparkSpec {
  import spark.implicits._

  private def sine(rate: Int, seconds: Double, hz: Double): Array[Float] = {
    val n = (rate * seconds).toInt
    Array.tabulate(n)(i =>
      (0.5 * math.sin(2 * math.Pi * hz * i / rate)).toFloat)
  }

  test("WAV round trip: encode → decode is 16-bit-exact") {
    val clip = AudioClip(1L, 8000, 1, sine(8000, 0.25, 440))
    val decoded = WavCodec.decode(WavCodec.encode(clip)).get
    assert(decoded.sampleRate == 8000 && decoded.channels == 1)
    assert(decoded.samples.length == clip.samples.length)
    // quantization error bounded by one 16-bit step
    decoded.samples.zip(clip.samples).foreach { case (d, o) =>
      assert(math.abs(d - o) <= 1.5f / 32768f)
    }
  }

  test("our encoder is readable by the JDK's independent WAV parser") {
    val clip = AudioClip(1L, 16000, 2, sine(16000, 0.1, 220) ++
      sine(16000, 0.1, 220)) // 2ch interleaved-ish payload, 0.1s total
    val wav = WavCodec.encode(clip.copy(
      samples = clip.samples.take(clip.samples.length / 2 * 2)))
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 2 &&
      fmt.getSampleSizeInBits == 16)
    val bytes = in.readAllBytes()
    // JDK sees exactly the PCM payload we wrote
    assert(bytes.length == clip.samples.length / 2 * 2 * 2)
  }

  test("the JDK's encoder is readable by our parser, samples matching") {
    val rate = 8000f
    val pcm = Array.tabulate(800)(i =>
      math.round(0.25f * 32767f *
        math.sin(2 * math.Pi * 330 * i / rate).toFloat).toShort)
    val bytes = new Array[Byte](pcm.length * 2)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(pcm)
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, pcm.length)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    val clip = WavCodec.decode(out.toByteArray).get
    assert(clip.sampleRate == 8000 && clip.channels == 1)
    assert(clip.samples.length == pcm.length)
    clip.samples.zip(pcm).foreach { case (f, s) =>
      assert(math.abs(f - s / 32768f) < 1e-6f)
    }
  }

  test("chunk walker skips LIST chunks and honors word alignment") {
    val clip = AudioClip(1L, 8000, 1, sine(8000, 0.05, 100))
    val plain = WavCodec.encode(clip)
    // splice an odd-length LIST chunk between fmt and data
    val listBody = "INFOIART".getBytes("US-ASCII") ++ Array[Byte]('x')
    val bb = java.nio.ByteBuffer
      .allocate(plain.length + 8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(plain, 0, 36) // RIFF header + fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
      .put(listBody).put(0.toByte) // pad byte for odd length
    bb.put(plain, 36, plain.length - 36)
    val arr = bb.array()
    // fix the RIFF size field
    java.nio.ByteBuffer.wrap(arr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, arr.length - 8)
    val decoded = WavCodec.decode(arr).get
    assert(decoded.samples.length == clip.samples.length)
  }

  test("8-bit PCM and 32-bit float WAV payloads decode") {
    // hand-build an 8-bit mono file: values 0..255 → [-1, 1)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ {
        val b = java.nio.ByteBuffer.allocate(4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.putInt(body.length); b.array()
      } ++ body
    def fmtChunk(code: Short, bits: Short): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(code).putShort(1).putInt(8000)
        .putInt(8000 * bits / 8).putShort((bits / 8).toShort).putShort(bits)
      b.array()
    }
    val pcm8 = chunk("fmt ", fmtChunk(1, 8)) ++
      chunk("data", Array[Byte](0, -128 /*0x80=128*/ , -1 /*255*/ ))
    val riff8 = "RIFF".getBytes("US-ASCII") ++ {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(4 + pcm8.length); b.array()
    } ++ "WAVE".getBytes("US-ASCII") ++ pcm8
    val c8 = WavCodec.decode(riff8).get
    assert(c8.samples.toSeq == Seq(-1f, 0f, 127f / 128f))

    val floats = Array(0.25f, -0.5f, 1.0f)
    val fb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    floats.foreach(fb.putFloat)
    val pcmF = chunk("fmt ", fmtChunk(3, 32)) ++ chunk("data", fb.array())
    val riffF = "RIFF".getBytes("US-ASCII") ++ {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(4 + pcmF.length); b.array()
    } ++ "WAVE".getBytes("US-ASCII") ++ pcmF
    assert(WavCodec.decode(riffF).get.samples.toSeq == floats.toSeq)
  }

  test("property: random clips round-trip within one 16-bit step, any " +
    "rate/channel/length combination") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val rate = 4000 + rnd.nextInt(44100)
      val ch = 1 + rnd.nextInt(3)
      val frames = rnd.nextInt(500)
      val samples = Array.fill(frames * ch)(
        (rnd.nextFloat() * 2f - 1f) * (if (rnd.nextBoolean()) 1f else 0.01f))
      val clip = AudioClip(1L, rate, ch, samples)
      val back = WavCodec.decode(WavCodec.encode(clip)).get
      assert(back.sampleRate == rate && back.channels == ch)
      assert(back.samples.length == samples.length)
      back.samples.zip(samples).foreach { case (d, o) =>
        assert(math.abs(d - o) <= 1.5f / 32768f, s"rate=$rate ch=$ch")
      }
    }
  }

  test("malformed payloads return None, never throw") {
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decode("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
    assert(WavCodec.decode(Array.fill(100)(0x41.toByte)).isEmpty)
    // truncated data chunk still yields the readable prefix
    val clip = AudioClip(1L, 8000, 1, sine(8000, 0.1, 100))
    val cut = WavCodec.encode(clip).dropRight(10)
    val partial = WavCodec.decode(cut)
    assert(partial.nonEmpty && partial.get.samples.length ==
      clip.samples.length - 5)
  }

  test("resample halves the frame count and preserves the waveform") {
    val media = Seq(MediaRow(1L, "audio",
      WavCodec.encode(AudioClip(1L, 8000, 1, sine(8000, 0.2, 100))),
      "wav")).toDS()
    val down = Audio.resample(media, 4000).collect().head
    val clip = WavCodec.decode(down.data).get
    assert(clip.sampleRate == 4000)
    assert(math.abs(clip.samples.length - 800) <= 1)
    // a 100 Hz sine resampled to 4 kHz still crosses zero ~40 times
    val zc = clip.samples.sliding(2)
      .count(p => (p(0) >= 0) != (p(1) >= 0))
    assert(math.abs(zc - 40) <= 2)
  }

  test("resample drops zero-frame clips instead of throwing") {
    // a valid WAV with an EMPTY data chunk decodes to Some(clip) with 0
    // samples — resample must not index samples(-1) on it
    val empty = WavCodec.encode(AudioClip(1L, 8000, 1, Array.emptyFloatArray))
    assert(WavCodec.decode(empty).exists(_.samples.isEmpty))
    val media = Seq(
      MediaRow(1L, "audio", empty, "wav"),
      MediaRow(2L, "audio",
        WavCodec.encode(AudioClip(2L, 8000, 1, sine(8000, 0.1, 100))),
        "wav")).toDS()
    val out = Audio.resample(media, 4000).collect()
    assert(out.map(_.mediaId).toSeq == Seq(2L))
  }

  /** Amplitude-modulated tone: the envelope (not the carrier) carries the
    * perceptual identity — a pure sine would have a flat, degenerate
    * envelope.
    */
  private def modulated(rate: Int, seconds: Double, envHz: Double,
                        phase: Double = 0.0): Array[Float] = {
    val n = (rate * seconds).toInt
    Array.tabulate(n) { i =>
      val t = i.toDouble / rate
      val env = 0.5 + 0.45 * math.sin(2 * math.Pi * envHz * t + phase)
      (env * math.sin(2 * math.Pi * 440 * t)).toFloat
    }
  }

  test("envelope hash survives resampling, gain, and noise; separates " +
    "different envelopes") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = AudioClip(1L, 8000, 1, modulated(8000, 1.0, envHz = 3))
    val resamp = AudioClip(2L, 4000, 1, modulated(4000, 1.0, envHz = 3))
    val quiet = base.copy(samples = base.samples.map(_ * 0.3f))
    val r = new scala.util.Random(11)
    val noisy = base.copy(samples =
      base.samples.map(s => s + 0.02f * r.nextGaussian().toFloat))
    val other = AudioClip(3L, 8000, 1,
      modulated(8000, 1.0, envHz = 7, phase = 1.3))
    val hb = Audio.envelopeHash64(base)
    assert(ham(hb, Audio.envelopeHash64(resamp)) <= 6)
    assert(ham(hb, Audio.envelopeHash64(quiet)) <= 2)
    assert(ham(hb, Audio.envelopeHash64(noisy)) <= 6)
    assert(ham(hb, Audio.envelopeHash64(other)) > 12)
  }

  test("blocked Hamming join finds planted WAV near-duplicates") {
    val rows = Seq(
      MediaRow(1L, "audio",
        WavCodec.encode(AudioClip(1L, 8000, 1, modulated(8000, 1.0, 3))),
        "wav"),
      MediaRow(2L, "audio", // same content at half the sample rate
        WavCodec.encode(AudioClip(2L, 4000, 1, modulated(4000, 1.0, 3))),
        "wav"),
      MediaRow(3L, "audio", // different envelope
        WavCodec.encode(AudioClip(3L, 8000, 1, modulated(8000, 1.0, 7, 1.3))),
        "wav"),
      MediaRow(4L, "audio", Array[Byte](1, 2), "junk") // dropped
    ).toDS().repartition(2)
    val pairs = Audio.nearDuplicates(rows, maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("audio nearDuplicates refuses above routeThreshold, routing to " +
    "dedupCorpus") {
    val rows = (1 to 3).map(i =>
      MediaRow(i.toLong, "audio",
        WavCodec.encode(AudioClip(i.toLong, 8000, 1, modulated(800, 0.1, i))),
        "wav")).toDS()
    Audio.nearDuplicates(rows, maxHamming = 6, routeThreshold = 3L).count()
    val ex = intercept[IllegalArgumentException] {
      Audio.nearDuplicates(rows, maxHamming = 6, routeThreshold = 2L)
    }
    assert(ex.getMessage.contains("dedupCorpus"), ex.getMessage)
    assert(ex.getMessage.contains("routeThreshold"), ex.getMessage)
  }

  test("segment splits clips and audioMeta/audioFeatures run per partition") {
    val clips = Seq(
      MediaRow(1L, "audio",
        WavCodec.encode(AudioClip(1L, 8000, 1, sine(8000, 2.5, 440))),
        "wav"),
      MediaRow(2L, "audio",
        WavCodec.encode(AudioClip(2L, 8000, 1, new Array[Float](8000))),
        "wav"),
      MediaRow(3L, "audio", Array[Byte](1, 2, 3), "wav") // corrupt
    ).toDS().repartition(3)
    val segs = Audio.segment(clips, seconds = 1.0).collect()
    assert(segs.count(_.mediaId == 1L) == 3) // 2.5s → 1+1+0.5
    assert(segs.filter(_.mediaId == 1L).map(_.segmentIdx).sorted.toSeq
      == Seq(0, 1, 2))
    val meta = Audio.audioMeta(clips).collect()
      .map(m => m.mediaId -> m).toMap
    assert(meta(1L).ok && meta(1L).nFrames == 20000 &&
      math.abs(meta(1L).durationSec - 2.5) < 1e-9)
    assert(!meta(3L).ok)
    val feats = Audio.audioFeatures(clips).collect()
    assert(feats.length == 2) // corrupt row dropped
    val f2 = feats.find(_.getLong(0) == 2L).get
      .getSeq[Float](1)
    assert(f2.forall(_ == 0f)) // silence → all-zero features
    val f1 = feats.find(_.getLong(0) == 1L).get.getSeq[Float](1)
    assert(f1.head > 0.3f && f1.head < 0.4f) // 0.5-amp sine RMS ≈ 0.354
    assert(f1.length == 2 + 8)
  }

  test("audioStats reconstructs int16 samples exactly in Q15") {
    // raw 16-bit PCM WAV with hand-picked extremes: the /32768f decode is
    // a power-of-two scale, so round(f*32768) must give back EXACTLY
    // -32768, -1, 0, 1, 32767
    val samples = Seq[Short](-32768, -1, 0, 1, 32767)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val rows = Seq(
      MediaRow(5L, "audio", bb.array(), "wav"),
      MediaRow(6L, "audio", Array[Byte](9, 9), "wav") // dropped
    ).toDS()
    val got = Audio.audioStats(rows).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)) ==
      ((5L, 8000, 1, 5L)))
    assert(r.getLong(4) == -32768L - 1L + 0L + 1L + 32767L) // sum = -1
    assert((r.getLong(5), r.getLong(6)) == ((-32768L, 32767L)))
  }
}
