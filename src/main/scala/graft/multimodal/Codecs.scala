package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import scala.util.Try

import graft.multimodal.Multimodal.{Image, ImageCodec}

/** Real image codecs behind the [[Multimodal.ImageCodec]] boundary —
  * no external dependencies, genuine formats:
  *
  *  - [[BmpCodec]]: hand-rolled Windows BMP (BITMAPINFOHEADER, 8/24/32-bit
  *    uncompressed) decode + 24-bit encode. Self-contained bit-level
  *    parser; MultimodalSpec cross-validates it pixel-for-pixel against
  *    the JDK's independent ImageIO BMP plugin in both directions.
  *  - [[PpmCodec]]: Netpbm P6 (RGB) / P5 (gray) decode + P6 encode.
  *  - [[JdkImageCodec]]: `javax.imageio` (part of the JDK, no extra jars)
  *    — decodes PNG/JPEG/BMP/GIF, encodes lossless PNG. This is the
  *    production-shaped codec for common training-corpus formats.
  *  - [[AutoCodec]]: magic-byte dispatch across all of the above plus the
  *    synthetic GFT0 container, for mixed-format corpora.
  *
  * All decoders return None on malformed input (never throw): corrupt
  * payloads in a 100 TB corpus are data, not exceptions — callers route
  * them to dead-letter output via the Option.
  */
object Codecs {

  /** Windows BMP, BITMAPINFOHEADER (or larger V4/V5 headers), BI_RGB
    * uncompressed at 8 (palette/gray), 24 (BGR) or 32 (BGRA) bits, plus
    * 32-bit BI_BITFIELDS with the standard BGRA masks. Top-down (negative
    * height) and bottom-up row orders both handled. Output is row-major
    * RGB; encode writes bottom-up 24-bit BI_RGB with 4-byte row padding.
    */
  object BmpCodec extends ImageCodec {

    def decode(data: Array[Byte]): Option[Image] = Try {
      if (data.length < 54 || data(0) != 'B' || data(1) != 'M') return None
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      val pixOff = bb.getInt(10)
      val dibSize = bb.getInt(14)
      if (dibSize < 40) return None // BITMAPCOREHEADER not supported
      val w = bb.getInt(18)
      val hRaw = bb.getInt(22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val bpp = bb.getShort(28) & 0xffff
      val compression = bb.getInt(30)
      val stdBitfields = compression == 3 && bpp == 32 &&
        data.length >= 14 + dibSize + 12 && {
          // accept only the canonical little-endian BGRA channel masks
          bb.getInt(14 + 40) == 0x00ff0000 &&
          bb.getInt(14 + 44) == 0x0000ff00 &&
          bb.getInt(14 + 48) == 0x000000ff
        }
      if (compression != 0 && !stdBitfields) return None
      if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue / 4) return None
      if (!Set(8, 24, 32).contains(bpp)) return None

      // 8-bit payloads index a BGRX palette right after the DIB header
      val paletteAt = 14 + dibSize
      val nColors = if (bpp == 8) {
        val declared = bb.getInt(46)
        if (declared == 0) 256 else declared
      } else 0
      if (bpp == 8 && data.length < paletteAt + nColors * 4) return None

      val stride = ((w * bpp / 8) + 3) / 4 * 4
      if (data.length < pixOff + stride.toLong * h) return None
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = pixOff + (if (topDown) y else h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          bpp match {
            case 8 =>
              val idx = (data(srcRow + x) & 0xff).min(nColors - 1)
              px(o) = data(paletteAt + idx * 4 + 2) // R
              px(o + 1) = data(paletteAt + idx * 4 + 1) // G
              px(o + 2) = data(paletteAt + idx * 4) // B
            case 24 =>
              val s = srcRow + x * 3
              px(o) = data(s + 2); px(o + 1) = data(s + 1); px(o + 2) = data(s)
            case 32 =>
              val s = srcRow + x * 4
              px(o) = data(s + 2); px(o + 1) = data(s + 1); px(o + 2) = data(s)
          }
          x += 1
        }
        y += 1
      }
      Some(Image(-1, w, h, 3, px))
    }.toOption.flatten

    def encode(img: Image): Array[Byte] = {
      val rgb = toRgb(img)
      val stride = (img.width * 3 + 3) / 4 * 4
      val size = 54 + stride * img.height
      val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(size)
        .putInt(0).putInt(54)
      bb.putInt(40).putInt(img.width).putInt(img.height)
        .putShort(1).putShort(24).putInt(0).putInt(stride * img.height)
        .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI
      var y = img.height - 1 // bottom-up
      while (y >= 0) {
        val row = new Array[Byte](stride)
        var x = 0
        while (x < img.width) {
          val s = (y * img.width + x) * 3
          row(x * 3) = rgb(s + 2); row(x * 3 + 1) = rgb(s + 1)
          row(x * 3 + 2) = rgb(s)
          x += 1
        }
        bb.put(row)
        y -= 1
      }
      bb.array()
    }
  }

  /** Netpbm: binary P6 (RGB, maxval ≤ 255) and P5 (grayscale) decode,
    * P6 encode. Header = ASCII magic, whitespace/comment-separated
    * dimensions and maxval, single whitespace, then raw samples.
    */
  object PpmCodec extends ImageCodec {

    def decode(data: Array[Byte]): Option[Image] = Try {
      if (data.length < 2 || data(0) != 'P') return None
      val gray = data(1) == '5'
      if (!gray && data(1) != '6') return None
      var pos = 2
      def nextInt(): Int = {
        // skip whitespace and '#'-comments between header tokens
        var inComment = false
        while (pos < data.length && {
          val c = data(pos).toChar
          if (inComment) { if (c == '\n') inComment = false; true }
          else if (c == '#') { inComment = true; true }
          else c.isWhitespace
        }) pos += 1
        var v = 0
        while (pos < data.length && data(pos).toChar.isDigit) {
          v = v * 10 + (data(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      pos += 1 // single whitespace after maxval
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      val ch = if (gray) 1 else 3
      val n = w * h * ch
      if (data.length < pos + n) return None
      Some(Image(-1, w, h, ch, data.slice(pos, pos + n)))
    }.toOption.flatten

    def encode(img: Image): Array[Byte] = {
      val rgb = toRgb(img)
      val header = s"P6\n${img.width} ${img.height}\n255\n"
        .getBytes("US-ASCII")
      header ++ rgb
    }
  }

  /** `javax.imageio` (JDK-builtin, zero external jars): PNG / JPEG / BMP /
    * GIF / WBMP decode, lossless PNG encode. The practical codec for real
    * training corpora; headless-safe (no AWT toolkit needed for ImageIO).
    */
  object JdkImageCodec extends ImageCodec {

    def decode(data: Array[Byte]): Option[Image] = Try {
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(data)))
        .map { bi =>
          val w = bi.getWidth; val h = bi.getHeight
          val px = new Array[Byte](w * h * 3)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            bi.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val argb = row(x)
              val o = (y * w + x) * 3
              px(o) = ((argb >> 16) & 0xff).toByte
              px(o + 1) = ((argb >> 8) & 0xff).toByte
              px(o + 2) = (argb & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Image(-1, w, h, 3, px)
        }
    }.toOption.flatten

    def encode(img: Image): Array[Byte] = {
      val rgb = toRgb(img)
      val bi = new java.awt.image.BufferedImage(
        img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val s = (y * img.width + x) * 3
          bi.setRGB(x, y,
            ((rgb(s) & 0xff) << 16) | ((rgb(s + 1) & 0xff) << 8)
              | (rgb(s + 2) & 0xff))
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", out)
      out.toByteArray
    }
  }

  /** Magic-byte dispatch for mixed-format corpora: BMP and PPM go through
    * the hand-rolled parsers, PNG/JPEG/GIF through ImageIO, GFT0 through
    * the synthetic codec. Encode emits lossless PNG.
    */
  object AutoCodec extends ImageCodec {
    def decode(data: Array[Byte]): Option[Image] = {
      if (data.length < 4) return None
      val (a, b) = (data(0) & 0xff, data(1) & 0xff)
      if (a == 'B' && b == 'M') BmpCodec.decode(data)
      else if (a == 'P' && (b == '5' || b == '6')) PpmCodec.decode(data)
      else if (a == 'G' && b == 'F' && data(2) == 'T' && data(3) == '0')
        Multimodal.SyntheticCodec.decode(data)
      else JdkImageCodec.decode(data) // PNG 0x89…, JPEG 0xFFD8, GIF…
    }
    def encode(img: Image): Array[Byte] = JdkImageCodec.encode(img)
  }

  /** Channel normalization shared by the encoders: gray replicates to
    * RGB, RGBA drops alpha, RGB passes through.
    */
  private def toRgb(img: Image): Array[Byte] = img.channels match {
    case 3 => img.pixels
    case 1 =>
      val out = new Array[Byte](img.pixels.length * 3)
      var i = 0
      while (i < img.pixels.length) {
        out(i * 3) = img.pixels(i); out(i * 3 + 1) = img.pixels(i)
        out(i * 3 + 2) = img.pixels(i)
        i += 1
      }
      out
    case 4 =>
      val n = img.pixels.length / 4
      val out = new Array[Byte](n * 3)
      var i = 0
      while (i < n) {
        out(i * 3) = img.pixels(i * 4); out(i * 3 + 1) = img.pixels(i * 4 + 1)
        out(i * 3 + 2) = img.pixels(i * 4 + 2)
        i += 1
      }
      out
    case c => throw new IllegalArgumentException(s"unsupported channels $c")
  }
}
