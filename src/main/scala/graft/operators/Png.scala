package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal, pure-JDK PNG codec (public spec: RFC 2083 / ISO 15948).
  * Exists so the [[MediaCodec]] seam has a REAL decoder behind it in
  * this sandbox (no native media libraries): PNG is chunked
  * DEFLATE-compressed filtered scanlines, and `java.util.zip` ships
  * with the JVM.
  *
  * Decoder: 8-bit greyscale (colour type 0), truecolour (2),
  * palette (3 — PLTE-mapped, decoded to RGB), grey+alpha (4) and RGBA
  * (6), plus 16-bit samples for types 0/2/4/6 (reduced to 8-bit by
  * keeping the big-endian high byte — the standard practical-pipeline
  * reduction), both interlace methods (none and Adam7 — each Adam7
  * pass is an independently filtered sub-image whose pixels scatter
  * back on the pass grid, spec §8.2), all five scanline filters
  * (None/Sub/Up/Average/Paeth), chunk CRCs verified — enough to
  * read real-world PNGs (MultimodalSpec proves it on images
  * written by the JDK's own ImageIO encoder, palette, 16-bit and
  * interlaced included). Encoder: greyscale with a caller-chosen
  * filter type, so decode paths are exercised end-to-end.
  * Deliberately NOT supported (throws): bit depths other than 8/16,
  * tRNS transparency (any colour type) — fail loudly rather than
  * return wrong pixels.
  */
object Png {

  val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Decoded image: `pixels` is the scanline-major sample buffer,
    * `channels` samples per pixel, one byte per sample. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), Signature)

  // ---------------- encode ----------------

  /** Encode an 8-bit greyscale image. `filter` (0–4) is applied to every
    * scanline — an encoder knob that exists so tests drive each decoder
    * unfilter path with bytes a real encoder could emit. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte], filter: Int = 0): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != ${width}x$height")
    require(filter >= 0 && filter <= 4, s"bad filter type $filter")
    val ihdr = new Array[Byte](13)
    writeIntBE(ihdr, 0, width)
    writeIntBE(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // colour type: greyscale
    // compression 0, filter method 0, interlace 0 already zero
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = filter.toByte
      var x = 0
      while (x < width) {
        val cur = pixels(y * width + x) & 0xFF
        val left = if (x > 0) pixels(y * width + x - 1) & 0xFF else 0
        val up = if (y > 0) pixels((y - 1) * width + x) & 0xFF else 0
        val upLeft = if (x > 0 && y > 0) pixels((y - 1) * width + x - 1) & 0xFF else 0
        val f = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(y * (width + 1) + 1 + x) = f.toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", deflate(raw)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  // ---------------- decode ----------------

  /** Decode a PNG to its raw sample buffer. Throws IllegalArgumentException
    * on anything outside the header contract (8/16-bit, colour types
    * 0/2/3/4/6, interlace none or Adam7), or whose chunk CRCs / stream
    * structure are corrupt.
    *
    * `maxPixelBytes` caps the decoded buffer (default 256 MB): PNG is a
    * DEFLATE container, so a ~100-byte payload can legally declare
    * gigapixel dimensions — in a pipeline decoding UNTRUSTED corpus
    * bytes, an unbounded decode is a decompression-bomb denial of
    * service on the executor. The cap rejects the bomb before any
    * allocation happens. */
  def decode(png: Array[Byte], maxPixelBytes: Long = 1L << 28): Image = {
    require(isPng(png), "not a PNG: bad signature")
    // a caller-passed cap above Int.MaxValue would let rawL.toInt wrap
    // below — clamp so the Int conversion is always safe
    val cap = math.min(maxPixelBytes, Int.MaxValue.toLong)
    var pos = 8
    var width = 0; var height = 0; var channels = 0; var colourType = -1
    var bitDepth = 0; var interlaced = false
    var seenIhdr = false; var seenIend = false
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(pos + 8 <= png.length, "truncated PNG: no chunk header")
      val len = readIntBE(png, pos)
      // Long arithmetic: a hostile len near Int.MaxValue wraps the Int
      // sum negative and would sneak past the bounds check
      require(len >= 0 && pos.toLong + 12L + len <= png.length,
        s"truncated PNG chunk at $pos")
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(png, pos + 4, 4 + len)
      require(crc.getValue.toInt == readIntBE(png, pos + 8 + len),
        s"PNG chunk $typ CRC mismatch")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          width = readIntBE(png, pos + 8)
          height = readIntBE(png, pos + 12)
          require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
          bitDepth = png(pos + 16) & 0xFF
          colourType = png(pos + 17) & 0xFF
          val interlace = png(pos + 20) & 0xFF
          require(bitDepth == 8 || bitDepth == 16,
            s"unsupported bit depth $bitDepth (only 8 and 16)")
          require(bitDepth == 8 || colourType != 3,
            "16-bit palette PNG is not a legal combination")
          // for palette (3) the IDAT stream carries ONE index sample per
          // pixel; the palette lookup expands to RGB after unfiltering
          channels = colourType match {
            case 0 | 3 => 1
            case 2 => 3
            case 4 => 2
            case 6 => 4
            case t => throw new IllegalArgumentException(s"unsupported colour type $t")
          }
          require(interlace == 0 || interlace == 1,
            s"unknown interlace method $interlace")
          interlaced = interlace == 1
          seenIhdr = true
        case "PLTE" =>
          require(seenIhdr, "PLTE before IHDR")
          require(len >= 3 && len <= 768 && len % 3 == 0, s"bad PLTE length $len")
          plte = java.util.Arrays.copyOfRange(png, pos + 8, pos + 8 + len)
        case "IDAT" => idat.write(png, pos + 8, len)
        case "IEND" => seenIend = true
        case "tRNS" =>
          // transparency for colour types 0/2/3 — decoding while
          // dropping it would be exactly the wrong-pixels outcome the
          // header contract pledges to reject
          throw new IllegalArgumentException(
            "tRNS transparency unsupported: decoding would drop alpha")
        case _ => // ancillary chunk (tEXt, pHYs, gAMA …): skip
      }
      pos += 12 + len
    }
    require(seenIhdr, "PNG missing IHDR")
    require(colourType != 3 || plte != null, "palette PNG missing PLTE")
    // bytes per pixel = channels × bytes per sample; PNG filters operate
    // on BYTES at this pixel distance, for 16-bit too (spec §6)
    val bps = bitDepth / 8
    val bpp = channels * bps
    // Long math BEFORE any allocation: width/height are attacker data.
    // Palette output is 3 bytes/pixel even though the stream is 1 — cap
    // the EXPANDED size too.
    val strideL = width.toLong * bpp
    val rawL = height.toLong * (1L + strideL)
    val outL = if (colourType == 3) height.toLong * width * 3L else height.toLong * strideL
    require(rawL <= cap && outL <= cap,
      s"decoded size ${math.max(rawL, outL)} B exceeds maxPixelBytes=$maxPixelBytes (${width}x$height×$bpp)")
    val stride = strideL.toInt
    val pixels =
      if (!interlaced) unfilter(inflate(idat.toByteArray, rawL.toInt), 0, height, stride, bpp)
      else {
        // Adam7 (spec §8.2): seven passes, each an INDEPENDENTLY filtered
        // sub-image over the pass grid (xStart, yStart, xStep, yStep);
        // empty passes contribute no scanlines at all
        var totL = 0L
        Adam7.foreach { case (x0, y0, dx, dy) =>
          val pw = passExtent(width, x0, dx); val ph = passExtent(height, y0, dy)
          if (pw > 0 && ph > 0) totL += ph.toLong * (1L + pw.toLong * bpp)
        }
        require(totL <= cap,
          s"interlaced raw size $totL B exceeds maxPixelBytes=$maxPixelBytes")
        val raw = inflate(idat.toByteArray, totL.toInt)
        val out = new Array[Byte](height * stride)
        var off = 0
        Adam7.foreach { case (x0, y0, dx, dy) =>
          val pw = passExtent(width, x0, dx); val ph = passExtent(height, y0, dy)
          if (pw > 0 && ph > 0) {
            val pStride = pw * bpp
            val sub = unfilter(raw, off, ph, pStride, bpp)
            off += ph * (1 + pStride)
            // scatter the pass pixels back onto the full-image grid
            var r = 0
            while (r < ph) {
              var c = 0
              while (c < pw) {
                val srcOff = (r * pStride) + c * bpp
                val dstOff = (y0 + r * dy) * stride + (x0 + c * dx) * bpp
                var k = 0
                while (k < bpp) { out(dstOff + k) = sub(srcOff + k); k += 1 }
                c += 1
              }
              r += 1
            }
          }
        }
        out
      }
    if (colourType != 3 && bps == 1) Image(width, height, channels, pixels)
    else if (bps == 2) {
      // 16-bit → 8-bit: keep the high byte of each big-endian sample
      // (>> 8, the standard practical-pipeline reduction) — the sample
      // layout is big-endian by spec, so the high byte is byte 0
      val out = new Array[Byte](width * height * channels)
      var i = 0
      while (i < out.length) {
        out(i) = pixels(2 * i)
        i += 1
      }
      Image(width, height, channels, out)
    } else {
      // palette expansion: each unfiltered sample is an index into PLTE
      val out = new Array[Byte](width * height * 3)
      val nEntries = plte.length / 3
      var i = 0
      while (i < pixels.length) {
        val p = pixels(i) & 0xFF
        require(p < nEntries, s"palette index $p out of range (PLTE has $nEntries entries)")
        out(i * 3) = plte(p * 3)
        out(i * 3 + 1) = plte(p * 3 + 1)
        out(i * 3 + 2) = plte(p * 3 + 2)
        i += 1
      }
      Image(width, height, 3, out)
    }
  }

  /** Adam7 pass grid: (xStart, yStart, xStep, yStep) per pass. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Pixels of one Adam7 pass along an axis of `full` pixels. */
  private def passExtent(full: Int, start: Int, step: Int): Int =
    if (full > start) (full - start + step - 1) / step else 0

  /** Reverse the scanline filters of `rows` rows of `rowBytes` bytes
    * starting at `raw(off0)` (each row = 1 filter byte + `rowBytes`
    * filtered bytes); left/up neighbors live within this sub-image —
    * exactly the independence Adam7 passes require. */
  private def unfilter(raw: Array[Byte], off0: Int, rows: Int,
      rowBytes: Int, bpp: Int): Array[Byte] = {
    val out = new Array[Byte](rows * rowBytes)
    var y = 0
    var off = off0
    while (y < rows) {
      val filter = raw(off) & 0xFF
      off += 1
      val outOff = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val f = raw(off + x) & 0xFF
        val left = if (x >= bpp) out(outOff + x - bpp) & 0xFF else 0
        val up = if (y > 0) out(outOff - rowBytes + x) & 0xFF else 0
        val upLeft = if (y > 0 && x >= bpp) out(outOff - rowBytes + x - bpp) & 0xFF else 0
        val recon = filter match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, upLeft)
          case t => throw new IllegalArgumentException(s"bad scanline filter $t")
        }
        out(outOff + x) = recon.toByte
        x += 1
      }
      off += rowBytes
      y += 1
    }
    out
  }

  /** a=left, b=up, c=up-left — the PNG Paeth predictor. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    writeIntBE(out, 0, data.length)
    val t = typ.getBytes("US-ASCII")
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32()
    crc.update(out, 4, 4 + data.length)
    writeIntBE(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(compressed: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(compressed)
    val out = new Array[Byte](expected)
    var off = 0
    try {
      while (off < expected && !inf.finished()) {
        val n =
          try inf.inflate(out, off, expected - off)
          catch { case e: java.util.zip.DataFormatException =>
            // reachable with intact chunk CRCs over a garbage DEFLATE
            // stream — normalize to the decoder's one failure type
            throw new IllegalArgumentException(s"corrupt PNG IDAT stream: ${e.getMessage}")
          }
        require(n > 0, "truncated PNG IDAT stream")
        off += n
      }
      require(off == expected, s"PNG pixel data: got $off of $expected bytes")
    } finally inf.end()
    out
  }

  private def writeIntBE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >>> 24).toByte; buf(off + 1) = (v >>> 16).toByte
    buf(off + 2) = (v >>> 8).toByte; buf(off + 3) = v.toByte
  }

  private def readIntBE(buf: Array[Byte], off: Int): Int =
    ((buf(off) & 0xFF) << 24) | ((buf(off + 1) & 0xFF) << 16) |
      ((buf(off + 2) & 0xFF) << 8) | (buf(off + 3) & 0xFF)
}

/** [[MediaCodec]] backed by the real [[Png]] decoder: payloads carrying
  * the PNG signature decode to their raw sample bytes (magic-byte
  * sniffing, the way production decoders dispatch — `mediaType` strings
  * are advisory); anything else passes through like [[StubCodec]]. */
object PngCodec extends MediaCodec {
  override def decode(mediaType: String, payload: Array[Byte]): Array[Byte] =
    if (Png.isPng(payload)) Png.decode(payload).pixels else payload
}
