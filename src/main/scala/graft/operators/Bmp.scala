package graft.operators

/** Pure-JDK BMP (Windows bitmap) codec — the third image container next
  * to [[Png]] and [[Jpeg]], covering the uncompressed-raster corner of
  * the format matrix (BMP is what scanners, screenshots, and legacy
  * Windows tooling emit; a web-scale multimodal crawl sees plenty).
  * Same philosophy as the siblings: a REAL parser for the format's
  * dominant profile (BITMAPINFOHEADER-or-later, 24-bit uncompressed,
  * bottom-up or top-down), hardened against untrusted bytes — every
  * header field is validated before any allocation, dimensions are
  * bomb-capped, and truncated pixel arrays are rejected — with
  * everything outside the profile refused LOUDLY via
  * IllegalArgumentException, never a silent wrong image.
  *
  * Reference for the format: the public Windows BITMAPFILEHEADER /
  * BITMAPINFOHEADER layout (14 + ≥40 bytes, little-endian), rows padded
  * to 4-byte boundaries, stored bottom-up unless biHeight < 0.
  */
object Bmp {

  /** `BM` magic sniff (the dispatch rule [[BmpCodec]] uses). */
  def isBmp(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  /** Decoded image: `pixels` is the row-major GRAYSCALE luma buffer
    * (top-down, whatever the storage order was), one byte per pixel,
    * luma = (r + g + b) / 3 integer — exact for the gray images
    * [[encodeGray24]] writes (r = g = b). */
  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  /** Encode grayscale pixels (row-major, top-down) as a 24-bit
    * bottom-up BMP with r = g = b = value — the profile every viewer
    * reads. Deterministic byte-for-byte. */
  def encodeGray24(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height")
    require(pixels.length.toLong == width.toLong * height,
      s"pixel buffer ${pixels.length} != $width*$height")
    // row stride in Long first: width*3 overflows Int at width ~715M,
    // where a negative stride would slip past the size guard and fail
    // later as NegativeArraySizeException instead of this require
    val rowSizeL = (width.toLong * 3 + 3) & ~3L
    require(rowSizeL * height + 54L <= Int.MaxValue, "image too large")
    val rowSize = rowSizeL.toInt
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    writeIntLE(out, 2, out.length)   // bfSize
    writeIntLE(out, 10, 54)          // bfOffBits
    writeIntLE(out, 14, 40)          // biSize (BITMAPINFOHEADER)
    writeIntLE(out, 18, width)
    writeIntLE(out, 22, height)      // positive: bottom-up
    out(26) = 1                      // biPlanes = 1
    out(28) = 24                     // biBitCount
    writeIntLE(out, 30, 0)           // BI_RGB (uncompressed)
    writeIntLE(out, 34, dataSize)
    var s = 0
    while (s < height) {
      val imgRow = height - 1 - s    // bottom-up storage
      var x = 0
      val base = 54 + s * rowSize
      while (x < width) {
        val v = pixels(imgRow * width + x)
        val o = base + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v // B, G, R
        x += 1
      }
      s += 1
    }
    out
  }

  /** Decode a BMP to its grayscale luma buffer. Accepts the dominant
    * profile: BITMAPINFOHEADER or any later extension (biSize ≥ 40),
    * 24-bit, BI_RGB (uncompressed), bottom-up (biHeight > 0) or
    * top-down (biHeight < 0). Everything else — palette/16/32-bit,
    * RLE, core headers — throws IllegalArgumentException, as do
    * truncated files, out-of-range pixel offsets, and dimensions whose
    * product exceeds `maxPixelBytes` (BMP headers are 4-byte fields: a
    * 54-byte payload can declare a gigapixel canvas — in a pipeline
    * decoding UNTRUSTED corpus bytes that is an allocation bomb, so
    * the cap rejects it before any buffer exists). */
  def decode(b: Array[Byte], maxPixelBytes: Long = 1L << 28): Image = {
    require(isBmp(b), "not a BMP: bad signature")
    require(b.length >= 54, s"truncated BMP: ${b.length} bytes")
    val offBits = readIntLE(b, 10)
    val biSize = readIntLE(b, 14)
    require(biSize >= 40, s"unsupported header size $biSize (BITMAPCOREHEADER?)")
    require(14L + biSize <= b.length, "truncated BMP: header exceeds file")
    val width = readIntLE(b, 18)
    val rawHeight = readIntLE(b, 22)
    val planes = readShortLE(b, 26)
    val bpp = readShortLE(b, 28)
    val compression = readIntLE(b, 30)
    require(width >= 1, s"bad width $width")
    require(rawHeight != 0, "zero height")
    require(planes == 1, s"bad planes $planes")
    require(bpp == 24, s"unsupported bit depth $bpp (24-bit profile only)")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    val topDown = rawHeight < 0
    // Int.MinValue has no positive negation — reject before math.abs
    require(rawHeight != Int.MinValue, "bad height")
    val height = math.abs(rawHeight)
    val cap = math.min(maxPixelBytes, Int.MaxValue.toLong)
    require(width.toLong * height <= cap,
      s"decoded size ${width.toLong * height} exceeds cap $cap")
    val rowSize = ((width.toLong * 3 + 3) & ~3L)
    require(offBits >= 14 + biSize && offBits <= b.length,
      s"bad pixel offset $offBits")
    require(offBits + rowSize * height <= b.length,
      "truncated BMP: pixel array exceeds file")
    val px = new Array[Byte](width * height)
    var s = 0
    while (s < height) {
      val imgRow = if (topDown) s else height - 1 - s
      val base = offBits + s * rowSize
      var x = 0
      while (x < width) {
        val o = (base + x * 3).toInt
        val sum = (b(o) & 0xFF) + (b(o + 1) & 0xFF) + (b(o + 2) & 0xFF)
        px(imgRow * width + x) = (sum / 3).toByte
        x += 1
      }
      s += 1
    }
    Image(width, height, px)
  }

  private def writeIntLE(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = v.toByte; buf(off + 1) = (v >>> 8).toByte
    buf(off + 2) = (v >>> 16).toByte; buf(off + 3) = (v >>> 24).toByte
  }

  private def readIntLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xFF) | ((buf(off + 1) & 0xFF) << 8) |
      ((buf(off + 2) & 0xFF) << 16) | ((buf(off + 3) & 0xFF) << 24)

  private def readShortLE(buf: Array[Byte], off: Int): Int =
    (buf(off) & 0xFF) | ((buf(off + 1) & 0xFF) << 8)
}

/** [[MediaCodec]] backed by the [[Bmp]] decoder: payloads carrying the
  * `BM` signature decode to their grayscale luma bytes (magic-byte
  * sniffing, like [[PngCodec]]); anything else passes through. */
object BmpCodec extends MediaCodec {
  override def decode(mediaType: String, payload: Array[Byte]): Array[Byte] =
    if (Bmp.isBmp(payload)) Bmp.decode(payload).pixels else payload
}
