package graft.operators

/** Minimal, pure-JDK baseline JPEG codec (public spec: ITU-T T.81 /
  * ISO 10918-1, JFIF interchange). Exists because real web corpora are
  * mostly JPEG — a media pipeline whose only real decoder is PNG skips
  * the dominant format — and this sandbox has no native media
  * libraries, so the [[MediaCodec]] seam needs a JVM decoder.
  *
  * Decoder: baseline sequential DCT (SOF0; SOF1's Huffman-sequential
  * payload decodes identically at 8-bit precision and is accepted),
  * 8-bit samples, greyscale (1 component) and JFIF YCbCr (3
  * components) with per-component sampling factors 1–4 in each axis —
  * 4:4:4, 4:2:2, 4:4:0 and 4:2:0 all fall out of the general MCU
  * grid — restart markers (DRI/RSTn), 0xFF00 byte stuffing, APPn/COM
  * skipping, multi-table DQT/DHT segments, 8- and 16-bit quant tables.
  * Chroma upsamples by sample replication; YCbCr→RGB is the JFIF
  * round-and-clamp. Deliberately NOT supported (throws, loudly):
  * progressive (SOF2) and every other frame type, 12-bit precision,
  * arithmetic coding, scans that are neither fully interleaved nor
  * single-component. Fail loudly beats wrong pixels — the [[Png]]
  * posture.
  *
  * Encoder: greyscale and RGB (4:4:4 or 4:2:0) baseline with the
  * T.81 Annex K example quantization + Huffman tables, plus a caller
  * quant knob; [[UnitQuant]] (all-ones tables) exists because an image
  * that is CONSTANT PER 8×8 BLOCK round-trips bit-exactly through
  * FDCT→quantize→IDCT (every AC is ~1e-13 and quantizes to zero, the
  * DC path is exact power-of-two arithmetic) — which is what lets a
  * lossy codec carry an exact DuckDB oracle (m11) and an exact
  * encode↔decode spec.
  *
  * Untrusted-bytes discipline (the [[Png.decode]] contract): decoded
  * size is computed in Long BEFORE any allocation and capped by
  * `maxPixelBytes` (SOF dims are attacker data: 65535×65535×3 ≈ 12.9
  * GB from a ~200-byte payload); every structural violation raises
  * IllegalArgumentException; entropy decoding is bounded by the MCU
  * count and the 16-bit Huffman depth, so a mutated stream can never
  * hang the executor. PngSpec-style mutation fuzz pins this.
  */
object Jpeg {

  /** Decoded image: scanline-major samples, `channels` ∈ {1 (grey),
    * 3 (RGB)} bytes per pixel — the [[Png.Image]] layout, so every
    * downstream [[Multimodal]] kernel (dHash, resize, tiles) applies
    * unchanged. */
  final case class Image(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8 &&
      (bytes(2) & 0xFF) == 0xFF

  /** All-ones quantization tables: the exact-roundtrip configuration
    * for block-constant images (see object doc). */
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  /** T.81 Annex K.1 luminance quantization table (quality ~50). */
  val StdLumQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** T.81 Annex K.2 chrominance quantization table. */
  val StdChromQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zig-zag scan order: ZZ(k) = natural (row-major) index of the k-th
    * coefficient in transmission order (T.81 figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // T.81 Annex K.3 example Huffman tables, as (BITS[1..16], HUFFVAL)
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChromBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumVals = hexBytes(
    "01 02 03 00 04 11 05 12 21 31 41 06 13 51 61 07 22 71 14 32 81 91 A1 08 " +
    "23 42 B1 C1 15 52 D1 F0 24 33 62 72 82 09 0A 16 17 18 19 1A 25 26 27 28 " +
    "29 2A 34 35 36 37 38 39 3A 43 44 45 46 47 48 49 4A 53 54 55 56 57 58 59 " +
    "5A 63 64 65 66 67 68 69 6A 73 74 75 76 77 78 79 7A 83 84 85 86 87 88 89 " +
    "8A 92 93 94 95 96 97 98 99 9A A2 A3 A4 A5 A6 A7 A8 A9 AA B2 B3 B4 B5 B6 " +
    "B7 B8 B9 BA C2 C3 C4 C5 C6 C7 C8 C9 CA D2 D3 D4 D5 D6 D7 D8 D9 DA E1 E2 " +
    "E3 E4 E5 E6 E7 E8 E9 EA F1 F2 F3 F4 F5 F6 F7 F8 F9 FA")
  private val AcChromBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = hexBytes(
    "00 01 02 03 11 04 05 21 31 06 12 41 51 07 61 71 13 22 32 81 08 14 42 91 " +
    "A1 B1 C1 09 23 33 52 F0 15 62 72 D1 0A 16 24 34 E1 25 F1 17 18 19 1A 26 " +
    "27 28 29 2A 35 36 37 38 39 3A 43 44 45 46 47 48 49 4A 53 54 55 56 57 58 " +
    "59 5A 63 64 65 66 67 68 69 6A 73 74 75 76 77 78 79 7A 82 83 84 85 86 87 " +
    "88 89 8A 92 93 94 95 96 97 98 99 9A A2 A3 A4 A5 A6 A7 A8 A9 AA B2 B3 B4 " +
    "B5 B6 B7 B8 B9 BA C2 C3 C4 C5 C6 C7 C8 C9 CA D2 D3 D4 D5 D6 D7 D8 D9 DA " +
    "E2 E3 E4 E5 E6 E7 E8 E9 EA F2 F3 F4 F5 F6 F7 F8 F9 FA")

  private def hexBytes(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(h => Integer.parseInt(h, 16).toByte)

  /** cos((2x+1)·u·π/16) — the shared FDCT/IDCT basis. */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val C: Array[Double] = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  // ---------------- encode ----------------

  /** Encode an 8-bit greyscale image as a baseline JFIF JPEG. With
    * [[UnitQuant]] and block-constant pixels the encode is exact (see
    * object doc); with the default Annex K table it is an ordinary
    * lossy quality-50 encode. */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
      quant: Array[Int] = StdLumQuant, restartInterval: Int = 0): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 65535 && height <= 65535,
      s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != ${width}x$height")
    require(restartInterval >= 0 && restartInterval <= 65535,
      s"bad restart interval $restartInterval")
    checkQuant(quant)
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, Array(quant), gray = true,
      restartInterval = restartInterval)
    var bw = new BitWriter(out)
    val dcEnc = new HuffEncoder(DcLumBits, DcLumVals)
    val acEnc = new HuffEncoder(AcLumBits, AcLumVals)
    val mcusX = (width + 7) / 8; val mcusY = (height + 7) / 8
    val block = new Array[Double](64)
    var pred = 0
    var mcu = 0; var rst = 0
    val mcuCount = mcusX * mcusY
    while (mcu < mcuCount) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush() // byte-align, then RSTn, then the predictor resets
        out.write(0xFF); out.write(0xD0 + rst)
        rst = (rst + 1) & 7
        pred = 0
        bw = new BitWriter(out)
      }
      loadBlock(pixels, width, height, 1, 0, (mcu % mcusX) * 8, (mcu / mcusX) * 8, block)
      pred = encodeBlock(bw, block, quant, dcEnc, acEnc, pred)
      mcu += 1
    }
    bw.flush()
    out.write(Array(0xFF.toByte, 0xD9.toByte)) // EOI
    out.toByteArray
  }

  /** Encode an interleaved-RGB image as a baseline JFIF YCbCr JPEG.
    * `subsample = true` emits 4:2:0 (luma sampling 2×2, chroma
    * box-averaged over each 2×2) — the dominant web layout; `false`
    * emits 4:4:4. */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte],
      subsample: Boolean = true, lumQuant: Array[Int] = StdLumQuant,
      chromQuant: Array[Int] = StdChromQuant): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 65535 && height <= 65535,
      s"bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != ${width}x${height}x3")
    checkQuant(lumQuant); checkQuant(chromQuant)
    val n = width * height
    val yP = new Array[Byte](n); val cbP = new Array[Byte](n); val crP = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xFF; val g = rgb(3 * i + 1) & 0xFF; val b = rgb(3 * i + 2) & 0xFF
      yP(i) = clamp255(Math.round(0.299 * r + 0.587 * g + 0.114 * b)).toByte
      cbP(i) = clamp255(Math.round(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)).toByte
      crP(i) = clamp255(Math.round(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)).toByte
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    writeHeaders(out, width, height, Array(lumQuant, chromQuant), gray = false,
      lumaH = if (subsample) 2 else 1, lumaV = if (subsample) 2 else 1)
    val bw = new BitWriter(out)
    val dcL = new HuffEncoder(DcLumBits, DcLumVals)
    val acL = new HuffEncoder(AcLumBits, AcLumVals)
    val dcC = new HuffEncoder(DcChromBits, DcChromVals)
    val acC = new HuffEncoder(AcChromBits, AcChromVals)
    val s = if (subsample) 2 else 1
    val mcuPx = 8 * s
    val mcusX = (width + mcuPx - 1) / mcuPx; val mcusY = (height + mcuPx - 1) / mcuPx
    // chroma planes at subsampled resolution (box average, edge-replicated)
    val cw = (width + s - 1) / s; val ch = (height + s - 1) / s
    val cbS = downsample(cbP, width, height, s, cw, ch)
    val crS = downsample(crP, width, height, s, cw, ch)
    val block = new Array[Double](64)
    var predY = 0; var predCb = 0; var predCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var by = 0
        while (by < s) {
          var bx = 0
          while (bx < s) {
            loadBlock(yP, width, height, 1, 0, mx * mcuPx + bx * 8, my * mcuPx + by * 8, block)
            predY = encodeBlock(bw, block, lumQuant, dcL, acL, predY)
            bx += 1
          }
          by += 1
        }
        loadBlock(cbS, cw, ch, 1, 0, mx * 8, my * 8, block)
        predCb = encodeBlock(bw, block, chromQuant, dcC, acC, predCb)
        loadBlock(crS, cw, ch, 1, 0, mx * 8, my * 8, block)
        predCr = encodeBlock(bw, block, chromQuant, dcC, acC, predCr)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(Array(0xFF.toByte, 0xD9.toByte))
    out.toByteArray
  }

  private def checkQuant(q: Array[Int]): Unit = {
    require(q.length == 64, s"quant table must have 64 entries, got ${q.length}")
    require(q.forall(v => v >= 1 && v <= 255), "quant entries must be in 1..255")
  }

  private def clamp255(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt

  private def downsample(p: Array[Byte], w: Int, h: Int, s: Int,
      cw: Int, ch: Int): Array[Byte] = {
    if (s == 1) return p
    val out = new Array[Byte](cw * ch)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        var sum = 0; var cnt = 0
        var dy = 0
        while (dy < s) {
          var dx = 0
          while (dx < s) {
            val sx = math.min(x * s + dx, w - 1); val sy = math.min(y * s + dy, h - 1)
            sum += p(sy * w + sx) & 0xFF; cnt += 1
            dx += 1
          }
          dy += 1
        }
        out(y * cw + x) = ((sum + cnt / 2) / cnt).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Copy the 8×8 block at (x0, y0) of channel `ch` into `block`,
    * level-shifted by −128; pixels beyond the image edge replicate the
    * last row/column (the standard encoder padding that keeps edge
    * blocks low-frequency). */
  private def loadBlock(p: Array[Byte], w: Int, h: Int, channels: Int, ch: Int,
      x0: Int, y0: Int, block: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(y0 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(x0 + x, w - 1)
        block(y * 8 + x) = (p((sy * w + sx) * channels + ch) & 0xFF) - 128.0
        x += 1
      }
      y += 1
    }
  }

  /** FDCT → quantize → Huffman-encode one block; returns the new DC
    * predictor. */
  private def encodeBlock(bw: BitWriter, block: Array[Double], quant: Array[Int],
      dc: HuffEncoder, ac: HuffEncoder, pred: Int): Int = {
    // separable FDCT: S(u,v) = 1/4 C(u)C(v) ΣΣ s(x,y) cos-basis
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: tmp(y,u) = Σ_x s(x,y)·cosT(x)(u)
      var u = 0
      while (u < 8) {
        var acc = 0.0; var x = 0
        while (x < 8) { acc += block(y * 8 + x) * CosT(x)(u); x += 1 }
        tmp(y * 8 + u) = acc
        u += 1
      }
      y += 1
    }
    val coef = new Array[Int](64) // zig-zag order, quantized
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0; var yy = 0
        while (yy < 8) { acc += tmp(yy * 8 + u) * CosT(yy)(v); yy += 1 }
        val s = 0.25 * C(u) * C(v) * acc
        val nat = v * 8 + u
        var k = 0
        while (Zigzag(k) != nat) k += 1 // 64-entry permutation lookup
        coef(k) = Math.round(s / quant(nat)).toInt
        u += 1
      }
      v += 1
    }
    // DC difference
    val diff = coef(0) - pred
    val dcCat = category(diff)
    dc.write(bw, dcCat)
    if (dcCat > 0) bw.writeBits(lowBits(diff, dcCat), dcCat)
    // AC run-lengths
    var k = 1; var run = 0
    while (k < 64) {
      if (coef(k) == 0) run += 1
      else {
        while (run > 15) { ac.write(bw, 0xF0); run -= 16 } // ZRL
        val cat = category(coef(k))
        ac.write(bw, (run << 4) | cat)
        bw.writeBits(lowBits(coef(k), cat), cat)
        run = 0
      }
      k += 1
    }
    if (run > 0) ac.write(bw, 0x00) // EOB
    coef(0)
  }

  /** Magnitude category: number of bits to represent |v| (0 for 0). */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** The EXTEND-inverse: low `cat` bits of v (negatives encode as
    * v − 1 in two's complement, per T.81 F.1.2.1). */
  private def lowBits(v: Int, cat: Int): Int =
    (if (v < 0) v - 1 else v) & ((1 << cat) - 1)

  private def writeHeaders(out: java.io.ByteArrayOutputStream, width: Int,
      height: Int, quants: Array[Array[Int]], gray: Boolean,
      lumaH: Int = 1, lumaV: Int = 1, restartInterval: Int = 0): Unit = {
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      out.write((payload.length + 2) >> 8); out.write((payload.length + 2) & 0xFF)
      out.write(payload, 0, payload.length)
    }
    marker(0xD8) // SOI
    seg(0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    quants.zipWithIndex.foreach { case (q, id) =>
      val p = new Array[Byte](65)
      p(0) = id.toByte // Pq=0 (8-bit), Tq=id
      var k = 0
      while (k < 64) { p(1 + k) = q(Zigzag(k)).toByte; k += 1 }
      seg(0xDB, p)
    }
    val nf = if (gray) 1 else 3
    val sof = new Array[Byte](6 + 3 * nf)
    sof(0) = 8 // precision
    sof(1) = (height >> 8).toByte; sof(2) = height.toByte
    sof(3) = (width >> 8).toByte; sof(4) = width.toByte
    sof(5) = nf.toByte
    sof(6) = 1; sof(7) = ((lumaH << 4) | lumaV).toByte; sof(8) = 0 // Y
    if (!gray) {
      sof(9) = 2; sof(10) = 0x11; sof(11) = 1  // Cb
      sof(12) = 3; sof(13) = 0x11; sof(14) = 1 // Cr
    }
    seg(0xC0, sof)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      val p = new Array[Byte](17 + vals.length)
      p(0) = ((tc << 4) | th).toByte
      var i = 0
      while (i < 16) { p(1 + i) = bits(i).toByte; i += 1 }
      System.arraycopy(vals, 0, p, 17, vals.length)
      seg(0xC4, p)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(1, 0, AcLumBits, AcLumVals)
    if (!gray) { dht(0, 1, DcChromBits, DcChromVals); dht(1, 1, AcChromBits, AcChromVals) }
    if (restartInterval > 0)
      seg(0xDD, Array(((restartInterval >> 8) & 0xFF).toByte, (restartInterval & 0xFF).toByte))
    val sos = new Array[Byte](4 + 2 * nf)
    sos(0) = nf.toByte
    sos(1) = 1; sos(2) = 0x00
    if (!gray) { sos(3) = 2; sos(4) = 0x11; sos(5) = 3; sos(6) = 0x11 }
    sos(1 + 2 * nf) = 0; sos(2 + 2 * nf) = 63; sos(3 + 2 * nf) = 0 // Ss/Se/AhAl
    seg(0xDA, sos)
  }

  private final class HuffEncoder(bits: Array[Int], vals: Array[Byte]) {
    // canonical codes (T.81 C.2): sizes then codes in table order
    private val codeOf = new Array[Int](256)
    private val sizeOf = new Array[Int](256)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          val v = vals(k) & 0xFF
          codeOf(v) = code; sizeOf(v) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
    }
    def write(bw: BitWriter, sym: Int): Unit = {
      val s = sizeOf(sym)
      require(s > 0, s"symbol $sym not in Huffman table")
      bw.writeBits(codeOf(sym), s)
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var nbits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1-bits (T.81 F.1.2.3)
      while (nbits != 0) writeBits(1, 1)
    }
  }

  // ---------------- decode ----------------

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: Int = -1
    var acTab: Int = -1
    var pred: Int = 0
  }

  /** Decode a baseline JPEG to its sample buffer (grey or interleaved
    * RGB). Throws IllegalArgumentException on anything outside the
    * header contract (see object doc) or on a structurally corrupt
    * stream; `maxPixelBytes` caps every allocation the attacker-
    * controlled SOF dimensions could trigger. */
  def decode(jpeg: Array[Byte], maxPixelBytes: Long = 1L << 28): Image = {
    require(isJpeg(jpeg), "not a JPEG: bad SOI marker")
    val cap = math.min(maxPixelBytes, Int.MaxValue.toLong)
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDecoder](4)
    val acTabs = new Array[HuffDecoder](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var pos = 2
    var planes: Array[Array[Byte]] = null
    var planeW: Array[Int] = null; var planeH: Array[Int] = null
    var hMax = 0; var vMax = 0
    var sawScan = false

    def u16(at: Int): Int = {
      require(at + 2 <= jpeg.length, "truncated JPEG: expected 16-bit field")
      ((jpeg(at) & 0xFF) << 8) | (jpeg(at + 1) & 0xFF)
    }

    while (!sawScan || pos < jpeg.length) {
      require(pos + 2 <= jpeg.length, "truncated JPEG: no marker")
      require((jpeg(pos) & 0xFF) == 0xFF, f"expected marker at $pos, got 0x${jpeg(pos) & 0xFF}%02X")
      var mPos = pos + 1
      while (mPos < jpeg.length && (jpeg(mPos) & 0xFF) == 0xFF) mPos += 1 // fill bytes
      require(mPos < jpeg.length, "truncated JPEG: marker ran off the end")
      val m = jpeg(mPos) & 0xFF
      pos = mPos + 1
      m match {
        case 0xD9 => // EOI
          require(sawScan, "JPEG EOI before any scan")
          pos = jpeg.length
        case 0x01 => // TEM — standalone, no payload
        case 0xDB => // DQT
          val len = u16(pos); val end = pos + len
          require(len >= 2 && end <= jpeg.length, "bad DQT length")
          var p = pos + 2
          while (p < end) {
            val pq = (jpeg(p) & 0xF0) >> 4; val tq = jpeg(p) & 0x0F
            require(pq <= 1, s"bad DQT precision $pq")
            require(tq <= 3, s"bad DQT id $tq")
            val nBytes = if (pq == 0) 64 else 128
            require(p + 1 + nBytes <= end, "truncated DQT table")
            val tab = new Array[Int](64)
            var k = 0
            while (k < 64) {
              val v = if (pq == 0) jpeg(p + 1 + k) & 0xFF
                else ((jpeg(p + 1 + 2 * k) & 0xFF) << 8) | (jpeg(p + 2 + 2 * k) & 0xFF)
              require(v >= 1, s"zero quantizer at k=$k")
              tab(Zigzag(k)) = v
              k += 1
            }
            qt(tq) = tab
            p += 1 + nBytes
          }
          pos = end
        case 0xC4 => // DHT
          val len = u16(pos); val end = pos + len
          require(len >= 2 && end <= jpeg.length, "bad DHT length")
          var p = pos + 2
          while (p < end) {
            require(p + 17 <= end, "truncated DHT header")
            val tc = (jpeg(p) & 0xF0) >> 4; val th = jpeg(p) & 0x0F
            require(tc <= 1, s"bad DHT class $tc (arithmetic coding?)")
            require(th <= 3, s"bad DHT id $th")
            val bits = Array.tabulate(16)(i => jpeg(p + 1 + i) & 0xFF)
            val total = bits.sum
            require(total >= 1 && total <= 256, s"bad DHT value count $total")
            require(p + 17 + total <= end, "truncated DHT values")
            val vals = java.util.Arrays.copyOfRange(jpeg, p + 17, p + 17 + total)
            val dec = new HuffDecoder(bits, vals)
            if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
            p += 17 + total
          }
          pos = end
        case 0xC0 | 0xC1 => // SOF0 baseline / SOF1 extended sequential
          val len = u16(pos); val end = pos + len
          require(len >= 8 && end <= jpeg.length, "bad SOF length")
          require(comps == null, "multiple SOF segments")
          val precision = jpeg(pos + 2) & 0xFF
          require(precision == 8, s"unsupported sample precision $precision")
          height = u16(pos + 3); width = u16(pos + 5)
          require(width >= 1 && height >= 1, s"bad dimensions ${width}x$height (DNL unsupported)")
          val nf = jpeg(pos + 7) & 0xFF
          require(nf == 1 || nf == 3, s"unsupported component count $nf")
          require(len == 8 + 3 * nf, "SOF length/component mismatch")
          comps = Array.tabulate(nf) { i =>
            val o = pos + 8 + 3 * i
            val h = (jpeg(o + 1) & 0xF0) >> 4; val v = jpeg(o + 1) & 0x0F
            require(h >= 1 && h <= 4 && v >= 1 && v <= 4, s"bad sampling ${h}x$v")
            val tq = jpeg(o + 2) & 0xFF
            require(tq <= 3, s"bad quant id $tq")
            Component(jpeg(o) & 0xFF, h, v, tq)
          }
          require(comps.map(_.id).distinct.length == nf, "duplicate component ids")
          // T.81 A.2.2: a single-component scan is NON-interleaved (one
          // 8x8 block per MCU in raster order) regardless of declared
          // sampling factors; this decoder only implements the
          // interleaved ordering, so accepting h/v > 1 here would
          // silently scramble pixels — reject loudly instead.
          require(nf > 1 || (comps(0).h == 1 && comps(0).v == 1),
            s"grayscale with ${comps(0).h}x${comps(0).v} sampling " +
              "unsupported (single-component scans are non-interleaved)")
          hMax = comps.map(_.h).max; vMax = comps.map(_.v).max
          // every component's padded plane, Long math BEFORE allocation
          planeW = new Array[Int](nf); planeH = new Array[Int](nf)
          val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          var planeBytes = 0L
          var i = 0
          while (i < nf) {
            planeW(i) = mcusX * 8 * comps(i).h
            planeH(i) = mcusY * 8 * comps(i).v
            planeBytes += planeW(i).toLong * planeH(i)
            i += 1
          }
          val outBytes = width.toLong * height * (if (nf == 1) 1 else 3)
          require(planeBytes + outBytes <= cap,
        s"decoded size ${planeBytes + outBytes} B exceeds maxPixelBytes=$maxPixelBytes (${width}x$height)")
          planes = Array.tabulate(nf)(i => new Array[Byte](planeW(i) * planeH(i)))
          pos = end
        case 0xC2 => throw new IllegalArgumentException("progressive JPEG (SOF2) unsupported")
        case x if x >= 0xC3 && x <= 0xCF && x != 0xC4 && x != 0xC8 =>
          throw new IllegalArgumentException(f"unsupported frame type 0x$x%02X")
        case 0xDD => // DRI
          require(u16(pos) == 4, "bad DRI length")
          restartInterval = u16(pos + 2)
          pos += 4
        case 0xDA => // SOS
          require(comps != null, "SOS before SOF")
          // a second sequential scan would reset predictors and
          // re-decode over the same planes — wrong pixels, silently
          require(!sawScan, "multi-scan JPEG unsupported")
          val len = u16(pos); val end = pos + len
          require(len >= 6 && end <= jpeg.length, "bad SOS length")
          val ns = jpeg(pos + 2) & 0xFF
          require(ns == comps.length || (ns == 1 && comps.length == 1),
            s"unsupported scan: $ns of ${comps.length} components (progressive/multi-scan?)")
          require(len == 6 + 2 * ns, "SOS length/component mismatch")
          var i = 0
          while (i < ns) {
            val cid = jpeg(pos + 3 + 2 * i) & 0xFF
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"scan component $cid not in frame"))
            c.dcTab = (jpeg(pos + 4 + 2 * i) & 0xF0) >> 4
            c.acTab = jpeg(pos + 4 + 2 * i) & 0x0F
            require(c.dcTab <= 3 && c.acTab <= 3, "bad entropy table id")
            i += 1
          }
          require((jpeg(pos + 3 + 2 * ns) & 0xFF) == 0 &&
            (jpeg(pos + 4 + 2 * ns) & 0xFF) == 63 && (jpeg(pos + 5 + 2 * ns) & 0xFF) == 0,
            "non-baseline spectral selection in SOS")
          comps.foreach { c =>
            require(qt(c.tq) != null, s"quant table ${c.tq} undefined at SOS")
            require(dcTabs(c.dcTab) != null, s"DC table ${c.dcTab} undefined at SOS")
            require(acTabs(c.acTab) != null, s"AC table ${c.acTab} undefined at SOS")
            c.pred = 0
          }
          pos = decodeScan(jpeg, end, comps, qt, dcTabs, acTabs, planes, planeW, planeH,
            width, height, hMax, vMax, restartInterval)
          sawScan = true
        case x if x >= 0xE0 && x <= 0xEF => pos += u16(pos) // APPn
        case 0xFE => pos += u16(pos) // COM
        case x if x >= 0xD0 && x <= 0xD7 =>
          throw new IllegalArgumentException("stray RST marker outside a scan")
        case 0xDC => pos += u16(pos) // DNL — dims already required nonzero
        case x => throw new IllegalArgumentException(f"unsupported JPEG marker 0x$x%02X")
      }
    }
    require(sawScan, "JPEG had no scan data")
    // crop padded planes and color-convert
    if (comps.length == 1) {
      val p0 = planes(0); val pw = planeW(0)
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(p0, y * pw, out, y * width, width)
        y += 1
      }
      Image(width, height, 1, out)
    } else {
      val out = new Array[Byte](width * height * 3)
      val yC = comps(0); val cbC = comps(1); val crC = comps(2)
      val yPl = planes(0); val cbPl = planes(1); val crPl = planes(2)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yv = yPl((y * yC.v / vMax) * planeW(0) + (x * yC.h / hMax)) & 0xFF
          val cb = (cbPl((y * cbC.v / vMax) * planeW(1) + (x * cbC.h / hMax)) & 0xFF) - 128
          val cr = (crPl((y * crC.v / vMax) * planeW(2) + (x * crC.h / hMax)) & 0xFF) - 128
          val o = (y * width + x) * 3
          out(o) = clamp255(Math.round(yv + 1.402 * cr)).toByte
          out(o + 1) = clamp255(Math.round(yv - 0.344136286 * cb - 0.714136286 * cr)).toByte
          out(o + 2) = clamp255(Math.round(yv + 1.772 * cb)).toByte
          x += 1
        }
        y += 1
      }
      Image(width, height, 3, out)
    }
  }

  /** Decode one interleaved (or single-component) scan starting at
    * `start`; returns the position of the first marker after the
    * entropy-coded data. */
  private def decodeScan(jpeg: Array[Byte], start: Int, comps: Array[Component],
      qt: Array[Array[Int]], dcTabs: Array[HuffDecoder], acTabs: Array[HuffDecoder],
      planes: Array[Array[Byte]], planeW: Array[Int], planeH: Array[Int],
      width: Int, height: Int, hMax: Int, vMax: Int, restartInterval: Int): Int = {
    val br = new BitReader(jpeg, start)
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val coef = new Array[Int](64)
    val sample = new Array[Byte](64)
    var mcu = 0
    val mcuCount = mcusX * mcusY
    var nextRst = 0
    while (mcu < mcuCount) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        val got = br.readRestart()
        require(got == nextRst, s"restart marker out of sequence: RST$got, expected RST$nextRst")
        nextRst = (nextRst + 1) & 7
        comps.foreach(_.pred = 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            decodeBlock(br, dcTabs(c.dcTab), acTabs(c.acTab), q, c, coef)
            idctBlock(coef, sample)
            // scatter into the padded plane
            val x0 = (mx * c.h + bx) * 8; val y0 = (my * c.v + by) * 8
            val pw = planeW(ci)
            var r = 0
            while (r < 8) {
              System.arraycopy(sample, r * 8, planes(ci), (y0 + r) * pw + x0, 8)
              r += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    br.alignToMarker()
  }

  /** Huffman-decode one block's coefficients (natural order, already
    * dequantized) into `coef`. */
  private def decodeBlock(br: BitReader, dc: HuffDecoder, ac: HuffDecoder,
      q: Array[Int], c: Component, coef: Array[Int]): Unit = {
    java.util.Arrays.fill(coef, 0)
    val t = dc.decode(br)
    require(t <= 15, s"bad DC category $t")
    val diff = if (t == 0) 0 else extend(br.readBits(t), t)
    c.pred += diff
    coef(0) = c.pred * q(0)
    var k = 1
    while (k < 64) {
      val rs = ac.decode(br)
      val r = rs >> 4; val s = rs & 15
      if (s == 0) {
        if (r == 15) k += 16 // ZRL
        else k = 64 // EOB
      } else {
        k += r
        require(k <= 63, s"AC coefficient index $k out of range")
        val nat = Zigzag(k)
        coef(nat) = extend(br.readBits(s), s) * q(nat)
        k += 1
      }
    }
  }

  /** T.81 F.2.2.1 EXTEND: map a `t`-bit magnitude field to its signed
    * value. */
  private def extend(v: Int, t: Int): Int =
    if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Separable double-precision IDCT + level shift + clamp. */
  private def idctBlock(coef: Array[Int], out: Array[Byte]): Unit = {
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) { // columns of the coefficient grid: tmp(v,x) = Σ_u C(u) S(u,v) cosT(x)(u)
      var v = 0
      while (v < 8) {
        var acc = 0.0; var u = 0
        while (u < 8) { acc += C(u) * coef(v * 8 + u) * CosT(x)(u); u += 1 }
        tmp(v * 8 + x) = acc
        v += 1
      }
      x += 1
    }
    var y = 0
    while (y < 8) {
      var xx = 0
      while (xx < 8) {
        var acc = 0.0; var v = 0
        while (v < 8) { acc += C(v) * tmp(v * 8 + xx) * CosT(y)(v); v += 1 }
        out(y * 8 + xx) = clamp255(Math.round(0.25 * acc + 128.0)).toByte
        xx += 1
      }
      y += 1
    }
  }

  /** Canonical Huffman decoder (T.81 F.2.2.3 DECODE): MINCODE/MAXCODE/
    * VALPTR per code length, bounded at 16 bits — a corrupt stream
    * fails loudly instead of looping. */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Byte]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = br.readBits(1)
      var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.readBits(1)
        l += 1
      }
      require(l <= 16, "corrupt JPEG entropy stream: no Huffman code matched in 16 bits")
      vals(valPtr(l) + code - minCode(l)) & 0xFF
    }
  }

  /** Entropy-segment bit reader: honors 0xFF00 stuffing, stops at any
    * real marker, and (like every practical decoder) feeds 1-padding
    * once the segment ends — termination stays bounded because MCU
    * count is fixed and the Huffman decoder rejects 16 one-bits. */
  private final class BitReader(data: Array[Byte], startPos: Int) {
    private var pos = startPos
    private var acc = 0
    private var nbits = 0
    private var atMarker = false

    private def nextByte(): Int = {
      if (atMarker || pos >= data.length) { atMarker = true; return -1 }
      val b = data(pos) & 0xFF
      if (b != 0xFF) { pos += 1; b }
      else if (pos + 1 < data.length && (data(pos + 1) & 0xFF) == 0x00) { pos += 2; 0xFF }
      else { atMarker = true; -1 } // a real marker terminates the segment
    }

    def readBits(n: Int): Int = {
      require(n >= 0 && n <= 16, s"bad bit count $n")
      while (nbits < n) {
        val b = nextByte()
        acc = (acc << 8) | (if (b < 0) 0xFF else b) // 1-padding past the end
        nbits += 8
      }
      val v = (acc >> (nbits - n)) & ((1 << n) - 1)
      nbits -= n
      v
    }

    /** Byte-align and consume an RSTn marker; returns n. */
    def readRestart(): Int = {
      nbits = 0; acc = 0
      // skip to the marker we stopped at (or find it now)
      while (!atMarker) {
        val b = nextByte()
        require(b >= 0 || atMarker, "unreachable")
        if (b < 0) () // nextByte set atMarker
      }
      require(pos + 2 <= data.length, "truncated JPEG: expected RST marker")
      require((data(pos) & 0xFF) == 0xFF, "expected RST marker")
      val m = data(pos + 1) & 0xFF
      require(m >= 0xD0 && m <= 0xD7, f"expected RST marker, got 0x$m%02X")
      pos += 2
      atMarker = false
      m - 0xD0
    }

    /** Byte-align after the last MCU and return the offset of the next
      * marker's 0xFF. */
    def alignToMarker(): Int = {
      while (!atMarker && pos < data.length) {
        val b = data(pos) & 0xFF
        if (b == 0xFF && pos + 1 < data.length && (data(pos + 1) & 0xFF) != 0x00) atMarker = true
        else pos += 1
      }
      require(pos < data.length, "truncated JPEG: no marker after scan")
      pos
    }
  }
}

/** [[MediaCodec]] backed by the real [[Jpeg]] decoder: payloads
  * carrying the JPEG SOI signature decode to their sample bytes
  * (magic-byte sniffing, like [[PngCodec]]); anything else passes
  * through. */
object JpegCodec extends MediaCodec {
  override def decode(mediaType: String, payload: Array[Byte]): Array[Byte] =
    if (Jpeg.isJpeg(payload)) Jpeg.decode(payload).pixels else payload
}

/** Magic-byte dispatching codec over every real decoder in the repo:
  * PNG → [[Png]], JPEG → [[Jpeg]], RIFF/WAVE → [[Wav]] (big-endian
  * PCM16 sample buffer), anything else passes through — the production
  * shape where one corpus column carries mixed media. */
object SniffCodec extends MediaCodec {
  override def decode(mediaType: String, payload: Array[Byte]): Array[Byte] =
    if (Png.isPng(payload)) Png.decode(payload).pixels
    else if (Jpeg.isJpeg(payload)) Jpeg.decode(payload).pixels
    else if (Wav.isWav(payload)) Wav.decode(payload).samplesBE
    else payload
}
