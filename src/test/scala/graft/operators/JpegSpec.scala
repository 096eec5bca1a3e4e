package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** [[Jpeg]] codec spec. The load-bearing checks are (a) the exact
  * block-constant roundtrip that the m11 oracle relies on, and (b) the
  * ImageIO interop in BOTH directions — the JDK ships an independent
  * JPEG implementation, so agreement means the bytes are real JPEG,
  * not a private format. JPEG is lossy, so cross-decoder checks use
  * images that are provably exact (block-constant) or a small pixel
  * tolerance (different IDCT/upsampling arithmetic legally differs by
  * a couple of levels; T.81 Annex A only bounds accuracy, it does not
  * prescribe bit-exact output). */
class JpegSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private var spark: org.apache.spark.sql.SparkSession = _

  override def beforeAll(): Unit = {
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .appName("jpeg-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def grayPixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate[Byte](w * h)(i => ((i * 37 + 11) % 256).toByte)

  /** Pixels constant on each 8×8 block: block (bx, by) has value
    * vals(by * bw + bx). */
  private def blockConstant(bw: Int, bh: Int, vals: Array[Int]): Array[Byte] = {
    val px = new Array[Byte](bw * 8 * bh * 8)
    for (y <- 0 until bh * 8; x <- 0 until bw * 8)
      px(y * bw * 8 + x) = vals((y / 8) * bw + (x / 8)).toByte
    px
  }

  private def imageIoDecode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the JPEG")
    img
  }

  test("block-constant grey images roundtrip EXACTLY under UnitQuant — all 256 values") {
    // 32 blocks per image, 8 images cover all 256 byte values
    for (base <- 0 until 256 by 32) {
      val vals = Array.tabulate(32)(i => base + i)
      val px = blockConstant(8, 4, vals)
      val img = Jpeg.decode(Jpeg.encodeGray(64, 32, px, quant = Jpeg.UnitQuant))
      assert(img.width === 64 && img.height === 32 && img.channels === 1)
      assert(img.pixels.toSeq === px.toSeq, s"lossy roundtrip at base=$base")
    }
  }

  test("edge blocks: non-multiple-of-8 dims roundtrip exactly when padding replicates a constant") {
    // 13×5: one partial block; constant value → replication keeps it constant
    val px = Array.fill[Byte](13 * 5)(123.toByte)
    val img = Jpeg.decode(Jpeg.encodeGray(13, 5, px, quant = Jpeg.UnitQuant))
    assert(img.width === 13 && img.height === 5)
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("ImageIO (the JDK's independent JPEG impl) reads our encoder's output") {
    val w = 48; val h = 24
    val px = grayPixels(w, h)
    val jpeg = Jpeg.encodeGray(w, h, px) // standard Annex K table — a real lossy encode
    val decoded = imageIoDecode(jpeg)
    assert(decoded.getWidth === w && decoded.getHeight === h)
    // lossy: compare against OUR decode of the same bytes, tolerance 2
    // (float vs libjpeg integer IDCT)
    val ours = Jpeg.decode(jpeg)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = decoded.getRaster.getSample(x, y, 0)
      val mine = ours.pixels(y * w + x) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(theirs - mine))
    }
    assert(maxDiff <= 2, s"ImageIO and our decoder disagree by $maxDiff > 2")
  }

  test("our decoder reads ImageIO-written greyscale JPEGs (vs ImageIO's own decode)") {
    val w = 40; val h = 17 // partial blocks on both axes
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 13 + y * 29) % 256)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val bytes = out.toByteArray
    val ours = Jpeg.decode(bytes)
    assert(ours.width === w && ours.height === h && ours.channels === 1)
    val theirs = imageIoDecode(bytes)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs(theirs.getRaster.getSample(x, y, 0) - (ours.pixels(y * w + x) & 0xFF)))
    assert(maxDiff <= 2, s"greyscale ImageIO interop drift $maxDiff > 2")
  }

  test("our decoder reads ImageIO-written COLOR JPEGs: solid colors are exact") {
    // solid color: every block is DC-only and chroma is constant, so
    // BOTH decoders must reconstruct the identical flat image whatever
    // subsampling/upsampling they use (the JDK writes 4:2:0 here)
    for (rgb <- Seq(0x804020, 0x2080C0, 0xC0C040)) {
      val w = 24; val h = 16
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", out))
      val bytes = out.toByteArray
      val ours = Jpeg.decode(bytes)
      assert(ours.width === w && ours.height === h && ours.channels === 3)
      val theirs = imageIoDecode(bytes)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val t = (theirs.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
        val m = ours.pixels((y * w + x) * 3 + c) & 0xFF
        maxDiff = math.max(maxDiff, math.abs(t - m))
      }
      assert(maxDiff <= 1, f"solid 0x$rgb%06X interop drift $maxDiff > 1")
    }
  }

  test("our decoder reads ImageIO-written smooth-gradient COLOR JPEGs within tolerance") {
    // smooth (no wraps, no edges) so the only legal cross-decoder
    // differences are IDCT arithmetic (±1–2) and chroma upsampling
    // (libjpeg interpolates, we replicate: bounded by half the
    // per-sample chroma step on a smooth ramp)
    val w = 32; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((40 + x * 3) << 16) | ((60 + y * 3) << 8) | 100)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val bytes = out.toByteArray
    val ours = Jpeg.decode(bytes)
    assert(ours.width === w && ours.height === h && ours.channels === 3)
    val theirs = imageIoDecode(bytes)
    var maxDiff = 0; var sumDiff = 0L
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val t = (theirs.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
      val m = ours.pixels((y * w + x) * 3 + c) & 0xFF
      maxDiff = math.max(maxDiff, math.abs(t - m)); sumDiff += math.abs(t - m)
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(maxDiff <= 16, s"gradient interop max drift $maxDiff > 16")
    assert(meanDiff <= 3.0, f"gradient interop mean drift $meanDiff%.2f > 3 — systematic color error")
  }

  test("our 4:2:0 and 4:4:4 color encodes: ImageIO and our decoder agree on both") {
    val w = 24; val h = 16
    val rgb = new Array[Byte](w * h * 3)
    // smooth ramps, no mod-256 wraps (a wrap is a sharp chroma edge
    // where interpolating vs replicating upsamplers legally diverge)
    for (y <- 0 until h; x <- 0 until w) {
      rgb((y * w + x) * 3) = (x * 5 + 40).toByte
      rgb((y * w + x) * 3 + 1) = (y * 7 + 60).toByte
      rgb((y * w + x) * 3 + 2) = (x * 3 + y * 3 + 50).toByte
    }
    for (sub <- Seq(true, false)) {
      val jpeg = Jpeg.encodeRgb(w, h, rgb, subsample = sub)
      val ours = Jpeg.decode(jpeg)
      assert(ours.channels === 3)
      val theirs = imageIoDecode(jpeg)
      assert(theirs.getWidth === w && theirs.getHeight === h)
      var maxDiff = 0; var sumDiff = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val t = (theirs.getRGB(x, y) >> (16 - 8 * c)) & 0xFF
        val m = ours.pixels((y * w + x) * 3 + c) & 0xFF
        maxDiff = math.max(maxDiff, math.abs(t - m)); sumDiff += math.abs(t - m)
      }
      // 4:2:0 legally differs more across decoders: libjpeg upsamples
      // chroma with a triangular ("fancy") filter, we replicate samples
      // — both are spec-conformant reconstructions of the same stream
      val tol = if (sub) 16 else 2
      assert(maxDiff <= tol, s"subsample=$sub interop max drift $maxDiff > $tol")
      assert(sumDiff.toDouble / (w * h * 3) <= 3.0,
        f"subsample=$sub mean drift ${sumDiff.toDouble / (w * h * 3)}%.2f > 3")
    }
  }

  test("restart markers: DRI/RSTn streams decode identically to unsegmented ones") {
    // 9 MCUs with interval 2 → 4 restarts, exercising RST0..RST3 and the
    // predictor reset; block-constant + UnitQuant keeps the decode exact
    val vals = Array.tabulate(18)(i => (i * 13 + 5) % 256)
    val px = blockConstant(6, 3, vals)
    val plain = Jpeg.encodeGray(48, 24, px, quant = Jpeg.UnitQuant)
    val rst = Jpeg.encodeGray(48, 24, px, quant = Jpeg.UnitQuant, restartInterval = 2)
    // the restart stream really contains DRI and at least RST0/RST1
    def hasMarker(bytes: Array[Byte], m: Int): Boolean =
      bytes.sliding(2).exists(p => (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == m)
    assert(hasMarker(rst, 0xDD), "no DRI segment in restart stream")
    assert(hasMarker(rst, 0xD0) && hasMarker(rst, 0xD1), "no RST markers in restart stream")
    assert(!hasMarker(plain, 0xDD))
    assert(Jpeg.decode(plain).pixels.toSeq === px.toSeq)
    assert(Jpeg.decode(rst).pixels.toSeq === px.toSeq)
    // ImageIO agrees on the restart stream too (independent RST impl)
    val theirs = imageIoDecode(rst)
    for (y <- 0 until 24; x <- 0 until 48)
      assert(theirs.getRaster.getSample(x, y, 0) === (px(y * 48 + x) & 0xFF),
        s"ImageIO restart decode differs at ($x,$y)")
  }

  test("bomb cap: huge SOF dims are rejected BEFORE allocation") {
    val px = Array.fill[Byte](8 * 8)(7)
    val ok = Jpeg.encodeGray(8, 8, px, quant = Jpeg.UnitQuant)
    // SOF0 payload: find FFC0, dims at offset+5 (len2 precision1 h2 w2)
    var sof = -1
    var i = 2
    while (sof < 0 && i + 1 < ok.length) {
      if ((ok(i) & 0xFF) == 0xFF && (ok(i + 1) & 0xFF) == 0xC0) sof = i
      i += 1
    }
    assert(sof > 0, "SOF0 not found in our own stream")
    val bomb = ok.clone()
    bomb(sof + 5) = 0xFF.toByte; bomb(sof + 6) = 0xFF.toByte // height 65535
    bomb(sof + 7) = 0xFF.toByte; bomb(sof + 8) = 0xFF.toByte // width 65535
    val e = intercept[IllegalArgumentException] { Jpeg.decode(bomb) }
    assert(e.getMessage.contains("maxPixelBytes"), e.getMessage)
  }

  test("progressive JPEGs are rejected loudly") {
    val px = Array.fill[Byte](8 * 8)(7)
    val ok = Jpeg.encodeGray(8, 8, px)
    var sof = -1
    var i = 2
    while (sof < 0 && i + 1 < ok.length) {
      if ((ok(i) & 0xFF) == 0xFF && (ok(i + 1) & 0xFF) == 0xC0) sof = i
      i += 1
    }
    val prog = ok.clone()
    prog(sof + 1) = 0xC2.toByte
    val e = intercept[IllegalArgumentException] { Jpeg.decode(prog) }
    assert(e.getMessage.contains("progressive"))
  }

  test("grayscale with sampling factors >1x1 is rejected (non-interleaved scans unimplemented)") {
    val px = Array.fill[Byte](8 * 8)(7)
    val ok = Jpeg.encodeGray(8, 8, px)
    var sof = -1
    var i = 2
    while (sof < 0 && i + 1 < ok.length) {
      if ((ok(i) & 0xFF) == 0xFF && (ok(i + 1) & 0xFF) == 0xC0) sof = i
      i += 1
    }
    // after the 2-byte marker: len(2) precision(1) h(2) w(2) nf(1)
    // then per-comp id(1) hv(1) tq(1) — the single component's h|v
    // byte sits at sof+11
    val bad = ok.clone()
    bad(sof + 11) = 0x22.toByte // declare 2x2 sampling
    val e = intercept[IllegalArgumentException] { Jpeg.decode(bad) }
    assert(e.getMessage.contains("non-interleaved"))
  }

  test("a second SOS is rejected loudly (multi-scan sequential unsupported)") {
    val px = Array.fill[Byte](8 * 8)(7)
    val ok = Jpeg.encodeGray(8, 8, px, quant = Jpeg.UnitQuant)
    var sos = -1
    var i = 2
    while (sos < 0 && i + 1 < ok.length) {
      if ((ok(i) & 0xFF) == 0xFF && (ok(i + 1) & 0xFF) == 0xDA) sos = i
      i += 1
    }
    assert(sos > 0 && (ok(ok.length - 2) & 0xFF) == 0xFF &&
      (ok(ok.length - 1) & 0xFF) == 0xD9)
    // duplicate [SOS .. entropy data] before the EOI
    val scan = java.util.Arrays.copyOfRange(ok, sos, ok.length - 2)
    val multi = java.util.Arrays.copyOf(ok, sos) ++ scan ++ scan ++
      Array(0xFF.toByte, 0xD9.toByte)
    val e = intercept[IllegalArgumentException] { Jpeg.decode(multi) }
    assert(e.getMessage.contains("multi-scan"))
  }

  test("truncation anywhere fails loudly, never hangs") {
    val px = grayPixels(24, 16)
    val ok = Jpeg.encodeGray(24, 16, px)
    for (cut <- Seq(3, 20, ok.length / 2, ok.length - 1)) {
      val t = java.util.Arrays.copyOf(ok, cut)
      // either IllegalArgumentException, or (mid-entropy cut) a decode
      // completed from 1-padding — both in contract; hangs are not
      try { Jpeg.decode(t) }
      catch { case _: IllegalArgumentException => }
    }
  }

  test("fuzz: random mutations of a grey JPEG never escape the decoder contract") {
    val ok = Jpeg.encodeGray(24, 16, grayPixels(24, 16))
    val rnd = new scala.util.Random(42)
    var decoded = 0
    for (_ <- 1 to 400) {
      val m = ok.clone()
      for (_ <- 1 to rnd.nextInt(4)) // 0–3 flips; 0 keeps some decodes green
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      // contract: an Image back or IllegalArgumentException — never an
      // index/negative-size error and never a hang
      try { Jpeg.decode(m); decoded += 1 }
      catch { case _: IllegalArgumentException => }
    }
    assert(decoded >= 1, "every unmutated-equivalent decode failed — fuzz harness broken")
  }

  test("fuzz: random mutations of a 4:2:0 COLOR JPEG never escape the decoder contract") {
    val w = 16; val h = 16
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val ok = Jpeg.encodeRgb(w, h, rgb, subsample = true)
    val rnd = new scala.util.Random(43)
    var decoded = 0
    for (_ <- 1 to 400) {
      val m = ok.clone()
      for (_ <- 1 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try { Jpeg.decode(m); decoded += 1 }
      catch { case _: IllegalArgumentException => }
    }
    assert(decoded >= 1, "every unmutated-equivalent color decode failed — fuzz harness broken")
  }

  test("dHash near-dup: a JPEG re-encode of a PNG image hashes within 10 bits of the original") {
    // the m05/m07 pipeline shape: same underlying image, one lossless
    // (PNG) and one lossy (JPEG) copy must still collide as near-dups
    val w = 64; val h = 64
    // smooth gradient — dHash compares neighboring means, so JPEG noise
    // of ±2 can flip at most near-tie bits
    val px = Array.tabulate[Byte](w * h)(i => (((i % w) * 3 + (i / w)) % 256).toByte)
    val pngPixels = Png.decode(Png.encodeGray(w, h, px)).pixels
    val jpgPixels = Jpeg.decode(Jpeg.encodeGray(w, h, px)).pixels
    assert(pngPixels.toSeq === px.toSeq) // PNG is lossless
    val h1 = Multimodal.dHash64(pngPixels, w, h, 1)
    val h2 = Multimodal.dHash64(jpgPixels, w, h, 1)
    val dist = java.lang.Long.bitCount(h1 ^ h2)
    assert(dist <= 10, s"JPEG twin drifted $dist dHash bits from the PNG original")
  }

  test("SniffCodec dispatches by magic bytes: PNG→Png, JPEG→Jpeg, other→passthrough") {
    val px = Array.fill[Byte](8 * 8)(55)
    assert(SniffCodec.decode("x", Png.encodeGray(8, 8, px)).toSeq === px.toSeq)
    assert(SniffCodec.decode("x",
      Jpeg.encodeGray(8, 8, px, quant = Jpeg.UnitQuant)).toSeq === px.toSeq)
    val raw = Array[Byte](1, 2, 3)
    assert(SniffCodec.decode("x", raw).toSeq === raw.toSeq)
    assert(JpegCodec.decode("x", raw).toSeq === raw.toSeq)
  }

  test("JpegCodec feeds the m01 feature pipeline unchanged") {
    val sp = spark
    import sp.implicits._
    val recs = (1L to 5L).map { id =>
      val n = 8 * id.toInt
      val px = Array.tabulate[Byte](n * 8)(i => ((i + id) % 256).toByte)
      // block-constant per column-block? not needed: features only need
      // SOME decode; use unit quant so pixel stats are deterministic
      MediaRecord(id, "image/jpeg", Jpeg.encodeGray(n, 8,
        blockRepeat(px, n, 8), quant = Jpeg.UnitQuant))
    }
    val feats = Multimodal.extractFeatures(
      sp.createDataset(recs), codec = JpegCodec).collect()
    assert(feats.length === 5)
    assert(feats.forall(f => f.n_bytes > 0))
  }

  /** Make the pixel buffer constant per 8×8 block so UnitQuant decodes
    * it exactly (value = first pixel of each block). */
  private def blockRepeat(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      out(y * w + x) = px(((y / 8) * 8) * w + ((x / 8) * 8))
    out
  }
}
