package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The BMP codec's hardening gates, mirroring PngSpec's discipline:
  * roundtrip exactness across padding widths, top-down variant parity,
  * ImageIO cross-validation, loud rejection of everything outside the
  * 24-bit uncompressed profile, and the fuzz contract (valid Image or
  * IllegalArgumentException — never an index/negative-size error). */
class BmpSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 131 + 7) % 256).toByte)

  test("roundtrip is exact for every row-padding class and multi-row shapes") {
    for (w <- 1 to 9; h <- Seq(1, 2, 5)) {
      val px = gray(w, h)
      val img = Bmp.decode(Bmp.encodeGray24(w, h, px))
      assert(img.width === w && img.height === h)
      assert(img.pixels.toSeq === px.toSeq, s"roundtrip diverged at ${w}x$h")
    }
  }

  test("top-down BMP (negative height) decodes to the same image flipped back") {
    val (w, h) = (5, 4)
    val px = gray(w, h)
    val up = Bmp.encodeGray24(w, h, px)
    // flip the stored rows and negate the height: a top-down file with
    // identical image content
    val rowSize = (w * 3 + 3) & ~3
    val down = up.clone()
    for (s <- 0 until h; i <- 0 until rowSize)
      down(54 + s * rowSize + i) = up(54 + (h - 1 - s) * rowSize + i)
    down(22) = (-h & 0xFF).toByte; down(23) = ((-h >> 8) & 0xFF).toByte
    down(24) = ((-h >> 16) & 0xFF).toByte; down(25) = ((-h >> 24) & 0xFF).toByte
    val img = Bmp.decode(down)
    assert(img.height === h && img.pixels.toSeq === px.toSeq)
  }

  test("ImageIO cross-validation: the JDK decodes our bytes to the same pixels, and we decode ImageIO's") {
    val (w, h) = (7, 3)
    val px = gray(w, h)
    val ours = Bmp.encodeGray24(w, h, px)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(jdk != null && jdk.getWidth === w && jdk.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((jdk.getRGB(x, y) & 0xFF) === (px(y * w + x) & 0xFF),
        s"JDK disagreed at ($x,$y)")
    // and the reverse: a JDK-written 24-bit BMP decodes to matching luma
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", out))
    val dec = Bmp.decode(out.toByteArray)
    assert(dec.width === w && dec.height === h &&
      dec.pixels.toSeq === px.toSeq)
  }

  test("luma of a color pixel is the integer (r+g+b)/3") {
    // hand-build a 1x1 24-bit BMP with B=10, G=20, R=33 -> luma 21
    val one = Bmp.encodeGray24(1, 1, Array[Byte](0))
    one(54) = 10; one(55) = 20; one(56) = 33
    assert((Bmp.decode(one).pixels(0) & 0xFF) === 21)
  }

  test("everything outside the 24-bit uncompressed profile is rejected loudly") {
    val ok = Bmp.encodeGray24(4, 2, gray(4, 2))
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val m = ok.clone(); f(m); m
    }
    // 8-bit palette profile
    intercept[IllegalArgumentException](
      Bmp.decode(mutated(m => m(28) = 8)))
    // RLE compression
    intercept[IllegalArgumentException](
      Bmp.decode(mutated(m => m(30) = 1)))
    // truncated pixel array
    intercept[IllegalArgumentException](
      Bmp.decode(ok.dropRight(5)))
    // header-only file
    intercept[IllegalArgumentException](Bmp.decode(ok.take(30)))
    // pixel offset pointing past the file
    intercept[IllegalArgumentException](
      Bmp.decode(mutated(m => { m(10) = -1; m(11) = -1 })))
    // allocation bomb: gigapixel dims in a 54-byte header
    intercept[IllegalArgumentException] {
      val bomb = ok.clone()
      bomb(18) = -1; bomb(19) = -1; bomb(20) = 0x7F.toByte
      Bmp.decode(bomb)
    }
    // zero height / Int.MinValue height
    intercept[IllegalArgumentException](
      Bmp.decode(mutated(m => { m(22) = 0; m(23) = 0; m(24) = 0; m(25) = 0 })))
    intercept[IllegalArgumentException](
      Bmp.decode(mutated(m => { m(22) = 0; m(23) = 0; m(24) = 0
        m(25) = 0x80.toByte })))
  }

  test("fuzz: random mutations never escape the decoder contract") {
    val ok = Bmp.encodeGray24(9, 4, gray(9, 4))
    val rnd = new scala.util.Random(42)
    var decoded = 0
    for (_ <- 1 to 500) {
      val m = ok.clone()
      for (_ <- 1 to rnd.nextInt(4)) // 0-3 flips; 0 keeps some greens
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      try { Bmp.decode(m); decoded += 1 }
      catch { case _: IllegalArgumentException => }
    }
    assert(decoded >= 1, "every unmutated-equivalent decode failed — fuzz harness broken")
  }

  test("BmpCodec sniffs the magic and passes other payloads through") {
    val px = gray(3, 2)
    assert(BmpCodec.decode("image/bmp",
      Bmp.encodeGray24(3, 2, px)).toSeq === px.toSeq)
    val raw = Array[Byte](1, 2, 3)
    assert(BmpCodec.decode("application/octet-stream", raw).toSeq === raw.toSeq)
  }
}
