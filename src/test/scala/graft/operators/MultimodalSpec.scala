package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("multimodal-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def mediaDF = {
    implicit val s: SparkSession = spark
    val rows = (1L to 100L).map(i => (i, if (i % 2 == 0) "image" else "audio",
      Array.tabulate[Byte]((i % 17).toInt + 1)(j => ((i * 31 + j * 7) % 256).toByte)))
    Multimodal.pack(
      spark.createDataFrame(rows).toDF("media_id", "media_type", "payload"),
      "media_id", "media_type", "payload")
  }

  test("feature extraction is independent of batch size and partitioning") {
    val base = Multimodal.extractFeatures(mediaDF, batchSize = 64)
      .collect().sortBy(_.media_id).toSeq
    val small = Multimodal.extractFeatures(mediaDF.repartition(7), batchSize = 3)
      .collect().sortBy(_.media_id).toSeq
    assert(base == small)
    assert(base.size == 100)
  }

  test("histogram buckets sum to payload length; checksum matches md5") {
    val f = Multimodal.extractFeatures(mediaDF).collect()
    assert(f.forall(r => r.h0 + r.h1 + r.h2 + r.h3 == r.n_bytes))
    val one = f.find(_.media_id == 1L).get
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.tabulate[Byte](2)(j => ((31 + j * 7) % 256).toByte))
      .map("%02x".format(_)).mkString
    assert(one.checksum == expected)
  }

  test("a custom MediaCodec flows through extraction (decode is a real seam)") {
    // a codec that "decodes" by reversing bytes for images only — if the
    // seam were dead code, checksums/histograms would match the stub's
    object ReverseImageCodec extends MediaCodec {
      override def decode(mediaType: String, payload: Array[Byte]): Array[Byte] =
        if (mediaType == "image") payload.reverse else payload
    }
    val stub = Multimodal.extractFeatures(mediaDF).collect().map(f => f.media_id -> f).toMap
    val rev = Multimodal.extractFeatures(mediaDF, codec = ReverseImageCodec)
      .collect().map(f => f.media_id -> f).toMap
    val img = mediaDF.filter(col("media_type") === "image")
      .select(col("media_id")).collect().map(_.getLong(0))
    // audio untouched; image checksums differ (payloads >1 byte, non-palindromic)
    assert(rev.keySet == stub.keySet)
    assert(rev.filterNot(kv => img.contains(kv._1)) ==
      stub.filterNot(kv => img.contains(kv._1)))
    assert(img.exists(id => rev(id).checksum != stub(id).checksum))
    // histograms are order-invariant — reversal must preserve them
    assert(img.forall(id => (rev(id).h0, rev(id).h1, rev(id).h2, rev(id).h3) ==
      (stub(id).h0, stub(id).h1, stub(id).h2, stub(id).h3)))
  }

  test("extractFeatures through PngCodec computes stats over DECODED pixels") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val imgs = (1L to 20L).map { i =>
      val w = (i % 7).toInt + 2; val h = (i % 3).toInt + 1
      (i, Array.tabulate(w * h)(j => ((i * 53 + j * 17) % 256).toByte), w, h)
    }
    val media = imgs.map { case (id, px, w, h) =>
      (id, "image/png", Png.encodeGray(w, h, px, filter = (id % 5).toInt))
    }.toDF("media_id", "media_type", "payload")
    val feats = Multimodal
      .extractFeatures(Multimodal.pack(media, "media_id", "media_type", "payload"),
        codec = PngCodec)
      .collect().map(f => f.media_id -> f).toMap
    imgs.foreach { case (id, px, _, _) =>
      val f = feats(id)
      assert(f.n_bytes === px.length, s"img $id decoded size")
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(px)
        .map("%02x".format(_)).mkString
      assert(f.checksum === md5, s"img $id: features not over decoded pixels")
      assert(f.h0 + f.h1 + f.h2 + f.h3 === px.length)
    }
  }

  test("frame sampling windows the decoded buffer deterministically") {
    val buf = Array.tabulate[Byte](100)(_.toByte)
    val frames = Multimodal.sampleFrames(buf, frameSize = 10, stride = 30)
    assert(frames.map(_.toSeq) == Seq(
      (0 until 10).map(_.toByte), (30 until 40).map(_.toByte),
      (60 until 70).map(_.toByte), (90 until 100).map(_.toByte)))
  }

  test("resize truncates or zero-pads") {
    assert(Multimodal.resizeStub(Array[Byte](1, 2, 3), 2).toSeq == Seq[Byte](1, 2))
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 4).toSeq == Seq[Byte](1, 2, 0, 0))
  }

  test("nearest-neighbor resize: identity, downsample mapping, upsample repeat, channels") {
    // identity: same dims return the same pixels
    val img4 = Array.tabulate[Byte](16)(_.toByte) // 4x4 grey
    assert(Multimodal.resizeNearest(img4, 4, 4, 1, 4, 4).toSeq === img4.toSeq)
    // 4x4 -> 2x2: source pixel (floor(x*4/2), floor(y*4/2)) = (0,0),(2,0),(0,2),(2,2)
    assert(Multimodal.resizeNearest(img4, 4, 4, 1, 2, 2).toSeq ===
      Seq[Byte](0, 2, 8, 10))
    // 2x1 -> 6x1 upsample: each source pixel repeats 3x
    assert(Multimodal.resizeNearest(Array[Byte](7, 9), 2, 1, 1, 6, 1).toSeq ===
      Seq[Byte](7, 7, 7, 9, 9, 9))
    // RGB channels move together: 2x1 RGB -> 4x1 keeps triplets intact
    val rgb = Array[Byte](1, 2, 3, 4, 5, 6)
    assert(Multimodal.resizeNearest(rgb, 2, 1, 3, 4, 1).toSeq ===
      Seq[Byte](1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6))
    // buffer/dims mismatch and degenerate outputs fail loudly
    assert(intercept[IllegalArgumentException] {
      Multimodal.resizeNearest(img4, 5, 4, 1, 2, 2)
    }.getMessage.contains("pixel buffer"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.resizeNearest(img4, 4, 4, 1, 0, 2)
    }.getMessage.contains("output dims"))
  }

  test("nearest-neighbor resize rejects outputs beyond a JVM array with a clear message") {
    val msg = intercept[IllegalArgumentException] {
      Multimodal.resizeNearest(Array[Byte](0, 0, 0), 1, 1, 3, 50000, 50000)
    }.getMessage
    assert(msg.contains("resized buffer"), s"wrong failure: $msg")
  }

  test("pcm16 features: hand-computed samples, negative peaks, odd trailing byte ignored") {
    val sp = spark; import sp.implicits._
    // big-endian pairs: (0x01,0x00)=256, (0x80,0x00)=-32768, (0x00,0x7F)=127,
    // trailing 0x55 ignored
    val payload = Array[Byte](0x01, 0x00, 0x80.toByte, 0x00, 0x00, 0x7F, 0x55)
    val ds = Seq(MediaRecord(1L, "audio/pcm", payload)).toDS()
    val r = Multimodal.pcm16Features(ds).collect().head
    assert(r.getInt(1) === 3, "sample count")
    assert(r.getLong(2) === 256L * 256 + 32768L * 32768 + 127L * 127, "sum_sq")
    assert(r.getInt(3) === 32768, "peak must be |−32768|")
    // empty payload: zero samples, zero stats
    val z = Multimodal.pcm16Features(
      Seq(MediaRecord(2L, "audio/pcm", Array.emptyByteArray)).toDS()).collect().head
    assert(z.getInt(1) === 0 && z.getLong(2) === 0L && z.getInt(3) === 0)
  }

  test("dHash64: gradient saturates, reverse gradient zeroes, grey==replicated-RGB, rescale-invariant") {
    def gradient(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => ((i % w) * 255 / (w - 1)).toByte)
    // strictly increasing rows -> every right neighbor is brighter ->
    // all 64 bits set
    assert(Multimodal.dHash64(gradient(32, 32), 32, 32, 1) === -1L)
    // the same image at 2x resolution hashes identically (the point of
    // a perceptual hash)
    assert(Multimodal.dHash64(gradient(64, 64), 64, 64, 1) === -1L)
    // reverse gradient: no bit set
    val rev = gradient(32, 32).reverse
    assert(Multimodal.dHash64(rev, 32, 32, 1) === 0L)
    // a 3-channel image with all channels equal hashes like its grey twin
    val g = gradient(16, 16)
    val rgb = Array.tabulate(16 * 16 * 3)(i => g(i / 3))
    assert(Multimodal.dHash64(rgb, 16, 16, 3) === Multimodal.dHash64(g, 16, 16, 1))
  }

  test("imageNearDupPairs: re-encoded/rescaled images pair, distinct images do not") {
    val sp = spark; import sp.implicits._
    def gradient(w: Int, h: Int): Array[Byte] =
      Array.tabulate(w * h)(i => ((i % w) * 255 / (w - 1)).toByte)
    // D = gradient with a flattened patch: sample column 14 copies
    // column 10 for the top half -> bit x=3 clears in output rows 0-3,
    // hamming 4 to the clean gradient
    val dented = {
      val px = gradient(32, 32)
      for (y <- 0 until 16) px(y * 32 + 14) = px(y * 32 + 10)
      px
    }
    val recs = Seq(
      MediaRecord(1L, "image/png", Png.encodeGray(32, 32, gradient(32, 32), filter = 0)),
      // same image: 2x resolution AND a different scanline filter (re-encoded)
      MediaRecord(2L, "image/png", Png.encodeGray(64, 64, gradient(64, 64), filter = 4)),
      MediaRecord(3L, "image/png", Png.encodeGray(32, 32, gradient(32, 32).reverse, filter = 1)),
      MediaRecord(4L, "image/png", Png.encodeGray(32, 32, dented, filter = 2)),
      MediaRecord(5L, "text/plain", "not a png at all".getBytes("US-ASCII"))).toDS()
    val pairs = Multimodal.imageNearDupPairs(recs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.keySet === Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"wrong pair set: $pairs")
    assert(pairs((1L, 2L)) === 0, "rescaled+re-encoded twin must hash identically")
    assert(pairs((1L, 4L)) === 4, "dented twin should differ in exactly 4 bits")
    // non-PNG payloads are skipped, not crashed on
    assert(Multimodal.imageDHash(recs).count() === 4)
  }

  test("audioNearDupPairs: amplitude-scaled copies pair at hamming 0, " +
      "one flipped envelope step costs exactly one bit, reversed " +
      "envelopes never pair, short assets are skipped") {
    val sp = spark; import sp.implicits._
    // PCM16 big-endian, constant within each 2-sample segment: the
    // segment-sum direction sequence IS the hash
    def pcm(f: Int => Int): Array[Byte] = {
      val out = new Array[Byte](65 * 2 * 2)
      for (seg <- 0 until 65; j <- 0 until 2) {
        val v = f(seg)
        out(2 * (seg * 2 + j)) = ((v >> 8) & 0xFF).toByte
        out(2 * (seg * 2 + j) + 1) = (v & 0xFF).toByte
      }
      out
    }
    val rising = (i: Int) => 10 + i
    // swap segments 30/31's levels: only the (30,31) comparison flips
    val oneFlip = (i: Int) =>
      if (i == 30) 41 else if (i == 31) 40 else 10 + i
    val recs = Seq(
      MediaRecord(1L, "audio/pcm", pcm(rising)),
      MediaRecord(2L, "audio/pcm", pcm(i => 2 * rising(i))), // scaled copy
      MediaRecord(3L, "audio/pcm", pcm(oneFlip)),
      MediaRecord(4L, "audio/pcm", pcm(i => 100 - i)),       // reversed
      MediaRecord(5L, "audio/pcm", pcm(rising).take(100))    // < 65 samples
    ).toDS()
    val pairs = Multimodal.audioNearDupPairs(recs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"wrong pair set: $pairs")
    assert(pairs((1L, 2L)) === 0, "amplitude scaling must preserve the hash")
    assert(pairs((1L, 3L)) === 1, "one flipped step must cost exactly one bit")
    // the reversed envelope is the all-zeros hash: hamming 64 to rising
    assert(Multimodal.audioEnvelopeHash(recs).count() === 4,
      "assets under 65 samples have no contour and must be skipped")
    // reshuffle determinism
    val again = Multimodal.audioNearDupPairs(
        recs.repartition(7), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(again === pairs)
    // empty input: empty output with the right schema
    val empty = Multimodal.audioNearDupPairs(
      sp.emptyDataset[MediaRecord], maxHamming = 6)
    assert(empty.columns.toSeq === Seq("id1", "id2", "hamming"))
    assert(empty.count() === 0L)
  }

  test("metadata-only queries do not deserialize the payload") {
    val meta = mediaDF.toDF().select(col("media_id"), col("media_type"))
    assert(meta.filter(col("media_type") === "image").count() == 50)
  }

  test("tileStats: exact tile grid, edge tiles smaller, sums cover the image") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // 16×5 uniform grey 77: tiles 8×3 -> grid 2×2, bottom tiles 8×2
    val px = Array.fill[Byte](16 * 5)(77)
    val ds = s.createDataset(Seq(
      MediaRecord(1L, "image/png", Png.encodeGray(16, 5, px, filter = 2)),
      MediaRecord(2L, "text/plain", Array[Byte](1, 2, 3)))) // non-PNG skips
    val rows = Multimodal.tileStats(ds, tileW = 8, tileH = 3)
      .collect().map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)),
        (r.getInt(3), r.getLong(4)))).toMap
    assert(rows.keySet === Set((1L, 0, 0), (1L, 1, 0), (1L, 0, 1), (1L, 1, 1)))
    assert(rows((1L, 0, 0)) === ((24, 24L * 77)))
    assert(rows((1L, 1, 0)) === ((24, 24L * 77)))
    assert(rows((1L, 0, 1)) === ((16, 16L * 77))) // edge: 8×2
    assert(rows((1L, 1, 1)) === ((16, 16L * 77)))
    assert(rows.values.map(_._1).sum === 16 * 5, "tiles must cover every pixel once")
  }

  test("pcm16ResampleLinear: identity at 1/1, hand-computed 3/2 upsample, decimation parity") {
    implicit val s: SparkSession = spark
    import s.implicits._
    // samples: 100, -200, 300 (big-endian PCM16)
    def be(v: Int): Seq[Byte] =
      Seq((((v & 0xFFFF) >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val payload = (be(100) ++ be(-200) ++ be(300)).toArray
    val ds = s.createDataset(Seq(MediaRecord(1L, "audio/pcm", payload)))
    // identity: n_out = n, values scaled by 1
    val id1 = Multimodal.pcm16ResampleLinear(ds, 1, 1).collect().head
    assert((id1.getInt(1), id1.getLong(2), id1.getLong(3)) === ((3, 200L, 300L)))
    // 3/2: positions j*2/3 for j=0..3 -> src 0, 2/3, 4/3, 2
    //   j=0: s0*3 = 300 ; j=1: s0*1 + s1*2 = 100 - 400 = -300
    //   j=2: s1*2 + s2*1 = -400 + 300 = -100 ; j=3: s2*3 = 900
    val up = Multimodal.pcm16ResampleLinear(ds, 3, 2).collect().head
    assert((up.getInt(1), up.getLong(2), up.getLong(3)) ===
      ((4, (300L - 300L - 100L + 900L), 900L)))
    // 1/den is exact decimation: matches pcm16Decimate's kept count
    val longPay = (0 until 20).flatMap(i => be(i * 37 - 300)).toArray
    val ds2 = s.createDataset(Seq(MediaRecord(2L, "audio/pcm", longPay)))
    val down = Multimodal.pcm16ResampleLinear(ds2, 1, 3).collect().head
    val dec = Multimodal.pcm16Decimate(ds2, 3).collect().head
    assert(down.getInt(1) === dec.getInt(1), "1/den must keep every den-th sample")
    assert(down.getLong(3) === dec.getInt(3).toLong, "peaks must agree (scale 1)")
    // empty payload: total function, zero row
    val e = Multimodal.pcm16ResampleLinear(
      s.createDataset(Seq(MediaRecord(3L, "audio/pcm", Array.emptyByteArray))), 3, 2)
      .collect().head
    assert((e.getInt(1), e.getLong(2), e.getLong(3)) === ((0, 0L, 0L)))
  }

  test("byteHistogram: degenerate payload has entropy 0, uniform payload has log2(bins)") {
    val s = spark
    import s.implicits._
    // 1: 64 copies of byte 0x41 (bin 4); 2: one byte per bin value 0..255
    // (16 bytes per bin -> uniform over 16 bins -> 4.0 bits); 3: empty
    val ds = s.createDataset(Seq(
      MediaRecord(1L, "bin", Array.fill(64)(0x41.toByte)),
      MediaRecord(2L, "bin", (0 until 256).map(_.toByte).toArray),
      MediaRecord(3L, "bin", Array.emptyByteArray)))
    val got = Multimodal.byteHistogram(ds, bins = 16).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got((1L, 4)) === ((64L, 64L, 0.0)))
    assert(got.keys.count(_._1 == 1L) === 1, "single-bin payload: one row")
    val twoRows = got.filter(_._1._1 == 2L)
    assert(twoRows.size === 16 && twoRows.values.forall(_ === ((16L, 256L, 4.0))))
    assert(!got.keys.exists(_._1 == 3L), "empty payload emits no rows")
    // bins must divide 256
    intercept[IllegalArgumentException] { Multimodal.byteHistogram(ds, bins = 10) }
  }

  test("byteHistogram entropy is repartition-deterministic on real payloads") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", lit("bin").as("mt"),
        encode($"text", "US-ASCII").as("payload"))
    def run(parts: Int) = Multimodal.byteHistogram(
        Multimodal.pack(docs.repartition(parts), "doc_id", "mt", "payload")(s))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
      .sortBy(x => (x._1, x._2))
    val a = run(1)
    assert(a.nonEmpty && a.toSeq === run(7).toSeq)
    // entropies vary across docs and stay within (0, 8]
    val ents = a.map(_._4).distinct
    assert(ents.size > 1 && ents.forall(h => h >= 0.0 && h <= 8.0))
  }

  test("imageEdgeStats: hand Sobel on a step edge; flat image is zero") {
    val sp = spark; import sp.implicits._
    // 4x3 vertical step: columns 0,1 = 0; columns 2,3 = 255 (each row)
    val step = Array.tabulate(12)(i => if (i % 4 >= 2) 255.toByte else 0.toByte)
    val flat = Array.fill(12)(9.toByte)
    val tiny = Array.fill(4)(1.toByte) // 2x2: no interior, no row
    val ds = Seq(
      MediaRecord(1L, "image/png", Png.encodeGray(4, 3, step, filter = 3)),
      MediaRecord(2L, "image/png", Png.encodeGray(4, 3, flat, filter = 0)),
      MediaRecord(3L, "image/png", Png.encodeGray(2, 2, tiny, filter = 1)),
      MediaRecord(4L, "text/plain", "nope".getBytes("US-ASCII"))).toDS()
    val out = Multimodal.imageEdgeStats(ds).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // interior = (x,y) in {1,2}x{1}: both pixels see gx = 4*255 = 1020,
    // gy = 0 (rows identical) -> energy 2040, max 1020
    assert(out(1L) === ((4, 3, 2L, 2040L, 1020L)))
    assert(out(2L) === ((4, 3, 2L, 0L, 0L)))
    assert(!out.contains(3L) && !out.contains(4L))
  }

  test("mu-law: exhaustive G.711 properties over all 65536 samples") {
    var maxErr = 0
    var worst = 0
    val codes = new Array[Boolean](256)
    var x = Short.MinValue.toInt
    while (x <= Short.MaxValue.toInt) {
      val s = x.toShort
      val c = Multimodal.mulawEncode(s)
      codes(c & 0xFF) = true
      val r = Multimodal.mulawDecode(c)
      // idempotence at the VALUE level: re-encoding the reconstruction
      // reproduces it exactly. (Code-level idempotence is false by
      // design at one point: mu-law has two zeros — negative inputs in
      // (-8, 0) encode to 0x7F "-0", which decodes to 0 and re-encodes
      // as 0xFF "+0" — the standard's documented wrinkle.)
      assert(Multimodal.mulawDecode(Multimodal.mulawEncode(r)) === r,
        s"non-idempotent at $x")
      // sign symmetry on the reconstruction (clip makes |x| asymmetric
      // only at the extremes, where both sides clip to the same code)
      val err = math.abs(x - r.toInt)
      if (err > maxErr) { maxErr = err; worst = x }
      // G.711 top segment (e = 7) quantizes in steps of 2^10: the
      // roundtrip error never exceeds one step
      assert(err <= 1024, s"error $err at $x")
      x += 1
    }
    // all 256 code words are reachable (the companding covers the byte)
    assert(codes.forall(identity), "unreachable mu-law code word")
    // small samples quantize finely: segment 0 (|x| <= 123 after the
    // +132 bias) steps by 8 -> |err| <= 4; the 124..127 tail crosses
    // into segment 1 (step 16) -> <= 8
    (-127 to 127).foreach { v =>
      val r = Multimodal.mulawDecode(Multimodal.mulawEncode(v.toShort))
      val cap = if (math.abs(v) <= 123) 4 else 8
      assert(math.abs(v - r) <= cap, s"coarse at $v")
    }
    // sign symmetry away from the clip region
    (0 to 32000 by 37).foreach { v =>
      val p = Multimodal.mulawDecode(Multimodal.mulawEncode(v.toShort)).toInt
      val n = Multimodal.mulawDecode(Multimodal.mulawEncode((-v).toShort)).toInt
      assert(n === -p, s"asymmetric at $v: $p vs $n")
    }
    assert(maxErr > 0, s"suspiciously lossless (worst at $worst)")
  }
}
