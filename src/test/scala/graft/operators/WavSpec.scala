package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class WavSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("wav-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def be(samples: Short*): Array[Byte] =
    samples.flatMap(s =>
      Seq(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)).toArray

  test("encode/decode roundtrip preserves rate, channels, and samples") {
    val pcm = be(0, 1, -1, 32767, -32768, 12345)
    val wav = Wav.encode(44100, 2, pcm)
    assert(Wav.isWav(wav))
    val a = Wav.decode(wav)
    assert(a.sampleRate === 44100 && a.channels === 2 && a.nSamples === 6)
    assert(a.samplesBE.toSeq === pcm.toSeq)
  }

  test("decode skips unknown chunks and honors RIFF odd-size padding") {
    val pcm = be(7, -9)
    val base = Wav.encode(8000, 1, pcm)
    // splice a 3-byte LIST chunk (odd size -> one pad byte) between
    // fmt and data
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    // fix the RIFF size for the added bytes
    val total = spliced.length - 8
    spliced(4) = (total & 0xFF).toByte
    spliced(5) = ((total >> 8) & 0xFF).toByte
    val a = Wav.decode(spliced)
    assert(a.sampleRate === 8000 && a.samplesBE.toSeq === pcm.toSeq)
  }

  test("malformed files fail loudly, never decode wrong samples") {
    val good = Wav.encode(16000, 1, be(1, 2, 3))
    // bad magic
    assertThrows[IllegalArgumentException](Wav.decode("nope".getBytes))
    // truncated data chunk
    assertThrows[IllegalArgumentException](Wav.decode(good.dropRight(2)))
    // non-PCM format code
    val ieee = good.clone(); ieee(20) = 3
    assertThrows[IllegalArgumentException](Wav.decode(ieee))
    // 8-bit samples
    val b8 = good.clone(); b8(34) = 8; b8(32) = 1
    assertThrows[IllegalArgumentException](Wav.decode(b8))
    // data before fmt: swap the chunk order by building manually
    val noFmt = good.take(12) ++ good.drop(36)
    val tot = noFmt.length - 8
    noFmt(4) = (tot & 0xFF).toByte; noFmt(5) = ((tot >> 8) & 0xFF).toByte
    assertThrows[IllegalArgumentException](Wav.decode(noFmt))
    // declared-sample bomb: lie the data size huge
    val bomb = good.clone()
    bomb(40) = 0; bomb(41) = 0; bomb(42) = 0; bomb(43) = 0x7F.toByte
    assertThrows[IllegalArgumentException](Wav.decode(bomb))
  }

  test("pcm16 kernels over WavCodec match the raw-PCM run exactly") {
    val sp = spark; import sp.implicits._
    val pcm1 = be(100, -200, 300, -400, 500)
    val pcm2 = be(-32768, 32767)
    val raw = sp.createDataset(Seq(
      MediaRecord(1L, "audio/pcm", pcm1), MediaRecord(2L, "audio/pcm", pcm2)))
    val wrapped = sp.createDataset(Seq(
      MediaRecord(1L, "audio/wav", Wav.encode(44100, 1, pcm1)),
      MediaRecord(2L, "audio/wav", Wav.encode(8000, 1, pcm2))))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).sortBy(_._1).toSeq
    assert(rows(Multimodal.pcm16Features(wrapped, WavCodec)) ===
      rows(Multimodal.pcm16Features(raw)))
    // the sniffing codec peels WAV too (mixed-media column shape)
    assert(rows(Multimodal.pcm16Features(wrapped, SniffCodec)) ===
      rows(Multimodal.pcm16Features(raw)))
  }
}
