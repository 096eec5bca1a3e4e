package graft.operators

/** Pure-JVM RIFF/WAVE (WAV) container codec for 16-bit PCM — the audio
  * sibling of [[Png]]/[[Jpeg]]: crawl corpora carry audio as WAV far
  * more often than raw sample dumps, and the PCM16 kernel family
  * ([[Multimodal.pcm16Features]] etc.) needs the container peeled off
  * first. Follows the same untrusted-bytes contract as the image
  * codecs: strict header validation, declared-size-vs-actual checks,
  * allocation bomb caps, and LOUD failure on anything unsupported —
  * wrong samples are never silently produced.
  *
  * Format per the public RIFF/WAVE layout (Microsoft/IBM 1991;
  * multimedia programming interface spec): little-endian `RIFF` form
  * with form type `WAVE`, a mandatory `fmt ` chunk (PCM: audioFormat 1,
  * bits 16) preceding the single `data` chunk; unknown chunks (LIST,
  * fact, cue…) are skipped via their declared size, odd-sized chunks
  * carry one pad byte (RIFF word alignment).
  *
  * WAV stores samples LITTLE-endian; the kernel family reads signed
  * BIG-endian 16-bit buffers — [[decode]] returns the byte-swapped BE
  * buffer so every existing PCM operator runs over WAV payloads
  * unchanged (that swap is the whole point of the codec seam).
  */
object Wav {

  /** Max samples a declared data chunk may expand to (bomb cap):
    * 2^26 samples = 128 MiB of 16-bit audio per record. */
  val MaxSamples: Int = 1 << 26

  /** Decoded audio: `samplesBE` is the signed big-endian 16-bit sample
    * buffer (channel-interleaved, as stored), ready for the
    * [[Multimodal]] PCM16 kernels. */
  final case class Audio(sampleRate: Int, channels: Int,
      samplesBE: Array[Byte]) {
    def nSamples: Int = samplesBE.length / 2
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E'

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

  /** Parse a 16-bit PCM WAV; every malformation throws
    * IllegalArgumentException with the offending detail. */
  def decode(wav: Array[Byte]): Audio = {
    require(isWav(wav), "not a RIFF/WAVE file (bad magic)")
    val riffSize = u32le(wav, 4)
    // RIFF size counts everything after its own 8-byte header; a lying
    // size is the container-level truncation/bomb signal
    require(riffSize >= 4 && riffSize <= wav.length - 8,
      s"RIFF size $riffSize inconsistent with ${wav.length} actual bytes")
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var data: Array[Byte] = null
    while (pos + 8 <= wav.length && data == null) {
      val id = new String(wav, pos, 4, "US-ASCII")
      val size = u32le(wav, pos + 4)
      val body = pos + 8
      require(size <= wav.length - body,
        s"chunk '$id' declares $size bytes but only ${wav.length - body} remain")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short ($size bytes)")
          val audioFormat = u16le(wav, body)
          require(audioFormat == 1,
            s"unsupported audio format $audioFormat (only PCM=1)")
          channels = u16le(wav, body + 2)
          require(channels >= 1 && channels <= 8, s"bad channel count $channels")
          sampleRate = u32le(wav, body + 4).toInt
          require(sampleRate >= 1 && sampleRate <= 1000000,
            s"bad sample rate $sampleRate")
          val bits = u16le(wav, body + 14)
          require(bits == 16, s"unsupported bits per sample $bits (only 16)")
          val blockAlign = u16le(wav, body + 12)
          require(blockAlign == channels * 2,
            s"block align $blockAlign != channels*2 (${channels * 2})")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          require(size % 2 == 0, s"odd data chunk size $size for 16-bit PCM")
          require(size / 2 <= MaxSamples,
            s"data chunk declares ${size / 2} samples > cap $MaxSamples")
          // byte-swap LE -> BE for the kernel family
          val n = size.toInt
          val be = new Array[Byte](n)
          var i = 0
          while (i < n) {
            be(i) = wav(body + i + 1)
            be(i + 1) = wav(body + i)
            i += 2
          }
          data = be
        case _ => // LIST/fact/cue/...: skip via declared size
      }
      pos = body + size.toInt + (size.toInt & 1) // RIFF word alignment pad
    }
    require(data != null, "no data chunk found")
    Audio(sampleRate, channels, data)
  }

  /** Build a canonical PCM16 WAV around a BIG-endian sample buffer (the
    * kernel family's byte order): RIFF + 16-byte fmt + data, samples
    * byte-swapped to the container's little-endian order. Exact inverse
    * of [[decode]] for supported shapes. */
  def encode(sampleRate: Int, channels: Int, samplesBE: Array[Byte]): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate <= 1000000, s"bad sample rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"bad channel count $channels")
    require(samplesBE.length % 2 == 0, "sample buffer must hold whole 16-bit samples")
    val n = samplesBE.length
    val out = new Array[Byte](44 + n)
    def putStr(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    putStr(0, "RIFF"); put32(4, 36L + n); putStr(8, "WAVE")
    putStr(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, channels); put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * channels * 2) // byte rate
    put16(34, 16); put16(32, channels * 2) // bits, block align
    putStr(36, "data"); put32(40, n.toLong)
    var i = 0
    while (i < n) { // BE -> LE
      out(44 + i) = samplesBE(i + 1)
      out(44 + i + 1) = samplesBE(i)
      i += 2
    }
    out
  }
}

/** [[MediaCodec]] backed by the [[Wav]] container parser: payloads
  * carrying the RIFF/WAVE magic decode to their big-endian PCM16 sample
  * buffer (so every [[Multimodal]] PCM kernel runs over WAV files
  * unchanged); anything else passes through. */
object WavCodec extends MediaCodec {
  override def decode(mediaType: String, payload: Array[Byte]): Array[Byte] =
    if (Wav.isWav(payload)) Wav.decode(payload).samplesBE else payload
}
