package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata. At 100 TB the
  * payload column dominates IO — keep it a single `binary` column so
  * Parquet stores it contiguously and column pruning can drop it when a
  * query touches only metadata. */
final case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte])

/** Extracted per-asset features (all deterministic). */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    checksum: String,
    h0: Long, h1: Long, h2: Long, h3: Long)

/** [[Multimodal.triageFeatures]] output: [[MediaFeatures]] plus the
  * decode outcome channel — `decode_ok=false` rows carry the codec's
  * loud error (truncated stream, bomb cap, unsupported frame type …)
  * with zeroed features, ready for dead-letter routing. */
final case class MediaTriageRow(
    media_id: Long,
    media_type: String,
    decode_ok: Boolean,
    error: String,
    n_bytes: Int,
    checksum: String,
    h0: Long, h1: Long, h2: Long, h3: Long)

/** Decoder seam for multimodal payloads: turns an encoded codec stream
  * (PNG, JPEG, PCM, H.264 …) into decoded sample bytes. Implementations
  * must be serializable shells — any native/heavy decoder state must be
  * created LAZILY on the executor (real codec handles are not
  * serializable), e.g. in a `@transient lazy val`. Two implementations
  * ship: [[PngCodec]] (a REAL pure-JDK PNG decoder — see [[Png]]) and
  * [[StubCodec]] (pass-through); an FFmpeg-backed implementation slots
  * in the same way without touching the pipeline. */
trait MediaCodec extends Serializable {
  /** Decode one asset's payload; `mediaType` selects the codec branch. */
  def decode(mediaType: String, payload: Array[Byte]): Array[Byte]
}

/** Deterministic stand-in codec: passes raw bytes through unchanged. The
  * surrounding plumbing treats the result exactly like decoded samples. */
object StubCodec extends MediaCodec {
  override def decode(mediaType: String, payload: Array[Byte]): Array[Byte] = payload
}

/** Multimodal-column plumbing: treat image/audio/video as opaque binary +
  * metadata, and run decode / feature-extract / frame-sample as
  * partition-local batched passes over a typed Dataset — the shape a real
  * codec integration uses (per-partition decoder init, batched decode,
  * columnar output). The decode step is an explicit [[MediaCodec]]
  * contract; everything around it — schema, encoders, partitioning,
  * batch iteration — is real and tested against [[StubCodec]].
  */
object Multimodal {

  /** Pack a DataFrame into the canonical media layout. */
  def pack(df: DataFrame, idCol: String, typeCol: String, payloadCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(typeCol).cast("string").as("media_type"),
      col(payloadCol).cast("binary").as("payload"))
      // null ids/payloads would NPE in the typed kernels downstream
      .filter(col("media_id").isNotNull && col("payload").isNotNull)
      .as[MediaRecord]
  }

  /** Deterministic "resize": truncate or zero-pad the decoded sample
    * buffer to `n` bytes (stands in for image resize / audio resample). */
  def resizeStub(decoded: Array[Byte], n: Int): Array[Byte] =
    if (decoded.length == n) decoded
    else java.util.Arrays.copyOf(decoded, n)

  /** REAL nearest-neighbor image resize over decoded interleaved pixels
    * (the fixed-resolution normalization step of every vision-training
    * pipeline). Source pixel for output (x, y) is
    * (floor(x·w/outW), floor(y·h/outH)) — integer arithmetic, so the
    * mapping is exact, deterministic, and expressible by any engine
    * (the m02 oracle recomputes it in SQL). Works for any channel
    * count; Long intermediates in the source mapping AND a Long bound
    * on the output allocation, so huge requested dimensions fail with
    * a clear message instead of wrapped Int index math. */
  def resizeNearest(pixels: Array[Byte], w: Int, h: Int, channels: Int,
      outW: Int, outH: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && channels >= 1, s"bad input dims ${w}x$h×$channels")
    require(outW >= 1 && outH >= 1, s"bad output dims ${outW}x$outH")
    require(pixels.length == w * h * channels,
      s"pixel buffer ${pixels.length} != ${w}x$h×$channels")
    // Long BEFORE allocation (same pattern as the Png decoder): the
    // requested output size is caller data and can overflow Int
    val outL = outW.toLong * outH * channels
    require(outL <= Int.MaxValue,
      s"resized buffer $outL B exceeds a JVM array (${outW}x$outH×$channels)")
    val out = new Array[Byte](outL.toInt)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * w / outW).toInt
        var c = 0
        while (c < channels) {
          out((y * outW + x) * channels + c) = pixels((sy * w + sx) * channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic frame sampling: every `stride`-th window of
    * `frameSize` bytes (stands in for video frame extraction). */
  def sampleFrames(decoded: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
    (0 until decoded.length by stride)
      .map(off => decoded.slice(off, math.min(off + frameSize, decoded.length)))

  /** PCM16 audio features: interpret the decoded payload as big-endian
    * signed 16-bit samples (the WAV/FLAC sample layout) and emit exact
    * integer statistics — sample count, energy (Σ sample², the exact
    * form of RMS: rms = sqrt(sum_sq / n)), and peak |sample|. Exact
    * integers rather than floats so the stats are engine-portable
    * bit-for-bit (no sqrt ulps); a trailing odd byte is ignored.
    * Same per-partition batched shape as [[extractFeatures]]. Output:
    * `(media_id, n_samples, sum_sq, peak)`. */
  def pcm16Features(ds: Dataset[MediaRecord],
      codec: MediaCodec = StubCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      var sumSq = 0L
      var peak = 0
      var i = 0
      while (i < n) {
        val s = (((decoded(2 * i) & 0xFF) << 8) | (decoded(2 * i + 1) & 0xFF)).toShort
        val a = math.abs(s.toInt)
        sumSq += s.toLong * s.toLong
        if (a > peak) peak = a
        i += 1
      }
      (rec.media_id, n, sumSq, peak)
    }).toDF("media_id", "n_samples", "sum_sq", "peak")
  }

  /** G.711 µ-LAW companding of one signed 16-bit sample (ITU-T G.711,
    * the public telephony standard: 8 logarithmic segments, 4-bit
    * mantissa, BIAS 0x84, clip 32635) — the codec every 8 kHz
    * telephony / call-center corpus arrives in. Pure integer bit
    * arithmetic: deterministic on any platform. */
  def mulawEncode(x: Short): Byte = {
    val sign = if (x < 0) 0x80 else 0x00
    var m = math.min(math.abs(x.toInt), 32635) + 132
    var e = 7
    var probe = 0x4000
    while (e > 0 && (m & probe) == 0) { e -= 1; probe >>= 1 }
    val mant = (m >> (e + 3)) & 0x0F
    (~(sign | (e << 4) | mant)).toByte
  }

  /** Inverse of [[mulawEncode]]: reconstructs the segment midpoint. */
  def mulawDecode(u: Byte): Short = {
    val c = ~u & 0xFF
    val e = (c >> 4) & 0x07
    val t = (((c & 0x0F) << 3) + 132) << e
    (if ((c & 0x80) != 0) 132 - t else t - 132).toShort
  }

  /** µ-law ROUNDTRIP QUALITY audit over PCM16 assets — the codec-loss
    * report a speech-data pipeline runs before committing a corpus to
    * 8-bit companded storage (µ-law halves audio bytes vs PCM16 at
    * telephony-transparent quality; this measures the actual error on
    * YOUR samples instead of trusting the standard's worst case). Per
    * asset: sample count, the exact integer Σ|x − dec(enc(x))| and
    * max |error|, and the peak input |sample| for scale. Same
    * per-partition batched kernel shape as [[pcm16Features]]; all
    * outputs exact integers, hash-portable. Output:
    * `(media_id, n_samples, sum_abs_err, max_abs_err, peak)`. */
  def pcm16MulawRoundtrip(ds: Dataset[MediaRecord],
      codec: MediaCodec = StubCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      var sumErr = 0L
      var maxErr = 0
      var peak = 0
      var i = 0
      while (i < n) {
        val s = (((decoded(2 * i) & 0xFF) << 8) |
          (decoded(2 * i + 1) & 0xFF)).toShort
        val r = mulawDecode(mulawEncode(s)).toInt
        val err = math.abs(s.toInt - r)
        sumErr += err
        if (err > maxErr) maxErr = err
        val a = math.abs(s.toInt)
        if (a > peak) peak = a
        i += 1
      }
      (rec.media_id, n, sumErr, maxErr, peak)
    }).toDF("media_id", "n_samples", "sum_abs_err", "max_abs_err", "peak")
  }

  /** FRAMED PCM16 features — the time-resolved sibling of
    * [[pcm16Features]] and the audio analogue of [[sampleFrames]]:
    * signed big-endian 16-bit samples split into frames of `frameSize`
    * samples every `stride` samples (overlapping when stride <
    * frameSize, like every speech front-end), one row per frame with
    * EXACT integer stats — energy `sum_sq`, `peak` = max |s|, and
    * `zero_crossings` = #{i : s_{i−1}·s_i < 0 within the frame} (the
    * classic voiced/unvoiced discriminator; strict sign flips only, so
    * it is pure integer arithmetic — a sample product magnitude caps at
    * 2³⁰, no overflow). rms = sqrt(sum_sq/n) stays the caller's one
    * float op. Map-only kernel (flatMap fan-out ∝ n/stride); frames
    * exist for every start < nSamples, the [[sampleFrames]] contract. */
  def pcm16FrameFeatures(ds: Dataset[MediaRecord], frameSize: Int, stride: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(frameSize >= 1 && stride >= 1, "frameSize and stride must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          (((decoded(2 * i) & 0xFF) << 8) | (decoded(2 * i + 1) & 0xFF)).toShort.toInt
        i += 1
      }
      val nFrames = if (n == 0) 0 else ((n - 1) / stride) + 1
      (0 until nFrames).iterator.map { f =>
        val from = f * stride
        val until = math.min(from + frameSize, n)
        var sumSq = 0L; var peak = 0; var zc = 0
        var j = from
        while (j < until) {
          val s = samples(j)
          sumSq += s.toLong * s.toLong
          val a = math.abs(s); if (a > peak) peak = a
          if (j > from && samples(j - 1) * s < 0) zc += 1
          j += 1
        }
        (rec.media_id, f, until - from, sumSq, peak, zc)
      }
    }).toDF("media_id", "frame_no", "n_samples", "sum_sq", "peak", "zero_crossings")
  }

  /** Energy-based activity segmentation (m12 — the silence-trim /
    * voice-activity preprocessing step of every audio-training
    * pipeline): frames from [[pcm16FrameFeatures]] are ACTIVE when
    * mean energy reaches `minEnergy` — the exact integer compare
    * `sum_sq ≥ minEnergy · n_samples`, no division — and consecutive
    * active frames merge into segments by gaps-and-islands
    * (`frame_no − row_number()` per asset). Output one row per segment:
    * `(media_id, seg_start, seg_end, n_frames, total_energy, peak)`,
    * all exact integers.
    *
    * Scale shape: the kernel stays the map-only frame pass; the window
    * partitions by media_id (one asset's frames — bounded by asset
    * length, never corpus-wide) and the final agg is key-partial. */
  def pcm16EnergySegments(ds: Dataset[MediaRecord], frameSize: Int,
      stride: Int, minEnergy: Long,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(minEnergy >= 0, "minEnergy must be non-negative")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_no"))
    pcm16FrameFeatures(ds, frameSize, stride, codec)
      .filter(col("sum_sq") >= lit(minEnergy) * col("n_samples"))
      .withColumn("_graft_grp", col("frame_no") - row_number().over(w))
      .groupBy(col("media_id"), col("_graft_grp"))
      .agg(min(col("frame_no")).as("seg_start"),
        max(col("frame_no")).as("seg_end"),
        count(lit(1)).cast("int").as("n_frames"),
        sum(col("sum_sq")).cast("long").as("total_energy"),
        max(col("peak")).as("peak"))
      .drop("_graft_grp")
  }

  /** [[pcm16EnergySegments]] as a pure per-record kernel — segments of
    * one asset depend only on that asset's own frames, so the whole
    * gaps-and-islands merge runs inside the map over each record: no
    * window, no shuffle, no state. That makes it STREAM-CAPABLE (the
    * batch twin's window is unsupported in append-mode streaming) and
    * the batch spec pins kernel ≡ relational row-for-row. */
  def pcm16EnergySegmentsKernel(ds: Dataset[MediaRecord], frameSize: Int,
      stride: Int, minEnergy: Long,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(frameSize >= 1 && stride >= 1, "frameSize and stride must be positive")
    require(minEnergy >= 0, "minEnergy must be non-negative")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          (((decoded(2 * i) & 0xFF) << 8) | (decoded(2 * i + 1) & 0xFF)).toShort.toInt
        i += 1
      }
      val nFrames = if (n == 0) 0 else ((n - 1) / stride) + 1
      val segs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Int, Int, Int, Long, Int)]
      var segStart = -1; var segFrames = 0; var segEnergy = 0L; var segPeak = 0
      var prevActive = -2 // last ACTIVE frame index; -2 = none
      var f = 0
      while (f < nFrames) {
        val from = f * stride
        val until = math.min(from + frameSize, n)
        var sumSq = 0L; var peak = 0
        var j = from
        while (j < until) {
          val s = samples(j)
          sumSq += s.toLong * s.toLong
          val a = math.abs(s); if (a > peak) peak = a
          j += 1
        }
        if (sumSq >= minEnergy * (until - from)) {
          if (prevActive != f - 1) { // gap: flush the open segment
            if (segStart >= 0)
              segs += ((rec.media_id, segStart, prevActive, segFrames,
                segEnergy, segPeak))
            segStart = f; segFrames = 0; segEnergy = 0L; segPeak = 0
          }
          segFrames += 1; segEnergy += sumSq
          if (peak > segPeak) segPeak = peak
          prevActive = f
        }
        f += 1
      }
      if (segStart >= 0)
        segs += ((rec.media_id, segStart, prevActive, segFrames,
          segEnergy, segPeak))
      segs.iterator
    }).toDF("media_id", "seg_start", "seg_end", "n_frames",
      "total_energy", "peak")
  }

  /** 64-bit difference hash (dHash — the standard perceptual-hash
    * recipe for image near-dup detection): greyscale, nearest-resize to
    * 9×8, then bit `y·8 + x` is set iff pixel (x, y) is darker than its
    * right neighbor. Resize + comparisons make the hash invariant to
    * re-encoding and (approximately) to rescaling — the image analogue
    * of the text SimHash. Greyscale is the integer mean of the first
    * min(channels, 3) samples (alpha ignored); all arithmetic is
    * integer, so the hash is engine-portable bit-for-bit. */
  def dHash64(pixels: Array[Byte], w: Int, h: Int, channels: Int): Long = {
    require(w >= 1 && h >= 1 && channels >= 1, s"bad dims ${w}x$h×$channels")
    require(pixels.length == w * h * channels,
      s"pixel buffer ${pixels.length} != ${w}x$h×$channels")
    val cc = math.min(channels, 3)
    val gray =
      if (channels == 1) pixels
      else {
        val g = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          var s = 0
          var c = 0
          while (c < cc) { s += pixels(i * channels + c) & 0xFF; c += 1 }
          g(i) = (s / cc).toByte
          i += 1
        }
        g
      }
    val rs = resizeNearest(gray, w, h, 1, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((rs(y * 9 + x) & 0xFF) < (rs(y * 9 + x + 1) & 0xFF))
          hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Per-image dHash over PNG payloads: `(media_id, dhash)`. Map-only
    * kernel (decode → greyscale → 9×8 resize → 64 comparisons);
    * non-PNG payloads are skipped — a perceptual screen over a mixed
    * media corpus indexes what it can read. */
  def imageDHash(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      if (!Png.isPng(rec.payload)) Iterator.empty
      else {
        val img = Png.decode(rec.payload)
        Iterator.single((rec.media_id,
          dHash64(img.pixels, img.width, img.height, img.channels)))
      }
    }).toDF("media_id", "dhash")
  }

  /** Image near-duplicate pairs: all `(id1 < id2)` whose dHashes differ
    * in at most `maxHamming` of 64 bits, WITHOUT the image×image cross
    * product — the [[Dedup.simhashPairs]] banded-Hamming shape over the
    * perceptual hash. The 64-bit hash splits into `bands` equal slices;
    * pigeonhole (`maxHamming < bands`) means every qualifying pair
    * shares at least one slice verbatim, so the `(band, key)` equi-join
    * has recall 1.0 by construction and the exact `bit_count(xor)`
    * verify is codegen'd scalar math. Shuffle is bands×images rows.
    * Output: (id1, id2, hamming). */
  def imageNearDupPairs(ds: Dataset[MediaRecord],
      maxHamming: Int = 6, bands: Int = 8): DataFrame =
    bandedHammingPairs(imageDHash(ds), "dhash", maxHamming, bands)

  /** Banded-LSH Hamming join over any 64-bit perceptual hash column —
    * the shared candidate machinery of [[imageNearDupPairs]] and
    * [[audioNearDupPairs]]: each hash splits into `bands` fixed bit
    * slices; pairs sharing any slice join, and `maxHamming < bands`
    * makes the blocking LOSSLESS by pigeonhole (≤ maxHamming differing
    * bits cannot touch every band), so the banded join returns exactly
    * the all-pairs Hamming-ball result without an all-pairs join.
    * Expects `(media_id, <hashCol>)`. Output: `(id1, id2, hamming)`,
    * id1 < id2. */
  /** The LSH banding projection shared by [[bandedHammingPairs]] and the
    * streaming incremental twin
    * ([[graft.streaming.Streams.incrementalHammingCandidates]]): each
    * 64-bit hash explodes into `bands` fixed bit-slices as
    * `(media_id, _graft_h, band, key)` — persist this over the corpus
    * once and a new batch joins only its own bands against the stored
    * buckets. */
  private[graft] def hashBands(hashes: DataFrame, hashCol: String,
      bands: Int): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    hashes.select(col("media_id"), col(hashCol).as("_graft_h"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col(hashCol), b * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "key")))
  }

  private[graft] def bandedHammingPairs(hashes: DataFrame, hashCol: String,
      maxHamming: Int, bands: Int): DataFrame = {
    require(maxHamming < bands,
      s"recall guarantee needs maxHamming < bands (got $maxHamming >= $bands): " +
        "a pair may differ in every band otherwise")
    val banded = hashBands(hashes, hashCol, bands)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        bit_count(col("a._graft_h").bitwiseXOR(col("b._graft_h")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a close pair shares several bands; hamming is pair-deterministic
  }

  /** Per-asset audio ENVELOPE HASH — the dHash idea applied to the
    * loudness contour: the PCM16 stream splits into 65 equal segments
    * (tail truncated; assets under 65 samples are skipped — no
    * contour to hash), each segment reduces to its exact integer
    * Σ|sample|, and bit i of the hash is `Σ|seg i+1| > Σ|seg i|` —
    * 64 comparisons of the energy envelope's local direction. Tempo-
    * aligned re-encodes, amplitude-scaled copies (scaling preserves
    * every strict inequality) and padded-tail twins collide; unrelated
    * audio does not (the corpus measures ~95% distinct hashes).
    * Map-only kernel, exact integer arithmetic throughout. Output:
    * `(media_id, ehash)`. */
  def audioEnvelopeHash(ds: Dataset[MediaRecord],
      codec: MediaCodec = StubCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      val seg = n / 65
      if (seg == 0) None
      else {
        val sums = new Array[Long](65)
        var i = 0
        while (i < 65) {
          var j = 0; var s = 0L
          val base = i * seg
          while (j < seg) {
            val v = (((decoded(2 * (base + j)) & 0xFF) << 8) |
              (decoded(2 * (base + j) + 1) & 0xFF)).toShort.toInt
            s += math.abs(v).toLong
            j += 1
          }
          sums(i) = s
          i += 1
        }
        var hash = 0L
        var b = 0
        while (b < 64) {
          if (sums(b + 1) > sums(b)) hash |= 1L << b
          b += 1
        }
        Some((rec.media_id, hash))
      }
    }).toDF("media_id", "ehash")
  }

  /** Audio NEAR-DUP pairs — [[imageNearDupPairs]]'s twin for the audio
    * modality, closing the multimodal dedup loop: banded-LSH join over
    * [[audioEnvelopeHash]], lossless for `maxHamming < bands`. The
    * scale shape is the image twin's: hashes are one 8-byte value per
    * asset, the join blocks on band slices (never all-pairs), and the
    * Hamming filter is one codegen `bit_count`. Output:
    * `(id1, id2, hamming)`, id1 < id2. */
  def audioNearDupPairs(ds: Dataset[MediaRecord], maxHamming: Int = 6,
      bands: Int = 8, codec: MediaCodec = StubCodec): DataFrame =
    bandedHammingPairs(audioEnvelopeHash(ds, codec), "ehash",
      maxHamming, bands)

  /** PCM16 DECIMATION features: keep every `factor`-th sample (the
    * integer-factor downsample every audio pipeline runs before heavy
    * feature extraction; no anti-alias filter — this is the decimation
    * step itself, exact by construction) and emit the same exact
    * integer stats as [[pcm16Features]] over the decimated signal.
    * Map-only. Output: (media_id, n_samples, sum_sq, peak). */
  def pcm16Decimate(ds: Dataset[MediaRecord], factor: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(factor >= 1, "factor must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      var sumSq = 0L; var peak = 0; var kept = 0
      var i = 0
      while (i < n) {
        val s = (((decoded(2 * i) & 0xFF) << 8) | (decoded(2 * i + 1) & 0xFF)).toShort.toInt
        sumSq += s.toLong * s.toLong
        val a = math.abs(s); if (a > peak) peak = a
        kept += 1
        i += factor
      }
      (rec.media_id, kept, sumSq, peak)
    }).toDF("media_id", "n_samples", "sum_sq", "peak")
  }

  /** PCM16 PEAK NORMALIZATION (m13 — audio-training loudness
    * alignment): every sample rescales so the asset's peak lands on
    * `target` — out(i) = (s(i) · target) div peak, pure INTEGER
    * truncating division so both engines reproduce every sample
    * bit-for-bit (the [[pcm16Resample]] convention; no float gain
    * anywhere). Silent assets (peak 0) pass through unscaled rather
    * than dividing by zero. Map-only, one pass per asset. Output is
    * the post-normalization stats row per asset
    * `(media_id, n_samples, old_peak, new_peak, sum_sq)` — the shape
    * the oracle can replay sample-for-sample. */
  def pcm16Normalize(ds: Dataset[MediaRecord], target: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(target >= 1 && target <= 32767, "target must be in [1, 32767]")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      var peak = 0
      var i = 0
      while (i < n) {
        val s = (((decoded(2 * i) & 0xFF) << 8) | (decoded(2 * i + 1) & 0xFF)).toShort.toInt
        val a = math.abs(s); if (a > peak) peak = a
        i += 1
      }
      var sumSq = 0L; var newPeak = 0
      i = 0
      while (i < n) {
        val s = (((decoded(2 * i) & 0xFF) << 8) | (decoded(2 * i + 1) & 0xFF)).toShort.toInt
        // divide MAGNITUDES: JVM / truncates toward zero while SQL //
        // floors, and they disagree on negatives — sign · (|s|·t div p)
        // is the one convention both engines state identically
        val out =
          if (peak == 0) s
          else {
            val mag = ((math.abs(s).toLong * target) / peak).toInt
            if (s < 0) -mag else mag
          }
        sumSq += out.toLong * out.toLong
        val a = math.abs(out); if (a > newPeak) newPeak = a
        i += 1
      }
      (rec.media_id, n, peak, newPeak, sumSq)
    }).toDF("media_id", "n_samples", "old_peak", "new_peak", "sum_sq")
  }

  /** PCM16 LINEAR-INTERPOLATION resampling at an arbitrary rational
    * rate `num/den` (output rate = input rate × num/den) — the
    * fractional-rate complement to [[pcm16Decimate]]'s integer-factor
    * path (a 44.1→48 kHz conversion has no integer factor). Output
    * sample j sits at source position j·den/num; its value
    * interpolates the two neighboring input samples. To stay
    * bit-portable across engines ALL arithmetic is integer: emitted
    * values are SCALED BY `num` —
    *
    *   v_scaled(j) = s[idx]·(num − frac) + s[idx+1]·frac,
    *   idx = (j·den) div num,  frac = (j·den) mod num
    *
    * — so no division (whose rounding mode differs between engines)
    * ever happens. Map-only; emits exact integer stats over the
    * resampled signal. Output: (media_id, n_out, sum_scaled,
    * peak_scaled), the latter two in `num`-scaled sample units. */
  def pcm16ResampleLinear(ds: Dataset[MediaRecord], num: Int, den: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(num >= 1 && den >= 1, "rate factors must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { rec =>
      val decoded = codec.decode(rec.media_type, rec.payload)
      val n = decoded.length / 2
      def sample(i: Int): Long =
        (((decoded(2 * i) & 0xFF) << 8) | (decoded(2 * i + 1) & 0xFF)).toShort.toLong
      if (n == 0) (rec.media_id, 0, 0L, 0L)
      else {
        val nOut = ((n - 1).toLong * num / den + 1).toInt
        var sum = 0L; var peak = 0L
        var j = 0
        while (j < nOut) {
          val p = j.toLong * den
          val idx = (p / num).toInt
          val frac = p % num
          val v =
            if (frac == 0L) sample(idx) * num
            else sample(idx) * (num - frac) + sample(idx + 1) * frac
          sum += v
          val a = math.abs(v); if (a > peak) peak = a
          j += 1
        }
        (rec.media_id, nOut, sum, peak)
      }
    }).toDF("media_id", "n_out", "sum_scaled", "peak_scaled")
  }

  /** Per-tile greyscale statistics over a decoded image: the image
    * splits into a grid of `tileW`×`tileH` tiles (edge tiles smaller)
    * and each yields exact integer pixel-count and grey-sum — the
    * region-level signal layer (exposure maps, dead-region detection,
    * crop scoring) computed the [[dHash64]] way: greyscale is the
    * integer mean of the first min(channels, 3) samples, all arithmetic
    * integer, so every row is engine-portable. Map-only flatMap with
    * ~ (w/tileW)·(h/tileH) rows per image; non-PNG payloads skip.
    * Output: (media_id, tile_x, tile_y, n_px, sum_gray). */
  def tileStats(ds: Dataset[MediaRecord], tileW: Int, tileH: Int): DataFrame = {
    require(tileW >= 1 && tileH >= 1, "tile dims must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      if (!Png.isPng(rec.payload)) Iterator.empty
      else {
        val img = Png.decode(rec.payload)
        val ch = img.channels
        val gch = math.min(ch, 3)
        val tilesX = (img.width + tileW - 1) / tileW
        val tilesY = (img.height + tileH - 1) / tileH
        (0 until tilesY).iterator.flatMap { ty =>
          (0 until tilesX).iterator.map { tx =>
            val x0 = tx * tileW; val x1 = math.min(x0 + tileW, img.width)
            val y0 = ty * tileH; val y1 = math.min(y0 + tileH, img.height)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val base = (y * img.width + x) * ch
                var g = 0; var c = 0
                while (c < gch) { g += img.pixels(base + c) & 0xFF; c += 1 }
                sum += g / gch
                x += 1
              }
              y += 1
            }
            (rec.media_id, tx, ty, (x1 - x0) * (y1 - y0), sum)
          }
        }
      }
    }).toDF("media_id", "tile_x", "tile_y", "n_px", "sum_gray")
  }

  /** Sobel EDGE-ENERGY statistics per image — the classic blur/detail
    * screen (a crawl image that is all flat color or all noise scores
    * unlike a photograph, and edge energy is the cheap first-pass
    * signal): the integer 3×3 Sobel convolution over the grayscale
    * plane (channels averaged exactly as [[tileStats]]),
    *
    *   gx = (p₊₁,₋₁ + 2p₊₁,₀ + p₊₁,₊₁) − (p₋₁,₋₁ + 2p₋₁,₀ + p₋₁,₊₁)
    *   gy = (p₋₁,₊₁ + 2p₀,₊₁ + p₊₁,₊₁) − (p₋₁,₋₁ + 2p₀,₋₁ + p₊₁,₋₁)
    *
    * summed as |gx| + |gy| over every INTERIOR pixel (all 8 neighbors
    * present). Pure integer arithmetic end to end — bit-exact on every
    * engine, so the oracle replays the convolution off the source
    * bytes. Images narrower than 3×3 emit no row. Per-record kernel,
    * map-only. Output: `(media_id, width, height, n_interior,
    * edge_energy, max_grad)`. */
  def imageEdgeStats(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { rec =>
      if (!Png.isPng(rec.payload)) Iterator.empty
      else {
        val img = Png.decode(rec.payload)
        if (img.width < 3 || img.height < 3) Iterator.empty
        else {
          val ch = img.channels; val gch = math.min(ch, 3)
          val w = img.width; val h = img.height
          def g(x: Int, y: Int): Int = {
            val base = (y * w + x) * ch
            var s = 0; var c = 0
            while (c < gch) { s += img.pixels(base + c) & 0xFF; c += 1 }
            s / gch
          }
          var energy = 0L; var maxG = 0L; var n = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
                (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
              val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
                (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
              val e = math.abs(gx).toLong + math.abs(gy).toLong
              energy += e
              if (e > maxG) maxG = e
              n += 1
              x += 1
            }
            y += 1
          }
          Iterator.single((rec.media_id, w, h, n, energy, maxG))
        }
      }
    }).toDF("media_id", "width", "height", "n_interior", "edge_energy",
      "max_grad")
  }

  /** Per-partition batched feature extraction: md5 checksum + 4-bucket
    * byte histogram (byte >> 6) over the decoded payload. `batchSize`
    * bounds peak memory per partition — the same knob a real decoder
    * batch would use. */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // the codec shell serialized here; heavy decoder state initializes
      // lazily on the executor (MediaCodec contract)
      val digest = MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { rec =>
          val decoded = codec.decode(rec.media_type, rec.payload)
          val hist = new Array[Long](4)
          var i = 0
          while (i < decoded.length) {
            hist((decoded(i) & 0xFF) >> 6) += 1
            i += 1
          }
          digest.reset()
          val checksum = Dedup.Kernel.hex(digest.digest(decoded))
          MediaFeatures(rec.media_id, rec.media_type, decoded.length, checksum,
            hist(0), hist(1), hist(2), hist(3))
        }
      }
    }
  }

  /** [[extractFeatures]] with an ERROR CHANNEL: decode each payload
    * (default [[SniffCodec]]: PNG/JPEG by magic bytes, else
    * passthrough), but a payload the codec REJECTS — truncated, bomb
    * caps, unsupported frame type, any IllegalArgumentException from
    * the untrusted-bytes contract — becomes a `decode_ok=false` row
    * carrying the error instead of failing the job. This is the
    * ingest-at-scale posture: on a 100 TB crawl SOME records are
    * always malformed, and one hostile blob must neither kill the
    * pipeline (this operator) nor silently decode to garbage (the
    * codec contract — which is why only the codecs' own
    * IllegalArgumentException is converted to a row; a genuine
    * engine fault still propagates). Stateless map-only, so the SAME
    * operator runs per micro-batch as
    * [[graft.streaming.Streams.mediaTriageScreen]]. */
  def triageFeatures(ds: Dataset[MediaRecord],
      codec: MediaCodec = SniffCodec): Dataset[MediaTriageRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val digest = MessageDigest.getInstance("MD5")
      it.map { rec =>
        try {
          val decoded = codec.decode(rec.media_type, rec.payload)
          val hist = new Array[Long](4)
          var i = 0
          while (i < decoded.length) {
            hist((decoded(i) & 0xFF) >> 6) += 1
            i += 1
          }
          digest.reset()
          val checksum = Dedup.Kernel.hex(digest.digest(decoded))
          MediaTriageRow(rec.media_id, rec.media_type, decode_ok = true, "",
            decoded.length, checksum, hist(0), hist(1), hist(2), hist(3))
        } catch {
          case e: IllegalArgumentException =>
            MediaTriageRow(rec.media_id, rec.media_type, decode_ok = false,
              String.valueOf(e.getMessage), 0, "", 0L, 0L, 0L, 0L)
        }
      }
    }
  }

  /** Byte-value histogram + Shannon entropy per asset — the cheap
    * content fingerprint a media-ingest pipeline computes on EVERY blob
    * before any codec runs (compressed/encrypted payloads sit near 8
    * bits/byte of entropy; text, sparse bitmaps, and silence sit far
    * below — the classic triage signal for "is this worth decoding").
    * Bytes bucket into `bins` equal ranges (bins must divide 256);
    * output is one row `(media_id, bin, cnt, n_bytes, entropy)` per
    * NON-EMPTY bin, `entropy` the asset's bin-distribution Shannon
    * entropy in bits, round 6.
    *
    * Scale shape: the histogram is one kernel pass per payload (map
    * only); entropy is computed RELATIONALLY from the ≤ bins rows per
    * asset with DECIMAL(28,12) addends — the t15/bigram discipline — so
    * the value is partition-order independent and replays exactly in
    * the DuckDB oracle. Empty payloads produce no rows. */
  def byteHistogram(ds: Dataset[MediaRecord], bins: Int = 16): DataFrame = {
    require(bins >= 2 && 256 % bins == 0, "bins must divide 256")
    import ds.sparkSession.implicits._
    val width = 256 / bins
    val rows = ds.flatMap { rec =>
      val counts = new Array[Long](bins)
      rec.payload.foreach(b => counts((b & 0xFF) / width) += 1)
      val n = rec.payload.length.toLong
      (0 until bins).filter(counts(_) > 0L)
        .map(b => (rec.media_id, b, counts(b), n))
    }.toDF("media_id", "bin", "cnt", "n_bytes")
    val ent = rows.groupBy(col("media_id"), col("n_bytes"))
      .agg(sum((col("cnt").cast("double") * log(col("cnt").cast("double")))
        .cast(org.apache.spark.sql.types.DecimalType(28, 12))).as("sl"))
      .select(col("media_id"),
        round((log(col("n_bytes").cast("double")) -
          col("sl").cast("double") / col("n_bytes").cast("double")) /
          log(lit(2.0)), 6).as("entropy"))
    rows.join(ent, Seq("media_id"))
      .select(col("media_id"), col("bin"), col("cnt"), col("n_bytes"),
        col("entropy"))
  }
}
