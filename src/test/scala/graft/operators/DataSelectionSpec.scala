package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 data-selection additions: DSIR importance resampling, CCNet
  * perplexity bucketing, framed PCM16 features. */
class DataSelectionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("data-selection-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("dsirWeights ranks target-like docs above target-unlike docs") {
    val sp = spark; import sp.implicits._
    // target corpus speaks about "science research data"; raw pool has
    // one doc in that register and one in a disjoint register
    val target = Seq((100L, "science research data experiments analysis"),
      (101L, "data science methods research results")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "science research data analysis"),
      (2L, "casino jackpot slots winner bonus")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L),
      s"target-like doc should outweigh target-unlike: $w")
    // the target-unlike doc is pure OOV for the target model and common
    // in its own model -> strictly negative log ratio
    assert(w(2L) < 0.0)
  }

  test("dsirResample keeps exactly k rows, deterministically, layout-independent") {
    val sp = spark; import sp.implicits._
    val target = Seq((100L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = (1L to 40L).map(i =>
      (i, s"alpha beta word$i filler${i % 7} gamma tail${i % 3}"))
      .toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.dsirResample(df, target, "doc_id", "text", k = 10)
        .collect().map(_.getLong(0)).toSet
    val a = ids(raw)
    val b = ids(raw.repartition(7))
    assert(a.size === 10)
    assert(a === b, "resample selection must be partition-layout independent")
  }

  test("perplexityBuckets: per-group equal-frequency buckets, fluent docs in bucket 1") {
    val sp = spark; import sp.implicits._
    // 9 docs in one group: three share common vocabulary (high logprob),
    // six use rare-ish distinct words
    val docs = ((1L to 3L).map(i => (i, "en", "the common words appear here")) ++
      (4L to 9L).map(i => (i, "en", s"zebra$i qux$i flam$i glorp$i")))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang", 3)
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out.values.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(1 -> 3, 2 -> 3, 3 -> 3), "ntile must split 9 docs 3/3/3")
    // the three common-vocab docs tie on the highest score -> head bucket
    assert(Set(1L, 2L, 3L).forall(out(_) == 1),
      s"fluent docs must land in the head bucket: $out")
  }

  test("temperatureSample: exact floor allocation, flattening, layout independence") {
    val sp = spark; import sp.implicits._
    // A has 16 docs, B has 4; alpha=0.5 -> sw_A=4e6, sw_B=2e6, W=6e6;
    // target 6 -> take_A = 6*4/6 = 4, take_B = 6*2/6 = 2
    val docs = ((1L to 16L).map(i => (i, "A")) ++ (17L to 20L).map(i => (i, "B")))
      .toDF("doc_id", "source")
    val half = TextAnalysis.temperatureSample(docs, "source", "doc_id", 0.5, 6L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(half.length === 6)
    assert(half.count(_._2 == "A") === 4)
    assert(half.count(_._2 == "B") === 2)
    // alpha=1 degrades to proportional: takes 6*16/20=4 (floor 4.8) and
    // 6*4/20=1 (floor 1.2) -> the small group's share SHRINKS vs alpha=0.5
    val prop = TextAnalysis.temperatureSample(docs, "source", "doc_id", 1.0, 6L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(prop.count(_._2 == "B") === 1,
      "alpha=1 must give the small group its proportional share")
    // physical layout must not change the selected set
    val re = TextAnalysis.temperatureSample(docs.repartition(7), "source",
      "doc_id", 0.5, 6L).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(re.toSet === half.toSet)
  }

  test("rrfFuse: exact addend arithmetic, consensus outranks single-list") {
    val sp = spark; import sp.implicits._
    // list A ranks docs 10,11,12; list B ranks 11,10,13
    val a = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L))
      .toDF("query_id", "rank", "doc_id")
    val b = Seq((1L, 1, 11L), (1L, 2, 10L), (1L, 3, 13L))
      .toDF("query_id", "rank", "doc_id")
    val out = TextAnalysis.rrfFuse(Seq(a, b), k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val s1061 = r9(1.0 / 61) + r9(1.0 / 62) // docs 10 and 11 symmetric
    // consensus docs (in both lists) beat single-list docs
    assert(out.map(_._2).take(2).toSet === Set(10L, 11L))
    assert(out.take(2).forall(_._4 == 2))
    assert(out.take(2).forall(t => math.abs(t._3 - r9(s1061)) < 1e-12),
      s"fused score mismatch: ${out.toSeq}")
    // doc 12 (rank 3 in A only) vs doc 13 (rank 3 in B only): tie on
    // score, id tiebreak
    assert(out.drop(2).map(_._2).toSeq === Seq(12L, 13L))
  }

  test("dedupSurvivors keeps cluster minima and unclustered docs, original columns intact") {
    val sp = spark; import sp.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, shared, "a"), (2L, shared, "b"), (3L, shared + " extra", "c"),
      (9L, "completely different content about astronomy and telescopes", "d"))
      .toDF("doc_id", "text", "src")
    val out = Dedup.dedupSurvivors(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // 1,2,3 cluster (3 shares all its shingle bands' neighbors via 1/2);
    // the cluster keeps doc 1; doc 9 is untouched
    assert(out.keySet === Set(1L, 9L), s"survivors: $out")
    assert(out(1L) === "a" && out(9L) === "d",
      "original columns must ride through the anti-join")
  }

  test("dedupSurvivorsBy keeps the highest-score cluster member instead of the min id") {
    val sp = spark; import sp.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, shared, 64L), (2L, shared, 64L), (3L, shared + " extra", 70L),
      (9L, "completely different content about astronomy and telescopes", 59L))
      .toDF("doc_id", "text", "n_chars")
    val out = Dedup.dedupSurvivorsBy(docs, "doc_id", "text", "n_chars")
      .collect().map(_.getLong(0)).toSet
    // cluster {1,2,3}: 3 is longest -> survives; min-id policy would keep 1
    assert(out === Set(3L, 9L), s"survivors: $out")
  }

  test("zipfFit recovers an exact power law's slope") {
    val sp = spark; import sp.implicits._
    // build a corpus whose term counts are exactly cnt(w_r) = 64/r for
    // r in {1,2,4,8,...}: a perfect slope of -1 on the fitted points
    val words = Seq(("w1", 64), ("w2", 32), ("w4", 16), ("w8", 8))
    // cnt desc ties impossible; ranks 1..4 -> x=ln r in {0,ln2,2ln2,3ln2},
    // y = ln 64 - x exactly? ln(64/r) = ln64 - ln r only when cnt=64/r:
    // 64,32,16,8 at ranks 1,2,3,4 -> x=ln1..ln4, y=ln64-ln(2^(r-1)) —
    // NOT collinear in ln(rank); compute the expected slope locally
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val got = TextAnalysis.zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .collect().head
    assert(got.getInt(0) === 4)
    val pts = Seq(64, 32, 16, 8).zipWithIndex.map { case (c, i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(got.getDouble(1) - slope) < 1e-5,
      s"slope ${got.getDouble(1)} vs expected $slope")
  }

  test("topDuplicatedGrams counts DOCUMENT frequency with a deterministic cut") {
    val sp = spark; import sp.implicits._
    // "boilerplate x" (12 chars) in all 3 docs; doc 1 repeats it 3 times
    // but still counts once; "unique other" only in doc 1
    val docs = Seq(
      (1L, "boilerplate xboilerplate xboilerplate x unique other"),
      (2L, "boilerplate x and something else"),
      (3L, "boilerplate x third document")).toDF("doc_id", "text")
    val top = Dedup.topDuplicatedGrams(docs, "doc_id", "text", k = 12, topK = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.length === 1)
    assert(top.head === (("boilerplate ", 3L)), s"got ${top.toSeq}")
  }

  test("pcm16Decimate keeps every Nth sample with exact stats") {
    val sp = spark; import sp.implicits._
    def be(s: Short): Array[Byte] =
      Array(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)
    val payload = Seq[Short](1, -2, 3, -4, 5).flatMap(be).toArray
    val ds = sp.createDataset(Seq(MediaRecord(3L, "audio/pcm", payload)))
    // factor 2 -> samples 1, 3, 5
    val r = Multimodal.pcm16Decimate(ds, factor = 2).collect().head
    assert((r.getInt(1), r.getLong(2), r.getInt(3)) === ((3, 1L + 9L + 25L, 5)))
  }

  test("pcm16FrameFeatures: hand-computed frames, overlap, sign flips") {
    val sp = spark; import sp.implicits._
    // samples: +1, -2, +3, -4, +5 (big-endian 16-bit signed)
    def be(s: Short): Array[Byte] =
      Array(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)
    val payload = Seq[Short](1, -2, 3, -4, 5).flatMap(be).toArray
    val ds = sp.createDataset(Seq(MediaRecord(7L, "audio/pcm", payload)))
    // frameSize=3, stride=2 -> frames [0,3)=(1,-2,3), [2,5)=(3,-4,5), [4,5)=(5)
    val rows = Multimodal.pcm16FrameFeatures(ds, frameSize = 3, stride = 2)
      .orderBy(col("frame_no")).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))
    assert(rows.toSeq === Seq(
      (0, 3, 1L + 4L + 9L, 3, 2),   // 1,-2,3: two sign flips
      (1, 3, 9L + 16L + 25L, 5, 2), // 3,-4,5: two sign flips
      (2, 1, 25L, 5, 0)))           // single sample: no crossing
  }

  test("pcm16EnergySegments merges consecutive loud frames; silence splits segments") {
    val sp = spark; import sp.implicits._
    def be(s: Short): Array[Byte] =
      Array(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)
    // frameSize=2, stride=2, non-overlapping frames of:
    //   loud(100,100) loud(100,-100) quiet(1,1) loud(100,100) quiet(0,0)
    // minEnergy=5000: frame active iff sum_sq >= 5000*n (loud: 20000 >= 10000)
    val payload = Seq[Short](100, 100, 100, -100, 1, 1, 100, 100, 0, 0)
      .flatMap(be).toArray
    val ds = sp.createDataset(Seq(MediaRecord(3L, "audio/pcm", payload)))
    val segs = Multimodal
      .pcm16EnergySegments(ds, frameSize = 2, stride = 2, minEnergy = 5000L)
      .orderBy(col("seg_start")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getInt(5)))
    assert(segs.toSeq === Seq(
      (3L, 0, 1, 2, 40000L, 100), // frames 0-1 merge across the boundary
      (3L, 3, 3, 1, 20000L, 100))) // frame 3 is its own island
    // an all-quiet asset yields zero segments, not a zero-width one
    val quiet = sp.createDataset(Seq(MediaRecord(4L, "audio/pcm",
      Seq[Short](1, 1, 1, 1).flatMap(be).toArray)))
    assert(Multimodal.pcm16EnergySegments(quiet, 2, 2, 5000L).count() === 0)
  }

  test("pcm16EnergySegmentsKernel equals the relational gaps-and-islands path") {
    val sp = spark; import sp.implicits._
    // pseudo-random 16-bit payloads with loud and quiet stretches
    val rnd = new scala.util.Random(41)
    val assets = (1L to 20L).map { id =>
      val n = 40 + rnd.nextInt(200)
      val bytes = new Array[Byte](2 * n)
      var i = 0
      while (i < n) {
        val loud = (i / 16) % 2 == 0
        val s = (if (loud) 2000 + rnd.nextInt(20000) else rnd.nextInt(300)) *
          (if (rnd.nextBoolean()) 1 else -1)
        bytes(2 * i) = ((s >> 8) & 0xFF).toByte
        bytes(2 * i + 1) = (s & 0xFF).toByte
        i += 1
      }
      MediaRecord(id, "audio/pcm", bytes)
    }
    val ds = sp.createDataset(assets)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getInt(5))).toSet
    val rel = rows(Multimodal.pcm16EnergySegments(ds, 8, 6, 1000000L))
    val ker = rows(Multimodal.pcm16EnergySegmentsKernel(ds, 8, 6, 1000000L))
    assert(rel.nonEmpty && ker === rel,
      s"kernel segmentation diverged: ${ker.size} vs ${rel.size} segments")
  }

  test("pcm16Normalize scales by magnitude division; silent assets pass through") {
    val sp = spark; import sp.implicits._
    def be(s: Short): Array[Byte] =
      Array(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)
    // samples 100, -50, 25 with target 30000: peak 100 -> gain 300 exact,
    // except -50 checks the SIGN convention: -(50*30000 div 100) = -15000
    val ds = sp.createDataset(Seq(
      MediaRecord(1L, "audio/pcm", Seq[Short](100, -50, 25).flatMap(be).toArray),
      MediaRecord(2L, "audio/pcm", Seq[Short](0, 0).flatMap(be).toArray)))
    val rows = Multimodal.pcm16Normalize(ds, target = 30000)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    val expSq = 30000L * 30000 + 15000L * 15000 + 7500L * 7500
    assert(rows(1L) === ((3, 100, 30000, expSq)))
    // silent asset: peak 0 passes through unscaled, no division by zero
    assert(rows(2L) === ((2, 0, 0, 0L)))
    // truncation goes toward zero on BOTH signs: 33 -> 9900, -33 -> -9900
    val odd = sp.createDataset(Seq(
      MediaRecord(3L, "audio/pcm", Seq[Short](33, -33, 100).flatMap(be).toArray)))
    val r3 = Multimodal.pcm16Normalize(odd, target = 30000).collect().head
    assert(r3.getLong(4) === 30000L * 30000 + 2 * 9900L * 9900)
  }

  test("pcm16FrameFeatures zero-crossings: zeros never cross (strict product < 0)") {
    val sp = spark; import sp.implicits._
    def be(s: Short): Array[Byte] =
      Array(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)
    // +5, 0, -5: no adjacent pair has strictly negative product
    val payload = Seq[Short](5, 0, -5).flatMap(be).toArray
    val ds = sp.createDataset(Seq(MediaRecord(1L, "audio/pcm", payload)))
    val r = Multimodal.pcm16FrameFeatures(ds, frameSize = 3, stride = 3)
      .collect().head
    assert(r.getInt(5) === 0)
    assert(r.getInt(4) === 5)
  }

  test("vocabGrowth matches brute force; heapsLawFit separates " +
      "duplicated from novel corpora") {
    val sp = spark; import sp.implicits._
    val docs = Seq((1L, "a b c a"), (2L, "a b d"), (3L, "a b c"),
      (4L, "e f")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // brute: doc1 4 tokens 3 new (a,b,c); doc2 3 tokens 1 new (d);
    // doc3 3 tokens 0 new; doc4 2 tokens 2 new (e,f)
    assert(got === Map(
      1L -> ((4L, 3L, 4L, 3L)), 2L -> ((3L, 1L, 7L, 4L)),
      3L -> ((3L, 0L, 10L, 4L)), 4L -> ((2L, 2L, 12L, 6L))))
    // determinism under reshuffle
    val again = TextAnalysis.vocabGrowth(docs.repartition(5), "doc_id",
        "text").collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(again === got)
    // a corpus of one repeated doc: vocab stops growing -> beta ~ 0;
    // a corpus of entirely novel words: V = N -> beta = 1 exactly
    def beta(rows: Seq[(Long, String)]) =
      TextAnalysis.heapsLawFit(rows.toDF("doc_id", "text"), "doc_id",
        "text").collect().head.getDouble(3)
    val dup = beta((1L to 40L).map(i => (i, "alpha beta gamma")))
    val novel = beta((1L to 40L).map(i =>
      (i, s"w${i}x w${i}y w${i}z")))
    assert(dup < 0.25, s"duplicated corpus beta $dup")
    assert(math.abs(novel - 1.0) < 1e-6, s"novel corpus beta $novel")
    // single-doc corpus: one point, zero OLS denominator -> NULL fit
    val one = TextAnalysis.heapsLawFit(Seq((1L, "a b c"))
      .toDF("doc_id", "text"), "doc_id", "text").collect().head
    assert(one.getLong(0) === 1L && one.isNullAt(3) && one.isNullAt(4))
  }
}
