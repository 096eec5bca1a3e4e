package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("analytics-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(day: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("funnel requires strictly increasing timestamps across steps") {
    val events = spark.createDataFrame(Seq(
      // user 1 completes the funnel in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "buy", ts(3)),
      // user 2 clicks BEFORE viewing — click must not count
      (2L, "click", ts(1)), (2L, "view", ts(2)),
      // user 3 views and clicks at the SAME instant — strict > rejects it
      (3L, "view", ts(5)), (3L, "click", ts(5)),
      // user 4 views only
      (4L, "view", ts(1)),
      // user 5 full funnel, steps interleaved with noise
      (5L, "view", ts(1)), (5L, "other", ts(2)), (5L, "click", ts(3)),
      (5L, "view", ts(4)), (5L, "buy", ts(5))
    )).toDF("user_id", "event_type", "ts")
    val got = Analytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(got == List((1, "view", 5L), (2, "click", 2L), (3, "buy", 2L)))
  }

  test("funnel counts never increase down the steps on real events") {
    val events = graft.queries.Queries.t(spark, "/root/testdata/sf0.001", "events")
    val counts = Analytics.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy(col("step")).collect().map(_.getLong(2)).toSeq
    assert(counts.size == 3 && counts == counts.sorted.reverse)
    assert(counts.head > 0)
  }

  test("cohort retention: day-0 cell holds every user of the cohort") {
    val events = spark.createDataFrame(Seq(
      (1L, ts(1)), (1L, ts(3)), (2L, ts(1, 5)), (2L, ts(2)), (3L, ts(2))
    )).toDF("user_id", "ts")
    val got = Analytics.cohortRetention(events, "user_id", "ts")
      .collect().map(r => ((r.getDate(0).toString, r.getInt(1)), r.getLong(2))).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 2L, // users 1 and 2 first seen Jan 1
      ("2024-01-01", 1) -> 1L, // user 2 active Jan 2
      ("2024-01-01", 2) -> 1L, // user 1 active Jan 3
      ("2024-01-02", 0) -> 1L)) // user 3's own cohort
  }

  test("centroids are partition-order independent and exact") {
    val vecs = spark.createDataFrame(
      (1L to 100L).map(i => (i, (i % 3).toInt, Array.tabulate(4)(d => (i * 0.37f + d))))
    ).toDF("vec_id", "label", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.embeddingCentroids(df, "label", "embedding")
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val a = run(vecs)
    val b = run(vecs.repartition(7))
    assert(a == b) // decimal sums: merge order cannot change the centroid
    assert(a.size == 12) // 3 labels × 4 dims
    // hand-check one cell: label 0 ⇒ ids 3,6,...,99 (33 rows), dim 0
    val ids = (1L to 100L).filter(_ % 3 == 0)
    val expected = (ids.map(i => BigDecimal(i * 0.37f)).sum / ids.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(a((0, 0)) - expected) < 2e-6)
  }

  test("unigram log-prob scores rare-token docs below common-token docs") {
    val docs = spark.createDataFrame(Seq(
      (1L, "the the the the common words appear often here"),
      (2L, "zyx qwv jkl unique gibberish tokens nowhere else"),
      (3L, "the common words appear here too")
    )).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(2L) < got(1L) && got(2L) < got(3L))
    // partition invariance (decimal addends)
    val re = TextAnalysis.unigramLogProb(docs.repartition(5), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(re == got)
  }

  test("analytics operators handle empty input") {
    val emptyEvents = spark.createDataFrame(Seq.empty[(Long, String, Timestamp)])
      .toDF("user_id", "event_type", "ts")
    assert(Analytics.funnel(emptyEvents, "user_id", "event_type", "ts", Seq("a", "b"))
      .collect().map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(Analytics.cohortRetention(emptyEvents, "user_id", "ts").count() == 0)
    val emptyVecs = spark.createDataFrame(Seq.empty[(Int, Array[Float])])
      .toDF("label", "embedding")
    assert(Similarity.embeddingCentroids(emptyVecs, "label", "embedding").count() == 0)
    val emptyDocs = spark.createDataFrame(Seq.empty[(Long, String)]).toDF("doc_id", "text")
    assert(TextAnalysis.unigramLogProb(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("hllDistinct: raw-estimator regime within sketch error; linear counting small sets") {
    val sp = spark; import sp.implicits._
    // 5000 distinct ids in one group, each duplicated 3x (estimate must
    // ignore multiplicity): p=8 -> ~1.04/16 = 6.5% typical error
    val big = sp.range(5000L).select(lit("g").as("g"), $"id")
      .unionAll(sp.range(5000L).select(lit("g").as("g"), $"id"))
      .unionAll(sp.range(5000L).select(lit("g").as("g"), $"id"))
    val est = Analytics.hllDistinct(big, "g", "id", p = 8)
      .collect().head.getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15,
      s"raw estimate $est too far from 5000")
    // 30 distinct -> far below 2.5m: the linear-counting branch, which
    // is near-exact when buckets are mostly empty
    val small = sp.range(30L).select(lit("s").as("g"), $"id")
    val estS = Analytics.hllDistinct(small, "g", "id", p = 8)
      .collect().head.getDouble(1)
    assert(math.abs(estS - 30.0) < 5.0, s"linear-counting estimate $estS")
    // deterministic under repartitioning (registers are exact maxima)
    val again = Analytics.hllDistinct(big.repartition(13), "g", "id", p = 8)
      .collect().head.getDouble(1)
    assert(again === est)
  }

  test("hllIntersectEstimate: inclusion-exclusion tracks true overlap; clamped at 0 when disjoint") {
    val sp = spark; import sp.implicits._
    def regs(lo: Long, hi: Long) = Analytics.hllRegisters(
      sp.range(lo, hi).select(lit("g").as("g"), $"id"), "g", "id")
    // |A|=3000, |B|=3000, overlap 2000
    val r = Analytics.hllIntersectEstimate(regs(0, 3000), regs(1000, 4000), "g")
      .collect().head
    val (ea, ebb, eu, ei) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs(ea - 3000.0) / 3000.0 < 0.15 && math.abs(ebb - 3000.0) / 3000.0 < 0.15)
    assert(math.abs(eu - 4000.0) / 4000.0 < 0.15, s"union $eu")
    // intersection error compounds three sketches: generous 40% band
    assert(math.abs(ei - 2000.0) / 2000.0 < 0.4, s"intersect $ei")
    // disjoint sets: clamp keeps the estimate non-negative
    val d = Analytics.hllIntersectEstimate(regs(0, 2000), regs(10000, 12000), "g")
      .collect().head.getDouble(4)
    assert(d >= 0.0 && d < 500.0, s"disjoint estimate $d")
  }

  test("hll registers merge: merge(sketch(A), sketch(B)) == sketch(A union B) exactly") {
    val sp = spark; import sp.implicits._
    val a = sp.range(0L, 2000L).select(lit("g").as("g"), $"id")
    val b = sp.range(1500L, 3500L).select(lit("g").as("g"), $"id") // overlap
    val merged = Analytics.hllMergeRegisters(
        Analytics.hllRegisters(a, "g", "id"),
        Analytics.hllRegisters(b, "g", "id"), "g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val whole = Analytics.hllRegisters(a.unionAll(b), "g", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged === whole, "register merge diverged from whole-set sketch")
    // and the merged estimate is the union estimate
    val estM = Analytics.hllEstimate(
      Analytics.hllMergeRegisters(
        Analytics.hllRegisters(a, "g", "id"),
        Analytics.hllRegisters(b, "g", "id"), "g"), "g")
      .collect().head.getDouble(1)
    assert(math.abs(estM - 3500.0) / 3500.0 < 0.15, s"union estimate $estM")
  }

  test("gapFillDaily densifies each key's span and forward-fills gaps") {
    val events = spark.createDataFrame(Seq(
      // user 1: two obs on day 1 (sum 4.0), a gap, then day 4
      (1L, ts(1), 1.5), (1L, ts(1, 6), 2.5), (1L, ts(4), 3.0),
      // user 2: a single day — no gap rows at all
      (2L, ts(2), 7.0)
    )).toDF("user_id", "ts", "value")
    val out = Analytics.gapFillDaily(events, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01", 4.0, true),
      (1L, "2024-01-02", 4.0, false), // carried forward
      (1L, "2024-01-03", 4.0, false),
      (1L, "2024-01-04", 3.0, true),
      (2L, "2024-01-02", 7.0, true)))
    // all-null values on a key's only day: row exists, nothing to carry
    val nulls = spark.createDataFrame(Seq((3L, ts(1), Option.empty[Double])))
      .toDF("user_id", "ts", "value")
    val n = Analytics.gapFillDaily(nulls, "user_id", "ts", "value").collect()
    assert(n.length === 1 && n.head.isNullAt(2) && !n.head.getBoolean(3))
  }

  test("ewma folds left in (ts, id) order with the first value as init") {
    val events = spark.createDataFrame(Seq(
      // user 1 in scrambled row order; fold order is ts then id
      (1L, 3L, ts(3), 3.0), (1L, 1L, ts(1), 1.0), (1L, 2L, ts(2), 2.0),
      // user 2: single point -> ewma == the point
      (2L, 4L, ts(1), 5.0),
      // user 3: same-ts tie broken by event_id (4.0 then 8.0)
      (3L, 5L, ts(2), 4.0), (3L, 6L, ts(2), 8.0)
    )).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.ewma(events, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // user 1: y = 1; 0.3*2 + 0.7*1 = 1.3; 0.3*3 + 0.7*1.3 = 1.81
    assert(out(1L)._1 === 3)
    assert(math.abs(out(1L)._2 - 1.81) < 1e-12)
    assert(out(2L) === ((1, 5.0)))
    // user 3: y = 4; 0.3*8 + 0.7*4 = 5.2
    assert(out(3L)._1 === 2)
    assert(math.abs(out(3L)._2 - 5.2) < 1e-12)
    // null values drop before the fold
    val withNull = spark.createDataFrame(Seq(
      (7L, 1L, ts(1), Option(2.0)), (7L, 2L, ts(2), Option.empty[Double])
    )).toDF("user_id", "event_id", "ts", "value")
    val n = Analytics.ewma(withNull, "user_id", "ts", "event_id", "value")
      .collect().head
    assert(n.getInt(1) === 1 && n.getDouble(2) === 2.0)
  }

  test("holtLinear tracks level and trend; single point has zero trend") {
    val events = spark.createDataFrame(Seq(
      (1L, 1L, ts(1), 1.0), (1L, 2L, ts(2), 2.0), (1L, 3L, ts(3), 3.0),
      (2L, 4L, ts(1), 5.0)
    )).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics
      .holtLinear(events, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // hand fold (alpha 0.3, gamma 0.1) from (l, b) = (1, 0):
    //   x=2: l = 0.6 + 0.7*1 = 1.3,    b = 0.1*0.3 = 0.03
    //   x=3: l = 0.9 + 0.7*1.33 = 1.831, b = 0.1*0.531 + 0.9*0.03 = 0.0801
    val (n1, l1, b1, f1) = out(1L)
    assert(n1 === 3)
    assert(math.abs(l1 - 1.831) < 1e-12, s"level $l1")
    assert(math.abs(b1 - 0.0801) < 1e-12, s"trend $b1")
    assert(f1 === l1 + b1)
    // an increasing series must carry a positive trend
    assert(b1 > 0)
    assert(out(2L) === ((1, 5.0, 0.0, 5.0)))
  }

  test("rollingMadAnomalies flags the spike day and only it") {
    val sp = spark; import sp.implicits._
    // user 1: 9 steady days of 2 events, day 5 carries 10 (the spike);
    // events expand to that many rows per day
    val rows = (1 to 9).flatMap { d =>
      val n = if (d == 5) 10 else 2
      (1 to n).map(i => (1L, ts(d, i % 24)))
    }
    val out = Analytics
      .rollingMadAnomalies(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect().map(r => (r.getDate(1).toString.takeRight(2).toInt,
        r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .sortBy(_._1)
    assert(out.length === 9)
    // day 5's window is {2,2,2,2,10,2,2}: med 2, deviations
    // {0,0,0,0,0,0,8} -> mad 0 -> |10-2| > 3.5*0 flags it
    val spike = out.find(_._1 == 5).get
    assert(spike._2 === 10L && spike._3 === 2.0 && spike._4 === 0.0 &&
      spike._5)
    // every steady day sits exactly on its median -> dev 0 -> never flagged
    assert(out.filter(_._1 != 5).forall(!_._5))
  }

  test("rollingMadAnomalies: even window takes the middle-pair average") {
    val sp = spark; import sp.implicits._
    // 4 days of counts 1,2,3,4 -> day 1's frame is rows 1..4 (ROWS
    // -3..+3 clipped): sorted {1,2,3,4}, med (2+3)/2 = 2.5
    val rows = (1 to 4).flatMap(d => (1 to d).map(i => (7L, ts(d, i % 24))))
    val out = Analytics
      .rollingMadAnomalies(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect().map(r => r.getDate(1).toString -> r.getDouble(3)).toMap
    assert(out("2024-01-01") === 2.5)
  }

  test("cusumChangepoints: a level shift alarms, steady noise does not") {
    val sp = spark; import sp.implicits._
    // user 1: 6 days at 2, then 6 days at 6 — a level shift. mu = 4,
    // kap = 1, h = 16. Low phase: s+ stays 0 (2-4-1 < 0), s- climbs
    // (4-2-1 = 1/day, max 6). High phase: s+ climbs 1/day (6-4-1),
    // max 6; s- decays to 0. No alarm at h = 16.
    val rows = (1 to 12).flatMap { d =>
      val n = if (d <= 6) 2 else 6
      (1 to n).map(i => (1L, ts(d, i % 24)))
    }
    val out = Analytics.cusumChangepoints(rows.toDF("user_id", "ts"),
      "user_id", "ts").collect().head
    assert(out.getInt(1) === 12 && out.getDouble(2) === 4.0)
    assert(out.getDouble(3) === 6.0 && out.getDouble(4) === 6.0)
    assert(out.getLong(5) === 0L)
    // same series with a tight threshold (h = 1·mu = 4): the s- run
    // crosses 4 on low-phase day 5 (s- = 5) and day 6; the s+ run on
    // high-phase days 11..12 — 4 alarm days
    val tight = Analytics.cusumChangepoints(rows.toDF("user_id", "ts"),
      "user_id", "ts", hFrac = 1.0).collect().head
    assert(tight.getLong(5) === 4L)
    // pinned baseline overrides the series mean
    val pinned = Analytics.cusumChangepoints(rows.toDF("user_id", "ts"),
      "user_id", "ts", refMean = Some(2.0)).collect().head
    assert(pinned.getDouble(2) === 2.0)
    // a perfectly flat series accumulates nothing anywhere
    val flat = (1 to 8).flatMap(d => (1 to 3).map(i => (2L, ts(d, i % 24))))
    val f = Analytics.cusumChangepoints(flat.toDF("user_id", "ts"),
      "user_id", "ts").collect().head
    assert(f.getDouble(3) === 0.0 && f.getDouble(4) === 0.0 &&
      f.getLong(5) === 0L)
  }

  test("psiDrift: identical snapshots score 0; a shifted one scores big") {
    val sp = spark; import sp.implicits._
    val ref = (1 to 100).map(i => i.toDouble).toDF("value")
    // same distribution: every term's shares match -> ln(1) * 0 = 0
    val same = Analytics.psiDrift(ref, ref, "value", nBins = 4)
      .collect().sortBy(_.getInt(0))
    assert(same.length === 4)
    assert(same.forall(r => r.getDouble(5) === 0.0 && r.getDouble(6) === 0.0))
    assert(same.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      Seq((1, 25L), (2, 25L), (3, 25L), (4, 25L)))
    // hard shift: all current mass above the reference's top quartile
    val shifted = (1 to 100).map(i => 200.0 + i).toDF("value")
    val drift = Analytics.psiDrift(ref, shifted, "value", nBins = 4)
      .collect().sortBy(_.getInt(0))
    assert(drift.head.getLong(2) === 0L && drift.last.getLong(2) === 100L)
    assert(drift.head.getDouble(6) > 0.25, "hard shift must cross the act threshold")
    // empty bins stay finite under the Laplace smoothing
    assert(drift.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }

  test("chiSquareDrift: matched shares stay near 0, a vanished category " +
      "contributes its full expected mass") {
    val sp = spark; import sp.implicits._
    val ref = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("cat")
    // identical current: smoothing keeps terms tiny but the shape flat
    val same = Analytics.chiSquareDrift(ref, ref, "cat")
      .collect().sortBy(_.getString(0))
    assert(same.length === 2 && same.head.getInt(6) === 1)
    assert(same.forall(_.getDouble(5) < 0.01))
    // category b vanishes: expected ~50 observed 0 and a doubled,
    // hand-check the smoothed arithmetic — E_a = 51/102*100 = 50,
    // E_b = 51/102*100 = 50; chi2 = (100-50)^2/50 + (0-50)^2/50 = 100
    val cur = Seq.fill(100)("a").toDF("cat")
    val drift = Analytics.chiSquareDrift(ref, cur, "cat")
      .collect().sortBy(_.getString(0))
    assert(drift.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(drift.head.getDouble(3) === 50.0 && drift.last.getDouble(3) === 50.0)
    assert(drift.head.getDouble(5) === 100.0)
    // a category NEW to current gets a finite loud term (smoothed ref 0)
    val novel = (Seq.fill(50)("a") ++ Seq.fill(50)("z")).toDF("cat")
    val nd = Analytics.chiSquareDrift(ref, novel, "cat")
      .collect().sortBy(_.getString(0))
    assert(nd.length === 3)
    assert(nd.forall(r => !r.getDouble(4).isNaN && !r.getDouble(4).isInfinite))
    assert(nd.find(_.getString(0) == "z").get.getDouble(4) > 10.0)
  }

  test("symbolicMotifs: a strict ramp yields one motif per window") {
    val sp = spark; import sp.implicits._
    // user 1 ramps 1,2,3,4,5,6,7,8 over 8 days: ntile(4) in count order
    // gives symbols 1,1,2,2,3,3,4,4 in day order -> 3-grams
    // 112,122,223,233,334,344 each exactly once
    val rows = (1 to 8).flatMap(d => (1 to d).map(i => (1L, ts(d, i % 24))))
    val out = Analytics
      .symbolicMotifs(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq ===
      Seq("112", "122", "223", "233", "334", "344"))
    assert(out.forall(m => m._2 === 1L && m._3 === 1L))
    // fewer days than the motif length -> no windows at all
    val short = (1 to 2).map(d => (2L, ts(d)))
    assert(Analytics.symbolicMotifs(short.toDF("user_id", "ts"),
      "user_id", "ts").count() === 0L)
  }

  test("acf matches the hand formula; constant series yields NULL") {
    val events = spark.createDataFrame(Seq(
      (1L, 1L, ts(1), 1.0), (1L, 2L, ts(2), 2.0),
      (1L, 3L, ts(3), 3.0), (1L, 4L, ts(4), 4.0),
      // constant two-point series: zero denominator
      (2L, 5L, ts(1), 5.0), (2L, 6L, ts(2), 5.0)
    )).toDF("user_id", "event_id", "ts", "value")
    val out = Analytics.acf(events, "user_id", "ts", "event_id", "value",
        maxLag = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    // series 1,2,3,4: mean 2.5, den 5; num(1)=1.25, num(2)=-1.5,
    // num(3)=-2.25
    assert(out((1L, 1)) === ((4, Some(0.25))))
    assert(out((1L, 2)) === ((4, Some(-0.3))))
    assert(out((1L, 3)) === ((4, Some(-0.45))))
    // constant series: lag 1 only (lag < n), acf NULL not NaN
    assert(out((2L, 1)) === ((2, None)))
    assert(!out.contains((2L, 2)))
  }

  test("cupedAdjustedMeans: exactly-linear metric gives theta, rho2 = 1, " +
      "and arm-identical adjusted means") {
    val sp = spark; import sp.implicits._
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val pre = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val post = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    // y = 3x + 5 exactly: the covariate explains ALL metric variance
    val rows = (1L to 60L).flatMap { u =>
      val x = (u % 10) + 1
      Seq((u, pre, x), (u, post, 3 * x + 5))
    }
    val out = Analytics.cupedAdjustedMeans(
      rows.toDF("user_id", "ts", "cents"), "user_id", "ts", "cents", cut)
      .collect().head
    assert(out.getLong(0) + out.getLong(1) === 60L)
    assert(out.getDouble(2) === 3.0)                  // theta
    assert(out.getDouble(7) === 1.0)                  // var_reduction
    // adjusted means collapse to 3*xbar + 5 in BOTH arms
    assert(math.abs(out.getDouble(5) - out.getDouble(6)) < 1e-8,
      s"adj means ${out.getDouble(5)} vs ${out.getDouble(6)}")
    // raw means generally differ across arms (the noise CUPED removes)
    assert(out.getDouble(3) !== out.getDouble(4))
    // constant covariate: theta undefined -> NULL
    val const = (1L to 30L).flatMap(u =>
      Seq((u, pre, 5L), (u, post, u % 3)))
    val c = Analytics.cupedAdjustedMeans(
      const.toDF("user_id", "ts", "cents"), "user_id", "ts", "cents", cut)
      .collect().head
    assert(c.isNullAt(2) && c.isNullAt(5))
  }

  test("mannWhitneyU matches a midrank brute force over the same arms") {
    val sp = spark; import sp.implicits._
    def arm(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 100 < 50) "a"
      else "b"
    }
    val ks = (1L to 40L).map(u => u -> (u % 5)) // heavy ties
    val out = Analytics.mannWhitneyU(
      ks.map { case (u, k) => (u, k) }.toDF("user_id", "cents"),
      "user_id", "cents").collect().head
    // brute force: midranks over the pooled sorted sample
    val sorted = ks.map(_._2).sorted
    val midrank = sorted.distinct.map { v =>
      val lo = sorted.indexOf(v) + 1
      val hi = sorted.lastIndexOf(v) + 1
      v -> (lo + hi) / 2.0
    }.toMap
    val aUnits = ks.filter { case (u, _) => arm(u) == "a" }
    val nA = aUnits.size.toLong
    val nB = ks.size - nA
    val rA = aUnits.map { case (_, k) => midrank(k) }.sum
    val uA = rA - nA * (nA + 1) / 2.0
    assert(out.getLong(0) === nA && out.getLong(1) === nB)
    assert(out.getDouble(2) === uA, s"U_A ${out.getDouble(2)} vs $uA")
    assert(out.getDouble(3) === nA * nB / 2.0)
    // z deterministic under reshuffle
    val again = Analytics.mannWhitneyU(
      ks.toDF("user_id", "cents").repartition(7), "user_id", "cents")
      .collect().head
    assert(again.getDouble(4) === out.getDouble(4))
    // tie-degenerate sample: zero variance -> NULL z
    val const = (1L to 30L).map(u => (u, 7L)).toDF("user_id", "cents")
    assert(Analytics.mannWhitneyU(const, "user_id", "cents")
      .collect().head.isNullAt(4))
  }

  test("abTestZ: exact arm counts; equal rates give z = 0") {
    val sp = spark; import sp.implicits._
    // every unit converts -> rates 1.0 in both arms, z = 0/0-guard free
    // (denominator sqrt(p(1-p)...) = 0 when p = 1 -> use mixed data)
    val rows = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "purchase" else "view"))
    val out = Analytics.abTestZ(rows.toDF("user_id", "event_type"),
      "user_id", "event_type", "purchase").collect().head
    val (na, nb, ca, cb) = (out.getLong(0), out.getLong(1),
      out.getLong(2), out.getLong(3))
    assert(na + nb === 400L && ca + cb === 200L)
    assert(math.abs(out.getDouble(4) - ca.toDouble / na) < 1e-9)
    // deterministic under reshuffle (md5 arms, exact counts)
    val again = Analytics.abTestZ(
      rows.toDF("user_id", "event_type").repartition(7),
      "user_id", "event_type", "purchase").collect().head
    assert(again.getDouble(6) === out.getDouble(6))
    // a unit with several events converts once (max, not sum)
    val multi = Seq((1L, "purchase"), (1L, "purchase"), (2L, "view"))
      .toDF("user_id", "event_type")
    val m = Analytics.abTestZ(multi, "user_id", "event_type", "purchase")
      .collect().head
    assert(m.getLong(2) + m.getLong(3) === 1L)
    // degenerate pooled rate (everyone converts): z is NULL, no
    // division-by-zero (ANSI) and no engine-dependent NaN
    val all = (1L to 50L).map(i => (i, "purchase"))
      .toDF("user_id", "event_type")
    val d = Analytics.abTestZ(all, "user_id", "event_type", "purchase")
      .collect().head
    assert(d.isNullAt(6))
  }

  test("abTestPowerMde: hand formula, shrinks with n, degenerate NULLs, " +
      "empty-arm one-row contract") {
    val sp = spark; import sp.implicits._
    def mk(n: Long) = (1L to n).map(i =>
      (i, if (i % 4 == 0) "purchase" else "view"))
      .toDF("user_id", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      Analytics.abTestPowerMde(df, "user_id", "event_type", "purchase")
        .collect().head
    val small = run(mk(400L))
    val (na, nb, p) = (small.getLong(0), small.getLong(1),
      small.getDouble(2))
    // hand-replay the fixed chain
    val expect = BigDecimal((1.959964 + 0.841621) *
      math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(small.getDouble(3) === expect,
      s"mde ${small.getDouble(3)} != hand $expect")
    assert(small.getDouble(4) ===
      BigDecimal(small.getDouble(3) / p)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // 16x the units: MDE shrinks ~4x (1/sqrt(n))
    val big = run(mk(6400L))
    val ratio = small.getDouble(3) / big.getDouble(3)
    assert(ratio > 3.0 && ratio < 5.5, s"MDE scaling ratio $ratio")
    // everyone converts: pooled rate 1 -> NULL MDE
    val deg = run((1L to 50L).map(i => (i, "purchase"))
      .toDF("user_id", "event_type"))
    assert(deg.getDouble(2) === 1.0 && deg.isNullAt(3) && deg.isNullAt(4))
    // empty input: one row, zero counts, NULLs throughout
    val empty = Analytics.abTestPowerMde(
      Seq.empty[(Long, String)].toDF("user_id", "event_type"),
      "user_id", "event_type", "purchase").collect()
    assert(empty.length === 1 && empty.head.getLong(0) === 0L &&
      empty.head.isNullAt(2) && empty.head.isNullAt(3))
  }

  test("bootstrapMeanCi: CI brackets the mean; constant metric collapses it") {
    val sp = spark; import sp.implicits._
    val rows = (1L to 200L).map(i => (i, (i % 7).toDouble))
    val df = rows.toDF("event_id", "value").repartition(4)
    val out = Analytics.bootstrapMeanCi(df, "event_id", "value",
      replicates = 64).collect().head
    val (n, b, mean, lo, hi) = (out.getLong(0), out.getInt(1),
      out.getDouble(2), out.getDouble(3), out.getDouble(4))
    assert(n === 200L && b === 64)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] must bracket $mean")
    assert(lo < hi, "200 varying rows cannot collapse the CI")
    // md5-derived weights: reshuffle-proof, same CI on every run
    val again = Analytics.bootstrapMeanCi(df.repartition(7), "event_id",
      "value", replicates = 64).collect().head
    assert((again.getDouble(3), again.getDouble(4)) === ((lo, hi)))
    // constant metric: every replicate mean equals the constant
    val const = (1L to 100L).map(i => (i, 2.0)).toDF("event_id", "value")
    val c = Analytics.bootstrapMeanCi(const, "event_id", "value",
      replicates = 32).collect().head
    assert(c.getDouble(2) === 2.0 && c.getDouble(3) === 2.0 &&
      c.getDouble(4) === 2.0)
  }

  test("seasonalDecompose: centered MA trend, centered weekday indices, " +
      "edge days get NULL trend/resid") {
    // user 1, days 1..5 of 2024-01 carrying 1,4,1,4,1 events; period 3
    val counts = Seq(1, 4, 1, 4, 1)
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map(j => (1L, ts(i + 1, j % 24)))
    }
    val sp = spark; import sp.implicits._
    val out = Analytics.seasonalDecompose(rows.toDF("user_id", "ts"),
        "user_id", "ts", period = 3)
      .collect()
      .map(r => r.getDate(1).toString.takeRight(2).toInt ->
        ((r.getLong(2), r.getInt(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))))
      .toMap
    // epoch day of 2024-01-01 is 19723 -> slot 1; slots cycle 1,2,0,1,2
    // trend: day2 (1+4+1)/3 = 2, day3 = 3, day4 = 2; edges NULL
    // detr: 2, -2, 2 -> s_raw slot2 = 2, slot0 = -2, slot1 = 2
    // mean = round(2/3, 9) = .666666667; seasonal: slot0 -2.666666667,
    // slot1/slot2 1.333333333; resid (all interior) .666666667
    assert(out(1) === ((1L, 1, None, Some(1.333333333), None)))
    assert(out(2) === ((4L, 2, Some(2.0), Some(1.333333333),
      Some(0.666666667))))
    assert(out(3) === ((1L, 0, Some(3.0), Some(-2.666666667),
      Some(0.666666667))))
    assert(out(4) === ((4L, 1, Some(2.0), Some(1.333333333),
      Some(0.666666667))))
    assert(out(5) === ((1L, 2, None, Some(1.333333333), None)))
    // a key shorter than the period has no full window anywhere
    val short = Seq((2L, ts(1)), (2L, ts(2))).toDF("user_id", "ts")
    val s2 = Analytics.seasonalDecompose(short, "user_id", "ts", period = 3)
      .collect()
    assert(s2.length === 2 && s2.forall(r => r.isNullAt(4) && r.isNullAt(6)))
  }

  test("holtWinters rotates the seasonal register and folds in day order") {
    val sp = spark; import sp.implicits._
    // user 1: day d carries d events -> daily series 1, 2, 3
    val rows = (1 to 3).flatMap(d => (1 to d).map(i => (1L, ts(d, i % 24)))) ++
      Seq((2L, ts(1))) // single-day user: state stays at init
    val out = Analytics.holtWinters(rows.toDF("user_id", "ts"),
        "user_id", "ts", period = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // hand fold (alpha .3, gamma .1, delta .2) from l=1, b=0, s=[0,0]:
    //   x=2: l=0.3*2+0.7*1=1.3, b=0.03, sNew=0.2*0.7=0.14 -> s=[0,0.14]
    //   x=3: l=0.3*3+0.7*1.33=1.831, b=0.1*0.531+0.9*0.03=0.0801,
    //        sNew=0.2*1.169=0.2338 -> s=[0.14, 0.2338]
    val (n1, l1, b1, s1, f1) = out(1L)
    assert(n1 === 3)
    assert(math.abs(l1 - 1.831) < 1e-12, s"level $l1")
    assert(math.abs(b1 - 0.0801) < 1e-12, s"trend $b1")
    assert(math.abs(s1 - 0.14) < 1e-12, s"season $s1")
    assert(f1 === l1 + b1 + s1)
    assert(out(2L) === ((1, 1.0, 0.0, 0.0, 1.0)))
  }

  test("ddsketch: relative-error guarantee, exact mergeability, " +
      "reshuffle determinism, positive-domain contract") {
    val sp = spark; import sp.implicits._
    val gamma = 1.02
    val alpha = (gamma - 1.0) / (gamma + 1.0)
    // deterministic pseudo-random positive values across 4 decades
    val vals = (1 to 2000).map(i =>
      math.pow(10.0, 1.0 + (i * 2654435761L % 3000) / 1000.0))
    val df = vals.zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("g", "id", "x")
    val regs = Analytics.ddsketchRegisters(df, "g", "x", gamma)
    // every quantile estimate within alpha relative error of the exact
    val est = Analytics.ddsketchQuantiles(regs,
        Seq(0.1, 0.5, 0.9, 0.99), gamma)
      .collect().map(r => r.getDouble(1) -> r.getDouble(4)).toMap
    val sorted = vals.sorted
    est.foreach { case (q, e) =>
      val exact = sorted(math.max(0,
        math.ceil(q * sorted.size).toInt - 1))
      assert(math.abs(e - exact) / exact <= alpha + 1e-9,
        s"q=$q est=$e exact=$exact relerr=${math.abs(e - exact) / exact}")
    }
    // mergeability: sketch(A) + sketch(B) == sketch(A ∪ B), register-exact
    val (a, b) = df.as[(String, Long, Double)].collect()
      .partition(_._2 % 2 == 0)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val merged = Analytics.ddsketchMergeRegisters(
      Analytics.ddsketchRegisters(a.toSeq.toDF("g", "id", "x"), "g", "x", gamma),
      Analytics.ddsketchRegisters(b.toSeq.toDF("g", "id", "x"), "g", "x", gamma))
    assert(rows(merged) === rows(regs), "merge is not register-exact")
    // determinism under reshuffle
    assert(rows(Analytics.ddsketchRegisters(df.repartition(13), "g", "x",
      gamma)) === rows(regs))
    // zero / negative / null rows are excluded, not mis-bucketed
    val dirty = Seq(("g", 1L, 100.0), ("g", 2L, 0.0), ("g", 3L, -5.0))
      .toDF("g", "id", "x")
      .unionByName(Seq(("g", 4L)).toDF("g", "id")
        .withColumn("x", lit(null).cast("double")))
    assert(Analytics.ddsketchRegisters(dirty, "g", "x", gamma)
      .agg(org.apache.spark.sql.functions.sum($"cnt")).collect()
      .head.getLong(0) === 1L)
  }

  test("srmCheck: balanced split quiet, corrupted assignment alarms, " +
      "empty input emits one row") {
    val sp = spark; import sp.implicits._
    // healthy feed: distinct units through the md5 splitter — chi2 small
    val ok = Analytics.srmCheck(
      (1L to 4000L).map(i => (i, "x")).toDF("u", "pad"), "u")
      .collect().head
    assert(ok.getLong(0) + ok.getLong(1) === 4000L)
    assert(ok.getDouble(3) < 10.83 && !ok.getBoolean(4),
      s"healthy split alarmed: chi2=${ok.getDouble(3)}")
    // corrupted feed: drop 30% of arm-b units (the classic logging-loss
    // SRM) — alarm must fire
    val armB = (1L to 4000L).filter { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 100 >= 50
    }
    val lost = armB.take(armB.size * 3 / 10).toSet
    val bad = Analytics.srmCheck(
      (1L to 4000L).filterNot(lost).map(i => (i, "x")).toDF("u", "pad"),
      "u")
      .collect().head
    assert(bad.getDouble(3) > 10.83 && bad.getBoolean(4),
      s"30% arm loss not flagged: chi2=${bad.getDouble(3)}")
    // empty input: still one row, zero counts, NULL chi2/alarm
    val empty = Analytics.srmCheck(
      Seq.empty[(Long, String)].toDF("u", "pad"), "u").collect()
    assert(empty.length === 1 && empty.head.getLong(0) === 0L &&
      empty.head.isNullAt(3) && empty.head.isNullAt(4))
  }

  test("srmCheck: integer-exact chi-square — emitted chi2 equals the " +
      "closed form d^2/(n*p*(100-p)) and the alarm is the " +
      "cross-multiplied integer comparison") {
    val sp = spark; import sp.implicits._
    for (n <- Seq(101L, 150L, 4000L)) {   // odd n => half-integer expected_a
      val r = Analytics.srmCheck(
        (1L to n).map(i => (i, "x")).toDF("u", "pad"), "u").collect().head
      val (na, nb) = (r.getLong(0), r.getLong(1))
      assert(na + nb === n)
      val d = 100L * na - 50L * n
      val den = n * 50L * 50L
      val exact = BigDecimal(d.toDouble * d.toDouble / den.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === exact,
        s"n=$n chi2 ${r.getDouble(3)} != closed form $exact")
      assert(r.getDouble(2) === 50.0 * n / 100.0)
      assert(r.getBoolean(4) === (100L * d * d > 1083L * den))
    }
  }

  test("sequentialMsprt: one row per event day, cumulative counts, " +
      "non-increasing always-valid p, strong effect rejects, " +
      "empty input empty") {
    val sp = spark; import sp.implicits._
    def md5arm(i: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 100 < 50) "a" else "b"
    }
    // 400 units arriving over 10 days (40/day), each with a follow-up
    // event 5 days later (the calendar extends past the last arrival);
    // arm a always converts, arm b never — a maximal true effect
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int) =
      new java.sql.Timestamp(base.getTime + day * 86400000L)
    val rows = (1L to 400L).flatMap { i =>
      val arrive = ((i - 1) % 10).toInt
      val typ = if (md5arm(i) == "a") "purchase" else "view"
      Seq((i, ts(arrive), typ), (i, ts(arrive + 5), "view"))
    }
    val ev = rows.toDF("user_id", "ts", "event_type")
    val out = Analytics.sequentialMsprt(ev, "user_id", "ts",
        "event_type", "purchase")
      .orderBy(col("day")).collect()
    assert(out.length === 15)  // days 0..14 observed
    // cumulative unit counts are non-decreasing and end at 400
    val ns = out.map(r => r.getLong(1) + r.getLong(2))
    assert(ns.zip(ns.tail).forall { case (x, y) => x <= y })
    assert(ns.last === 400L)
    // day 9 onward all units are in; counts freeze
    assert(ns(9) === 400L && ns(14) === 400L)
    // always-valid p is non-increasing (it is exp(-cummax lnL))
    val ps = out.map(r => r.getDouble(8))
    assert(ps.zip(ps.tail).forall { case (x, y) => y <= x + 1e-12 }, ps.mkString(","))
    // a maximal effect at n=400 must reject at alpha=0.05
    assert(out.last.getBoolean(9),
      s"evidence ${out.last.getDouble(7)} did not reject")
    // log_evidence is the running max of log_lambda
    val lnl = out.map(r =>
      if (r.isNullAt(6)) None else Some(r.getDouble(6)))
    val cummax = lnl.scanLeft(Option.empty[Double]) { (acc, v) =>
      (acc.toSeq ++ v.toSeq).reduceOption((x, y) => math.max(x, y))
    }.tail
    out.zip(cummax).foreach { case (r, m) =>
      assert((if (r.isNullAt(7)) None else Some(r.getDouble(7))) === m)
    }
    // reshuffle determinism
    val again = Analytics.sequentialMsprt(ev.repartition(7), "user_id",
        "ts", "event_type", "purchase")
      .orderBy(col("day")).collect()
    assert(again.map(_.toString).toSeq === out.map(_.toString).toSeq)
    // empty input: no monitoring days, zero rows
    val empty = Analytics.sequentialMsprt(
      Seq.empty[(Long, java.sql.Timestamp, String)]
        .toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", "purchase")
    assert(empty.count() === 0L)
  }

  test("groupSequentialZ: one row per planned look at the right days, " +
      "final z equals abTestZ, OBF boundaries, stopping carries forward") {
    val sp = spark; import sp.implicits._
    def md5arm(i: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 100 < 50) "a" else "b"
    }
    // the sequentialMsprt fixture: 400 units over 10 arrival days + a
    // 5-day tail of follow-ups (15 observed days), arm a converts,
    // arm b never — a maximal effect every late look must catch
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int) =
      new java.sql.Timestamp(base.getTime + day * 86400000L)
    val rows = (1L to 400L).flatMap { i =>
      val arrive = ((i - 1) % 10).toInt
      val typ = if (md5arm(i) == "a") "purchase" else "view"
      Seq((i, ts(arrive), typ), (i, ts(arrive + 5), "view"))
    }
    val ev = rows.toDF("user_id", "ts", "event_type")
    val out = Analytics.groupSequentialZ(ev, "user_id", "ts",
        "event_type", "purchase")
      .orderBy(col("look")).collect()
    assert(out.map(_.getLong(0)).toSeq === (1L to 5L),
      "one row per planned look")
    // look k reads day index ceil(k*15/5) = 3k -> days 2,5,8,11,14
    val days = out.map(_.getDate(1).toLocalDate.getDayOfMonth)
    assert(days.toSeq === Seq(3, 6, 9, 12, 15), days.mkString(","))
    assert(out.map(_.getDouble(7)).toSeq === Analytics.ObrienFleming5)
    // final look sees every unit; its z is the fixed-horizon abTestZ
    assert(out.last.getLong(2) + out.last.getLong(3) === 400L)
    val zFixed = Analytics.abTestZ(
        ev.select(col("user_id"), col("event_type")),
        "user_id", "event_type", "purchase")
      .collect().head.getDouble(6)
    assert(out.last.getDouble(6) === zFixed,
      "final-look z must equal the fixed-horizon abTestZ z")
    // maximal effect: every look crosses, so stopped is true throughout
    // and both flags agree with |z| > boundary
    out.foreach { r =>
      assert(r.getBoolean(8) === (math.abs(r.getDouble(6)) > r.getDouble(7)))
    }
    assert(out.forall(_.getBoolean(9)), "stopping state must carry forward")
    // determinism under reshuffle
    val again = Analytics.groupSequentialZ(ev.repartition(7), "user_id",
        "ts", "event_type", "purchase")
      .orderBy(col("look")).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
    val empty = Analytics.groupSequentialZ(
      Seq.empty[(Long, java.sql.Timestamp, String)]
        .toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", "purchase")
    assert(empty.count() === 0L)
  }
}
