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
}
