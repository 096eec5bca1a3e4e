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
}
