package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("classifier-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // separable corpus: positives carry "excellent wonderful", negatives
  // "terrible awful"; shared filler words appear in both classes
  private def corpus = {
    val sp = spark; import sp.implicits._
    ((1L to 20L).map(i => (i, s"the quick item excellent wonderful number $i", 1.0)) ++
      (21L to 40L).map(i => (i, s"the quick item terrible awful number $i", 0.0)))
      .toDF("doc_id", "text", "y")
  }

  test("gradient descent separates a separable corpus; scores order by class") {
    val w = Classifier.trainTextClassifier(corpus, "doc_id", "text", "y",
      nBuckets = 64, rounds = 20, lr = 1.0)
    val scored = Classifier.scoreTextClassifier(corpus, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    val pos = (1L to 20L).map(scored(_))
    val neg = (21L to 40L).map(scored(_))
    assert(pos.map(_._1).min > neg.map(_._1).max,
      s"positive scores must dominate: pos=${pos.map(_._1).min} neg=${neg.map(_._1).max}")
    assert(pos.forall(_._2) && neg.forall(p => !p._2),
      "preds wrong on a separable corpus")
  }

  test("training is deterministic under repartitioning (decimal-sum lockstep)") {
    def weights(parts: Int) =
      Classifier.trainTextClassifier(corpus.repartition(parts),
          "doc_id", "text", "y", nBuckets = 64, rounds = 5, lr = 0.5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(weights(1) === weights(7), "partitioning changed the trained weights")
  }

  test("weight table shape: present buckets plus one bias row; absent buckets score as zero") {
    val w = Classifier.trainTextClassifier(corpus, "doc_id", "text", "y",
      nBuckets = 64, rounds = 2, lr = 0.5)
    val rows = w.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.count(_._1 == -1L) === 1, "exactly one bias row at bucket -1")
    assert(rows.forall { case (b, _) => b >= -1 && b < 64 })
    // scoring a doc of entirely unseen tokens = σ̃(bias) — no crash, no null
    val sp = spark; import sp.implicits._
    val oov = Seq((99L, "zzz qqq www")).toDF("doc_id", "text")
    val got = Classifier.scoreTextClassifier(oov, "doc_id", "text", w).collect()
    assert(got.length === 1 && !got.head.isNullAt(1))
  }
}
