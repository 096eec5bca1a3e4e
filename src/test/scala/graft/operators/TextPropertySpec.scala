package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the text family: winnowing's central
  * guarantee (a shared substring of length ≥ window + kgram − 1 always
  * yields a shared fingerprint) on random documents, and BM25 scores
  * against an independent local reference implementation.
  */
class TextPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("text-property-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // random lowercase documents plus a shared fragment long enough to
  // trigger the guarantee for (kgram=5, window=4): >= 8 chars
  private val genShared = for {
    frag <- Gen.listOfN(12, Gen.alphaLowerChar).map(_.mkString)
    pre1 <- Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    suf1 <- Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    pre2 <- Gen.listOfN(9, Gen.alphaLowerChar).map(_.mkString)
    suf2 <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
  } yield (s"$pre1$frag$suf1", s"$pre2$frag$suf2")

  test("winnowing guarantee: any 12-char shared fragment yields a shared fingerprint") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genShared) { case (t1, t2) =>
      val fp = TextAnalysis.winnowFingerprints(
        Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (fp.getOrElse(1L, Set.empty) & fp.getOrElse(2L, Set.empty)).nonEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  /** Independent local BM25 (Lucene idf form, distinct query terms). */
  private def refBm25(corpus: Seq[(Long, String)], query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    def toks(t: String) = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
    val tf = corpus.map { case (id, t) =>
      id -> toks(t).groupBy(identity).view.mapValues(_.size).toMap
    }.toMap
    val lens = tf.view.mapValues(_.values.sum.toDouble).toMap
    val n = corpus.size.toDouble
    val avgdl = lens.values.sum / n
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    corpus.map { case (id, _) =>
      val s = query.distinct.map { t =>
        val cnt = tf(id).getOrElse(t, 0).toDouble
        if (cnt == 0) BigDecimal(0)
        else {
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          BigDecimal(idf * cnt * (k1 + 1) /
            (cnt + k1 * (1 - b + b * lens(id) / avgdl)))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      id -> s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  private val genCorpus = for {
    nDocs <- Gen.choose(2, 6)
    vocab <- Gen.const(Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
    docs <- Gen.listOfN(nDocs, Gen.choose(3, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    qLen <- Gen.choose(1, 3)
    q <- Gen.listOfN(qLen, Gen.oneOf(vocab))
  } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, q)

  test("bm25TopK scores match an independent local reference on random corpora") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genCorpus) { case (docs, query) =>
      val expect = refBm25(docs, query).filter(_._2 > 0)
      val got = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"),
        Seq((99L, query.mkString(" "))).toDF("doc_id", "text"),
        "doc_id", "text", "doc_id", "text", k = docs.size)
        .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
      got.keySet == expect.keySet &&
        got.forall { case (id, s) => math.abs(s - expect(id)) <= 1e-6 }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // small random corpora over a tiny alphabet: heavy pair collisions,
  // ties, repeated words — the adversarial ground for merge ordering
  private val genBpeCorpus = for {
    nDocs <- Gen.choose(1, 4)
    docs <- Gen.listOfN(nDocs, Gen.listOfN(6,
      Gen.listOfN(4, Gen.oneOf('a', 'b', 'c')).map(_.mkString)).map(_.mkString(" ")))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("bpeMergesBatched at batch=1 equals classic bpeMerges on random corpora") {
    val sp = spark; import sp.implicits._
    val prop = Prop.forAll(genBpeCorpus) { docs =>
      val df = docs.toDF("doc_id", "text")
      val classic = TextAnalysis.bpeMerges(df, "text", nMerges = 6)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val batched = TextAnalysis.bpeMergesBatched(df, "text", rounds = 6, batch = 1)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      batched == classic
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
