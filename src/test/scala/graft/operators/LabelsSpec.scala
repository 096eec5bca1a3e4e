package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Label-quality family: majority vote and agreement audited against a
  * hand-built two-cluster fixture with one planted mislabel — the
  * audit must flag exactly the mislabeled point, and the classifier
  * must correct it. */
class LabelsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("labels-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // two tight clusters; id 4 sits in cluster A but carries cluster B's
  // label (the planted annotation error); id 9 is label-less
  private def vecs = {
    val sp = spark; import sp.implicits._
    Seq(
      (1L, Array(1.0f, 0.00f), Some(0)),
      (2L, Array(1.0f, 0.01f), Some(0)),
      (3L, Array(1.0f, 0.02f), Some(0)),
      (4L, Array(1.0f, 0.03f), Some(1)), // mislabeled
      (5L, Array(0.00f, 1.0f), Some(1)),
      (6L, Array(0.01f, 1.0f), Some(1)),
      (7L, Array(0.02f, 1.0f), Some(1)),
      (8L, Array(0.03f, 1.0f), Some(1)),
      (9L, Array(1.0f, 0.015f), None)) // no label: casts no vote
      .toDF("vec_id", "embedding", "label")
  }

  test("audit flags the planted mislabel; classifier corrects it; null labels cast no vote") {
    val sp = spark; import sp.implicits._
    val audit = Labels.knnLabelAudit(vecs, vecs, 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getInt(3), r.getLong(4))).toMap
    // id 4's 3 nearest are all cluster A (9 votes nothing): agreement 0,
    // prediction corrected to 0
    val (own4, agree4, pred4, _) = audit(4L)
    assert(own4 === 1 && agree4 === 0.0 && pred4 === 0,
      s"mislabel not flagged: ${audit(4L)}")
    // clean cluster-B members agree fully
    Seq(6L, 7L).foreach { id =>
      val (own, agree, pred, _) = audit(id)
      assert(own === 1 && agree === 1.0 && pred === 1, s"$id: ${audit(id)}")
    }
    // id 9 has no label: absent from the audit (nothing to audit) but
    // still gets a PREDICTION from the classifier
    assert(!audit.contains(9L))
    val preds = Labels.knnClassify(vecs, vecs, 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(preds(9L)._1 === 0, s"label-less point prediction: ${preds(9L)}")
    // a cluster-A point whose neighborhood contains the mislabel and
    // the label-less point: votes come only from LABELED neighbors
    // (id 2's 3 nearest are 3, 9, 1 -> votes {0:2}, label-less ignored)
    assert(preds(2L) === ((0, 2L)), s"null-label vote leaked: ${preds(2L)}")
  }

  test("contrastive mining: confusable impostor is the top hard negative, straggler the top hard positive") {
    val out = Labels.contrastiveMine(vecs, vecs, kNeg = 2, kPos = 2).collect()
    // query 1 (label 0, cluster A): the mislabeled id 4 sits IN cluster A
    // with label 1 — exactly the confusable a contrastive loss needs first
    val neg1 = out.filter(r => r.getLong(0) == 1L && r.getString(1) == "neg")
      .sortBy(_.getInt(2))
    assert(neg1.length === 2 && neg1.head.getLong(3) === 4L,
      s"top hard negative for 1 must be the planted mislabel: ${neg1.mkString(";")}")
    assert(neg1(0).getDouble(4) >= neg1(1).getDouble(4),
      "negatives must rank by cosine DESC")
    // query 5 (label 1, cluster B): its LEAST-similar same-label point is
    // the cluster-A mislabel — the hard positive
    val pos5 = out.filter(r => r.getLong(0) == 5L && r.getString(1) == "pos")
      .sortBy(_.getInt(2))
    assert(pos5.head.getLong(3) === 4L,
      s"top hard positive for 5 must be the mislabel: ${pos5.mkString(";")}")
    assert(pos5(0).getDouble(4) <= pos5(1).getDouble(4),
      "positives must rank by cosine ASC")
    // the label-less id 9 is neither query nor pair, ranks stay bounded,
    // and no pair is a self-pair
    assert(!out.exists(r => r.getLong(0) == 9L || r.getLong(3) == 9L))
    assert(out.forall(r => r.getInt(2) <= 2 && r.getLong(0) != r.getLong(3)))
    // labels are carried faithfully: neg rows differ, pos rows agree
    assert(out.forall(r => if (r.getString(1) == "neg") r.getInt(5) != r.getInt(6)
      else r.getInt(5) == r.getInt(6)))
  }

  test("majority ties break to the smallest label, deterministically") {
    val sp = spark; import sp.implicits._
    // neighbor frame built by hand: two labels with equal votes
    val neighbors = Seq((100L, 1, 1L), (100L, 2, 2L), (100L, 3, 5L), (100L, 4, 6L))
      .toDF("query_id", "rank", "neighbor_id")
    val labels = Seq((1L, 7), (2L, 7), (5L, 3), (6L, 3))
      .toDF("vec_id", "label")
    val out = Labels.classifyFromNeighbors(neighbors, labels).collect()
    assert(out.length === 1)
    assert(out.head.getInt(1) === 3 && out.head.getLong(2) === 2L,
      s"tie must go to the smallest label: ${out.head}")
  }
}
