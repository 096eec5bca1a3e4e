package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The k-means codebook trainer feeding the IVF index: deterministic,
  * distributed update step, and good enough that IVF over a trained
  * codebook reproduces exact knn on separable data. */
class KMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("kmeans-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // 30 vectors in 3 well-separated clusters: dominant axis c = id % 3,
  // deterministic small jitter on higher dims.
  private def corpus = spark.createDataFrame((0L until 30L).map { id =>
    val v = new Array[Float](8)
    v((id % 3).toInt) = 1.0f
    v(3 + (id % 4).toInt) = 0.05f * (1 + (id % 3))
    v(7) = 0.01f * (id % 5)
    (id, v)
  }).toDF("vec_id", "embedding")

  private def queries = spark.createDataFrame(Seq(
    (100L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (101L, Array(0f, 1.0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (102L, Array(0f, 0f, 1.0f, 0f, 0f, 0f, 0f, 0f)))).toDF("vec_id", "embedding")

  test("trained codebook recovers the three cluster directions") {
    val cb = Similarity.kmeansCodebook(corpus, "vec_id", "embedding", k = 3, iters = 3)
    assert(cb.length == 3)
    val dominantAxes = cb.map(c => c.indexOf(c.max)).toSet
    assert(dominantAxes == Set(0, 1, 2), s"got axes $dominantAxes")
    // deterministic: a second training run yields bit-identical centroids
    val cb2 = Similarity.kmeansCodebook(corpus, "vec_id", "embedding", k = 3, iters = 3)
    assert(cb.map(_.toSeq).toSeq == cb2.map(_.toSeq).toSeq)
  }

  test("IVF over the trained codebook matches exact knn on separable data") {
    val cb = Similarity.kmeansCodebook(corpus, "vec_id", "embedding", k = 3, iters = 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = rows(Similarity.knnKernel(queries, corpus, 3))
    val ivf = rows(Similarity.ivfKnnCodebook(queries, corpus, 3, cb, probes = 1))
    assert(ivf == exact)
  }
}
