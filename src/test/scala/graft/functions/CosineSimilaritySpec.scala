package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("cosine-expr-spec")
      .config("spark.sql.extensions", "graft.schema.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private var pq: String = _

  private def vecs = {
    if (pq == null) {
      pq = java.nio.file.Files.createTempDirectory("cos-spec").toString + "/v"
      spark.createDataFrame(
        (1L to 50L).map(i => (i, Array.tabulate(16)(d => ((i * 7 + d * 3) % 11 - 5) / 5.0f),
          Array.tabulate(16)(d => ((i * 5 + d * 2) % 13 - 6) / 6.0f)))
      ).toDF("id", "a", "b").write.parquet(pq)
    }
    spark.read.parquet(pq)
  }

  test("graft_cosine matches the Column HOF formulation and the kernel") {
    val df = vecs
    val rows = df.select(col("id"),
      call_function("graft_cosine", col("a"), col("b")).as("native"),
      graft.operators.Similarity.cosine(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"id=${r.getLong(0)}")
    }
    val one = df.filter(col("id") === 7L).collect().head
    val k = graft.operators.Similarity.cosineKernel(
      one.getSeq[Float](1).toArray, one.getSeq[Float](2).toArray)
    val n = rows.find(_.getLong(0) == 7L).get.getDouble(1)
    assert(k == n)
  }

  test("graft_cosine works from SQL text and inside codegen stages") {
    vecs.createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT id, graft_cosine(a, b) AS cs FROM vecs WHERE graft_cosine(a, b) > -2 ORDER BY id")
    assert(out.collect().length == 50) // materialize so AQE finalizes stages
    // the filter+project stage must be codegen'd (native expression, no fallback)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Filter")), plan.take(1500))
  }

  test("null and type handling") {
    vecs.createOrReplaceTempView("vecs")
    val n = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<FLOAT>), b) AS cs FROM vecs LIMIT 1").collect().head
    assert(n.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_cosine"))
  }
}
