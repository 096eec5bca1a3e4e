package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants of the context-chunking operator: for any
  * document and any (chunk, stride) configuration, the windows must cover
  * every token, be clamped to the chunk size, and — at stride == chunk —
  * partition the token sequence exactly. */
class ChunkingPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("chunking-property-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val genCase = for {
    n <- Gen.choose(0, 120)
    chunk <- Gen.choose(1, 40)
    stride <- Gen.choose(1, chunk) // stride ≤ chunk: overlapping or exact
  } yield (n, chunk, stride)

  test("windows cover all tokens, clamp to chunk size, partition at stride==chunk") {
    val prop = Prop.forAll(genCase) { case (n, chunk, stride) =>
      val text = (0 until n).map(i => s"w$i").mkString(" ")
      val df = spark.createDataFrame(Seq((1L, text))).toDF("doc_id", "text")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
        .select(TextAnalysis.chunkWindows(col("tk"), chunk, stride).as("w"))
      val windows = df.collect().head.getSeq[String](0)
        .map(s => if (s.isEmpty) Seq.empty else s.split(" ").toSeq)
      if (n == 0) windows.isEmpty
      else {
        val covered = windows.flatten.toSet == (0 until n).map(i => s"w$i").toSet
        val clamped = windows.forall(_.length <= chunk)
        val fullButLast = windows.dropRight(1).forall(_.length == chunk) ||
          stride < chunk // overlap mode: only the stride==chunk case partitions
        val partitionExact = stride != chunk ||
          windows.flatten == (0 until n).map(i => s"w$i")
        covered && clamped && fullButLast && partitionExact
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
