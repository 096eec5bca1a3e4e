package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SynthDocsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("synth-docs-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def read(rows: Int, parts: Int) =
    spark.read.format("graft.sources.SynthDocs")
      .option("rows", rows).option("partitions", parts).load()

  test("produces the requested row count across splittable partitions") {
    val df = read(1000, 8)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.select(countDistinct(col("doc_id"))).head().getLong(0) == 1000)
  }

  test("content is deterministic and independent of partitioning") {
    val a = read(200, 2).collect().map(_.toString).sorted.toSeq
    val b = read(200, 7).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("column pruning is pushed into the source") {
    val df = read(100, 2).select(col("doc_id"), col("lang"))
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("doc_id", "lang"))
    assert(df.count() == 100)
  }

  test("n_chars matches text length") {
    val bad = read(500, 4).filter(length(col("text")) =!= col("n_chars")).count()
    assert(bad == 0)
  }

  test("composes with engine operators (dedup over the source)") {
    val groups = graft.operators.Dedup.exactGroups(read(300, 4), "text", "doc_id")
    assert(groups.select(sum(col("n_dups"))).head().getLong(0) == 300)
  }
}
