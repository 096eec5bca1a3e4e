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

  test("doc_id range filters prune partitions at planning time") {
    // a TRILLION-row table: only pushdown into partition planning makes
    // this finish — the filter must never be evaluated row-by-row
    val big = spark.read.format("graft.sources.SynthDocs")
      .option("rows", 1000000000000L).option("partitions", 8).load()
    val q = big.filter(col("doc_id") >= 999999999990L && col("doc_id") < 999999999995L)
    assert(q.count() == 5)
    assert(q.select(min(col("doc_id"))).head().getLong(0) == 999999999990L)
    // results identical to an unpushed evaluation on a small table
    val small = read(100, 4)
    val pushed = small.filter(col("doc_id") >= 10 && col("doc_id") < 20)
      .collect().map(_.toString).sorted.toSeq
    val manual = small.collect().filter { r =>
      val id = r.getLong(0); id >= 10 && id < 20
    }.map(_.toString).sorted.toSeq
    assert(pushed == manual)
  }

  test("lang equality filter is enforced inside the reader") {
    val df = read(400, 4).filter(col("lang") === "de")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.head.scan.description().contains("lang=de"), scans.head.scan.description())
    val expected = read(400, 4).collect().count(_.getString(2) == "de")
    assert(df.count() == expected && expected > 0)
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
