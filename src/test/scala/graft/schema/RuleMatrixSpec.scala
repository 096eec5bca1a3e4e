package graft.schema

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Queries

/** Safety proof for the auto-apply rule: every query in the operator
  * matrix must return byte-identical results with the pruning rule on and
  * off (sf0.001, same session, rule toggled via its config gate). */
class RuleMatrixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("rule-matrix-spec")
      .config("spark.sql.extensions", "graft.schema.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // The matrix is generated from Queries.all, so it can never silently
  // subset a grown battery — and this gate puts the count in the spec
  // OUTPUT so a round record shows matrix size = battery size.
  test(s"rule-invariance matrix covers the full battery of ${Queries.all.size} queries") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    assert(names.size === graft.SparkEntry.queries.size,
      "matrix and driver surface disagree on the battery")
  }

  Queries.all.foreach { q =>
    test(s"${q.name} is rule-invariant") {
      spark.conf.set("spark.graft.schemaOnRead.enabled", "false")
      val off = q.run(spark, dir).collect().map(_.toString).toSeq
      spark.conf.set("spark.graft.schemaOnRead.enabled", "true")
      val on = q.run(spark, dir).collect().map(_.toString).toSeq
      assert(on == off, s"rule changed results for ${q.name}")
    }
  }

  // The DSv2 rewrite arm gets the same treatment over a representative
  // slice of the matrix (agg, joins, explode, struct, window, JSON,
  // rollup, kernels, sink roundtrip, text) with parquet forced to V2.
  private val v2Slice = Seq("q01_groupby_agg", "q03_join_agg", "q09_explode_tokens",
    "q12_rollup", "q20_json_extract", "q23_struct_roundtrip", "q26_asof_join",
    "q31_sink_roundtrip", "d02_jaccard_pairs", "t01_text_stats")

  v2Slice.foreach { name =>
    test(s"$name is rule-invariant with parquet forced to DSv2") {
      val q = Queries.byName(name)
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      try {
        spark.conf.set("spark.graft.schemaOnRead.enabled", "false")
        val off = q.run(spark, dir).collect().map(_.toString).toSeq
        spark.conf.set("spark.graft.schemaOnRead.enabled", "true")
        val on = q.run(spark, dir).collect().map(_.toString).toSeq
        assert(on == off, s"V2 rule changed results for $name")
      } finally {
        spark.conf.unset("spark.sql.sources.useV1SourceList")
        spark.conf.set("spark.graft.schemaOnRead.enabled", "true")
      }
    }
  }
}
