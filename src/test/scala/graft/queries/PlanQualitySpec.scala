package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan hygiene: the shapes that decide whether a query survives
  * a 100× scale-up. Checked on the executed plan at sf0.001 with AQE off
  * (stable shapes). */
class PlanQualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("plan-quality-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String =
    Queries.byName(name).run(spark, dir).queryExecution.executedPlan.toString

  test("q02 pushes the filter into the parquet scan and prunes columns") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(o_totalprice)"), p.take(2000))
    // scan must not read all 9 order columns for a 4-column projection
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"), readSchema)
  }

  test("q06 small-dimension join is a broadcast hash join") {
    val p = plan("q06_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q03 three-way join uses hash joins, never a cartesian product") {
    val p = plan("q03_join_agg")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q01 aggregation is two-phase (map-side partial combine)") {
    val p = plan("q01_groupby_agg")
    assert(p.contains("partial_"), p.take(2000)) // partial_count/partial_sum before the exchange
  }

  test("d03 LSH candidate join is an equi join on (band, key)") {
    val p = plan("d03_minhash_lsh")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q26 as-of join is window-based — no nested-loop range join") {
    val p = plan("q26_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("q27 range join is an equi join on (key, bucket), not a nested loop") {
    val p = plan("q27_range_join")
    assert(p.contains("SortMergeJoin") || p.contains("HashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("whole-stage codegen covers the scan→filter→project pipeline") {
    val p = plan("q02_filter_project")
    // codegen'd stages print with a `*(n)` prefix; filter+project must be inside one
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Filter")), p.take(2000))
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")), p.take(2000))
  }
}
