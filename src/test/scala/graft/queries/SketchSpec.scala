package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregations have no cross-engine hash oracle (HLL++ and the
  * quantile sketch are implementation-defined), so q43's driver check is
  * rows-only; this spec is the accuracy gate — each estimate must sit
  * within its sketch's error bound of the exact twin. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("sketch-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("approx_count_distinct tracks exact distinct within HLL++ rsd bounds") {
    val approx = Queries.byName("q43_approx_sketches").run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Queries.t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // default rsd is 5%; allow 3 sigma
      assert(math.abs(a - e) <= math.max(1.0, 0.15 * e),
        s"$k: approx $a vs exact $e")
    }
  }

  test("percentile_approx median sits inside the exact p40–p60 bracket") {
    val approx = Queries.byName("q43_approx_sketches").run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val bracket = Queries.t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.4)").as("p40"),
        expr("percentile(value, 0.6)").as("p60"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    bracket.foreach { case (k, (lo, hi)) =>
      val a = approx(k)
      assert(a >= lo && a <= hi, s"$k: approx median $a outside [$lo, $hi]")
    }
  }
}
