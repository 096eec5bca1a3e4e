package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

// (exact-gap boundary semantics are pinned in "sessionize: a gap of
// exactly gapSec stays one session" below — Spark's session_window and
// the lag-based formulation agree, both split only on STRICTLY greater)
class TemporalJoinsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("temporal-joins-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("as-of join takes ALL payload fields from the single matched right row") {
    // right rows: (ts=1, p=5, q="a"), (ts=2, p=null, q="b") — the as-of
    // match for a left row at ts=3 is the ts=2 row, INCLUDING its null p
    val left = spark.createDataFrame(Seq((1L, ts(3), "L"))).toDF("k", "t", "tag")
    val right = spark.createDataFrame(Seq(
      (1L, ts(1), Some(5), "a"),
      (1L, ts(2), None: Option[Int], "b"))).toDF("k", "rt", "p", "q")
    val out = TemporalJoins.asOf(left, right, "k", "t", "rt", Seq("p", "q")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("p"))) // NOT the stale p=5
    assert(out.head.getAs[String]("q") == "b")
  }

  test("as-of join matches even when the latest payload field is null") {
    val left = spark.createDataFrame(Seq((1L, ts(3), "L"))).toDF("k", "t", "tag")
    val right = spark.createDataFrame(Seq((1L, ts(2), None: Option[Int])))
      .toDF("k", "rt", "p")
    val out = TemporalJoins.asOf(left, right, "k", "t", "rt", Seq("p")).collect()
    assert(out.length == 1) // match must not be dropped because p is null
    assert(out.head.isNullAt(out.head.fieldIndex("p")))
  }

  test("as-of join drops left rows with no earlier right row") {
    val left = spark.createDataFrame(Seq((1L, ts(1), "L"))).toDF("k", "t", "tag")
    val right = spark.createDataFrame(Seq((1L, ts(2), 7))).toDF("k", "rt", "p")
    assert(TemporalJoins.asOf(left, right, "k", "t", "rt", Seq("p")).count() == 0)
  }

  test("sessionize: a gap of exactly gapSec stays one session (all three paths)") {
    import org.apache.spark.sql.functions._
    // 10:00 and 10:10 with gap 600s: boundary is INCLUSIVE everywhere
    val df = spark.createDataFrame(Seq((1L, ts(0)), (1L, ts(10)))).toDF("user_id", "ts")
    val lagBased = TemporalJoins.sessionize(df, "user_id", "ts", 600L)
      .select(col("session_id")).distinct().count()
    assert(lagBased == 1, "lag-based sessionize split at the exact gap")
    val windowed = df.groupBy(col("user_id"), session_window(col("ts"), "600 seconds"))
      .count().count()
    assert(windowed == 1, "session_window split at the exact gap")
    // one microsecond beyond the gap starts a new session
    val over = df.withColumn("ts",
      when(col("ts") === ts(10), col("ts") + expr("INTERVAL 0.000001 SECONDS"))
        .otherwise(col("ts")))
    assert(TemporalJoins.sessionize(over, "user_id", "ts", 600L)
      .select(col("session_id")).distinct().count() == 2)
  }

  test("salted equi-join returns exactly the plain equi-join's rows") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    // hot key: 40 of 45 fact rows share key "hot"; dim has an extra key
    // with no fact rows (must not leak in) and the fact an unmatched key
    val fact = ((1 to 40).map(i => ("hot", i.toLong)) ++
      (41 to 44).map(i => ("cold", i.toLong)) :+ ("orphan", 45L))
      .toDF("k", "id")
    val dim = Seq(("hot", 10L), ("cold", 20L), ("unused", 30L)).toDF("k", "payload")
    val salted = SkewJoins.saltedEquiJoin(fact, dim, "k", saltBuckets = 4,
      saltSource = $"id")
    val plain = fact.join(dim, Seq("k"))
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == 44)
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
    // shared non-key columns are rejected, not silently duplicated
    val ex = intercept[IllegalArgumentException] {
      SkewJoins.saltedEquiJoin(fact, dim.withColumnRenamed("payload", "id"),
        "k", 4, $"id")
    }
    assert(ex.getMessage.contains("id"))
  }

  test("intervalOverlap equals the naive theta join, emits each pair " +
      "once, and plans as an equi-join") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(17)
    val left = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong; (i.toLong, s, s + rnd.nextInt(40))
    }.toDF("lid", "a_start", "a_end")
    val right = (1 to 150).map { i =>
      val s = rnd.nextInt(500).toLong; (i.toLong, s, s + rnd.nextInt(40))
    }.toDF("rid", "b_start", "b_end")
    val naive = left.crossJoin(right)
      .filter($"a_start" <= $"b_end" && $"b_start" <= $"a_end")
      .select($"lid", $"rid")
    // cell far smaller, comparable to, and far larger than the spans:
    // identical pairs every time, and no duplicates from shared cells
    for (cell <- Seq(3L, 32L, 10000L)) {
      val grid = TemporalJoins.intervalOverlap(left, right,
        "a_start", "a_end", "b_start", "b_end", cellSize = cell)
      val pairs = grid.select($"lid", $"rid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.length === pairs.distinct.length,
        s"cell=$cell emitted duplicate pairs")
      assert(pairs.toSet === naive.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet, s"cell=$cell diverged")
    }
    // with an equi-key, only same-key pairs survive
    val lk = left.withColumn("k", $"lid" % 3)
    val rk = right.withColumn("k", $"rid" % 3)
    val keyed = TemporalJoins.intervalOverlap(lk, rk,
        "a_start", "a_end", "b_start", "b_end", cellSize = 16L,
        keys = Seq("k"))
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val naiveKeyed = lk.as("l").join(rk.as("r"),
        $"l.k" === $"r.k" && $"l.a_start" <= $"r.b_end" &&
          $"r.b_start" <= $"l.a_end")
      .select($"lid", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(keyed === naiveKeyed)
    // the scale claim: the physical plan must be a shuffle/broadcast
    // EQUI join on the cell, never a nested loop over the inputs
    val plan = TemporalJoins.intervalOverlap(left, right,
        "a_start", "a_end", "b_start", "b_end", cellSize = 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop plan:\n$plan")
  }
}
