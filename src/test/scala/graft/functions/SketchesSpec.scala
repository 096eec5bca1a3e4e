package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom count-min sketch: JVM builder and Column estimator must
  * hash identically, estimates must obey the CM guarantees, and the
  * merged state must be partition-order independent.
  */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("sketches-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("JVM base hash equals the Column md5-prefix hash for arbitrary keys") {
    val sp = spark; import sp.implicits._
    val keys = Seq("a", "supplier-17", "", "ü-multibyte", "0042", "x" * 100)
    val viaColumn = keys.toDF("k")
      .select($"k", conv(substring(md5($"k"), 1, 7), 16, 10).cast("long").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(Sketches.cmBaseHash(k) === viaColumn(k), s"hash mismatch for '$k'")
    }
  }

  test("estimates never undercount, bound overcount, and match exact when uncontested") {
    val sp = spark; import sp.implicits._
    val width = 128
    // 20 distinct keys with known multiplicities, far fewer than width
    val rows = (1 to 20).flatMap(i => Seq.fill(i * 3)(s"key-$i"))
    val df = rows.toDF("k").repartition(7)
    val cm = udaf(Sketches.countMin(width))
    val sketch = df.agg(cm($"k").as("sk"))
    val got = (1 to 20).map(i => s"key-$i").toDF("k")
      .crossJoin(broadcast(sketch))
      .select($"k", Sketches.cmEstimate($"sk", $"k", width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 20).foreach { i =>
      val exact = i * 3L
      val est = got(s"key-$i")
      assert(est >= exact, s"CM undercounted key-$i: $est < $exact")
      assert(est <= exact + 2L * rows.length / width + 1,
        s"CM overcount out of bound for key-$i: $est vs exact $exact")
    }
    // an absent key estimates at most the collision noise, not a real count
    val ghost = Seq("no-such-key").toDF("k").crossJoin(broadcast(sketch))
      .select(Sketches.cmEstimate($"sk", $"k", width)).collect().head.getLong(0)
    assert(ghost <= 2L * rows.length / width + 1, s"ghost key estimated $ghost")
  }

  test("count-min aggregates identically over a stream (state merges across batches)") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val cm = udaf(Sketches.countMin(64))
    val q = input.toDF().toDF("k").agg(cm($"k").as("sk"))
      .writeStream.format("memory").queryName("cmstream")
      .outputMode("complete").start()
    val batch1 = (1 to 200).map(i => s"k${i % 23}")
    val batch2 = (1 to 100).map(i => s"k${i % 7}")
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cmstream")
      .select($"sk.counters").as[Seq[Long]].collect().head
    val batch = (batch1 ++ batch2).toDF("k").agg(cm($"k").as("sk"))
      .select($"sk.counters").as[Seq[Long]].collect().head
    assert(streamed === batch,
      "streaming CM state diverged from the batch aggregation")
  }

  test("depth is a real parameter: deeper sketches keep the guarantees via the extended hash family") {
    val sp = spark; import sp.implicits._
    val width = 64
    val rows = (1 to 30).flatMap(i => Seq.fill(i)(s"key-$i"))
    for (depth <- Seq(2, 6)) { // below and above the 4 published LCG rows
      val cm = udaf(Sketches.countMin(width, depth))
      val sketch = rows.toDF("k").repartition(5).agg(cm($"k").as("sk"))
      val counters = sketch.select($"sk.counters").as[Seq[Long]].collect().head
      assert(counters.length === depth * width, s"state not depth x width at depth $depth")
      // every row holds exactly N increments — each update touched all rows
      (0 until depth).foreach { r =>
        assert(counters.slice(r * width, (r + 1) * width).sum === rows.length.toLong,
          s"row $r of depth-$depth sketch lost counts")
      }
      val got = (1 to 30).map(i => s"key-$i").toDF("k")
        .crossJoin(broadcast(sketch))
        .select($"k", Sketches.cmEstimate($"sk", $"k", width, depth).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (1 to 30).foreach { i =>
        assert(got(s"key-$i") >= i.toLong,
          s"depth-$depth sketch undercounted key-$i: ${got(s"key-$i")} < $i")
      }
    }
    // extended rows are well-formed multipliers: a ∈ [1, P−1], deterministic
    val (a4, b4) = Sketches.cmHashParams(4)
    assert(a4 >= 1 && a4 < 2147483647L && b4 >= 0 && b4 < 2147483647L)
    assert(Sketches.cmHashParams(4) === Sketches.cmHashParams(4))
    assert(Sketches.cmHashParams(4) !== Sketches.cmHashParams(5))
  }

  test("sketch state is partition-order independent (integer merges)") {
    val sp = spark; import sp.implicits._
    val rows = (1 to 500).map(i => s"k${i % 37}")
    val cm = udaf(Sketches.countMin(64))
    def state(parts: Int): Seq[Long] = rows.toDF("k").repartition(parts)
      .agg(cm($"k").as("sk")).select($"sk.counters").as[Seq[Long]].collect().head
    assert(state(1) === state(13))
  }
}
