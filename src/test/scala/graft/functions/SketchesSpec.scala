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

  // ---------------- KMV distinct sketch ----------------

  test("KMV JVM hash equals the Column 15-hex md5 prefix hash") {
    val sp = spark; import sp.implicits._
    val keys = Seq("a", "customer-917", "", "ü-multibyte", "0042", "y" * 80)
    val viaColumn = keys.toDF("k")
      .select($"k", Sketches.kmvHashCol($"k").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(Sketches.kmvHash(k) === viaColumn(k), s"kmv hash mismatch for '$k'")
      assert(Sketches.kmvHash(k) >= 0, "60-bit hash must be non-negative")
    }
  }

  test("KMV signature is the k smallest distinct hashes, partition-order independent") {
    val sp = spark; import sp.implicits._
    val k = 16
    val rows = (1 to 400).map(i => s"v${i % 123}") // 123 distinct, with repeats
    val km = udaf(Sketches.kmv(k))
    def sig(parts: Int): Seq[Long] = rows.toDF("k").repartition(parts)
      .agg(km($"k").as("sig")).as[Seq[Long]].collect().head
    val s1 = sig(1)
    assert(s1 === sig(11), "signature must not depend on partitioning")
    val expected = (0 until 123).map(i => Sketches.kmvHash(s"v$i"))
      .distinct.sorted.take(k)
    assert(s1 === expected, "signature must be the k smallest distinct hashes")
    assert(s1 === s1.sorted && s1.distinct.size === s1.size)
  }

  test("KMV estimate is exact below k and within 5/sqrt(k) relative error above") {
    val sp = spark; import sp.implicits._
    val k = 64
    val km = udaf(Sketches.kmv(k))
    // below k: 40 distinct values -> estimate must be exactly 40.0
    val small = (1 to 200).map(i => s"s${i % 40}").toDF("k")
      .agg(km($"k").as("sig"))
      .select(Sketches.kmvEstimate($"sig", k).as("est"))
      .as[Double].collect().head
    assert(small === 40.0)
    // above k: 5000 distinct -> relative error should be ~1/sqrt(63)
    val big = (1 to 5000).map(i => s"b$i").toDF("k").repartition(9)
      .agg(km($"k").as("sig"))
      .select(Sketches.kmvEstimate($"sig", k).as("est"))
      .as[Double].collect().head
    assert(math.abs(big - 5000.0) / 5000.0 < 5.0 / math.sqrt(k.toDouble),
      s"KMV estimate $big too far from 5000")
  }

  test("KMV intersection estimate tracks true overlap and nails disjoint/identical") {
    val sp = spark; import sp.implicits._
    val k = 64
    val km = udaf(Sketches.kmv(k))
    // A = 1..3000, B = 2001..5000 -> |A ∩ B| = 1000, |A ∪ B| = 5000
    val df = ((1 to 3000).map(i => ("A", s"e$i")) ++
      (2001 to 5000).map(i => ("B", s"e$i"))).toDF("g", "v")
    val sigs = df.groupBy($"g").agg(km($"v").as("sig"))
    val a = sigs.filter($"g" === "A").select($"sig".as("sa"))
    val b = sigs.filter($"g" === "B").select($"sig".as("sb"))
    val est = a.crossJoin(b)
      .select(Sketches.kmvIntersectEstimate($"sa", $"sb", k).as("est"))
      .as[Double].collect().head
    assert(math.abs(est - 1000.0) / 1000.0 < 0.6,
      s"intersection estimate $est too far from 1000")
    // identical sets: estimate equals the distinct estimate of the set
    val selfEst = a.crossJoin(a.select($"sa".as("sb")))
      .select(Sketches.kmvIntersectEstimate($"sa", $"sb", k).as("est"))
      .as[Double].collect().head
    val distinctEst = a.select(Sketches.kmvEstimate($"sa", k).as("e"))
      .as[Double].collect().head
    assert(selfEst === distinctEst)
    // disjoint sets: C = x1..x2000 shares nothing with A
    val c = (1 to 2000).map(i => ("C", s"x$i")).toDF("g", "v")
      .groupBy($"g").agg(km($"v").as("sig")).select($"sig".as("sb"))
    val disjoint = a.crossJoin(c)
      .select(Sketches.kmvIntersectEstimate($"sa", $"sb", k).as("est"))
      .as[Double].collect().head
    // a shared k-min member requires a shared element (md5 is injective
    // here for our purposes), so disjoint sets estimate exactly 0
    assert(disjoint === 0.0)
    // empty signatures (groups that saw only nulls): estimate is 0.0,
    // never NULL — a NULL would silently drop the pair in downstream
    // filters
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("sa", "sb")
      .select(Sketches.kmvIntersectEstimate($"sa", $"sb", k).as("est"))
      .collect().head
    assert(!empty.isNullAt(0) && empty.getDouble(0) === 0.0,
      "empty-signature pair must estimate 0.0, not NULL")
  }

  test("streaming KMV distinct equals the batch signature after any micro-batch slicing") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = graft.streaming.Streams
      .streamingKmvDistinct(input.toDF().toDF("g", "v"), "g", "v", k = 16)
      .writeStream.format("memory").queryName("kmvstream")
      .outputMode("complete").start()
    val batch1 = (1 to 150).map(i => ("a", s"x${i % 40}")) ++
      (1 to 60).map(i => ("b", s"y$i"))
    val batch2 = (1 to 80).map(i => ("a", s"x$i")) ++ // new + repeat values
      (1 to 30).map(i => ("b", s"y${i % 10}"))
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("kmvstream")
      .select($"grp", $"sig", $"est_distinct")
      .collect().map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getDouble(2)))).toMap
    val km = udaf(Sketches.kmv(16))
    val batch = (batch1 ++ batch2).toDF("g", "v")
      .groupBy($"g").agg(km($"v").as("sig"))
      .select($"g", $"sig", Sketches.kmvEstimate($"sig", 16).as("est"))
      .collect().map(r => r.getString(0) -> ((r.getSeq[Long](1), r.getDouble(2)))).toMap
    assert(streamed === batch,
      "streaming KMV state diverged from the batch aggregation")
  }

  test("KMV state never exceeds k entries and merge handles empty sides") {
    val sp = spark; import sp.implicits._
    val k = 8
    val km = udaf(Sketches.kmv(k))
    val sig = (1 to 1000).map(i => s"m$i").toDF("k").repartition(17)
      .agg(km($"k").as("sig")).as[Seq[Long]].collect().head
    assert(sig.size === k)
    // empty input -> empty signature, estimate 0
    val empty = Seq.empty[String].toDF("k")
      .agg(km($"k").as("sig"))
      .select(Sketches.kmvEstimate($"sig", k).as("est"), $"sig")
      .collect().head
    assert(empty.getDouble(0) === 0.0)
    assert(empty.getSeq[Long](1).isEmpty)
  }
}
