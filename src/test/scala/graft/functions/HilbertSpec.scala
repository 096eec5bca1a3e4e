package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native graft_hilbert expression: the index must be a bijection onto
  * [0, 4^bits) whose consecutive values are always grid neighbors (the
  * locality property that makes it a better layout key than Morton),
  * and the SQL/Column/codegen paths must agree with the kernel.
  */
class HilbertSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("hilbert-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.schema.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("kernel is a bijection with unit-step adjacency on the full order-6 grid") {
    val order = 6
    val n = 1 << order
    val byD = new Array[(Int, Int)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = HilbertIndex.xy2d(order, x.toLong, y.toLong)
      assert(d >= 0 && d < n.toLong * n, s"index $d out of range for ($x,$y)")
      assert(byD(d.toInt) == null, s"collision at d=$d: ($x,$y) vs ${byD(d.toInt)}")
      byD(d.toInt) = (x, y)
    }
    // THE Hilbert property (and what Morton lacks): every step along the
    // curve moves to a 4-neighbor — no jumps, ever
    for (d <- 0 until n * n - 1) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumps from ($x1,$y1) to ($x2,$y2) at d=$d")
    }
    // order-1 base case: the U-shaped visit (0,0)->(0,1)->(1,1)->(1,0)
    assert(Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .map { case (x, y) => HilbertIndex.xy2d(1, x, y) } === Seq(0L, 1L, 2L, 3L))
  }

  test("coordinates are masked into the grid; files get tighter boxes than Morton") {
    // masking: x = n + 3 behaves as x = 3
    assert(HilbertIndex.xy2d(4, 19L, 5L) === HilbertIndex.xy2d(4, 3L, 5L))
    assert(HilbertIndex.xy2d(4, -1L & 15L, 0L) === HilbertIndex.xy2d(4, 15L, 0L))
    // the layout claim, measured the way min/max skipping experiences it:
    // range-partitioning the curve into equal index slices ("files"),
    // the sum of per-file bounding-box areas — what a range predicate
    // intersects — must be tighter for Hilbert. At power-of-4 file
    // counts both curves split into perfect quadrants, so use the
    // realistic unaligned counts where Morton's Z-jumps stretch boxes
    // across the seams.
    val order = 6; val n = 1 << order
    def bboxTotal(f: (Long, Long) => Long, nFiles: Int): Long = {
      val pts = (for (x <- 0 until n; y <- 0 until n)
        yield (f(x.toLong, y.toLong), x, y)).sortBy(_._1)
      val per = pts.length / nFiles
      (0 until nFiles).map { i =>
        val chunk = if (i < nFiles - 1) pts.slice(i * per, (i + 1) * per)
          else pts.drop(i * per)
        val (xs, ys) = (chunk.map(_._2), chunk.map(_._3))
        (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
      }.sum
    }
    Seq(10, 23, 48).foreach { nFiles =>
      val h = bboxTotal(HilbertIndex.xy2d(order, _, _), nFiles)
      val m = bboxTotal((x, y) => ZValue.interleave(order, Array(x, y)), nFiles)
      assert(h < m,
        s"expected Hilbert bbox total ($h) < Morton ($m) at $nFiles files")
    }
  }

  test("SQL function, Column wrapper, and codegen agree with the kernel; nulls propagate") {
    val sp = spark; import sp.implicits._
    val df = (0 until 300).map(i =>
      (i.toLong, (i * 7 % 256).toLong, (i * 13 % 256).toLong)).toDF("id", "x", "y")
    df.createOrReplaceTempView("hpts")
    val viaSql = spark.sql(
      "SELECT id, graft_hilbert(8, x, y) AS h FROM hpts ORDER BY id").collect()
    val viaColumn = df.select($"id",
        graft.operators.Layout.hilbert2d(8, $"x", $"y").as("h"))
      .orderBy("id").collect()
    assert(viaSql.map(_.getLong(1)).toSeq === viaColumn.map(_.getLong(1)).toSeq)
    viaSql.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) === HilbertIndex.xy2d(8, i * 7 % 256, i * 13 % 256))
    }
    assert(spark.sql("SELECT graft_hilbert(8, CAST(NULL AS BIGINT), 3L) AS h")
      .collect().head.isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_hilbert(40, 1L, 2L)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_hilbert"))
  }

  test("k-d kernel is a bijection with unit-step adjacency (3-D orders 3-4, 4-D order 2)") {
    Seq((4, 3), (3, 3), (2, 4)).foreach { case (b, dims) =>
      val n = 1 << b
      val total = 1L << (b * dims)
      val byD = new Array[Array[Long]](total.toInt)
      def walk(prefix: List[Long], depth: Int): Unit =
        if (depth == 0) {
          val xs = prefix.reverse.toArray
          val d = HilbertIndex.axesToIndex(b, xs)
          assert(d >= 0 && d < total, s"index $d out of range for ${xs.mkString(",")}")
          assert(byD(d.toInt) == null,
            s"collision at d=$d: ${xs.mkString(",")} vs " +
              Option(byD(d.toInt)).map(_.mkString(",")).getOrElse("-"))
          byD(d.toInt) = xs
        } else (0L until n).foreach(v => walk(v :: prefix, depth - 1))
      walk(Nil, dims)
      for (d <- 0 until total.toInt - 1) {
        val diff = byD(d).zip(byD(d + 1)).map { case (a, c) => math.abs(a - c) }.sum
        assert(diff === 1L,
          s"b=$b dims=$dims curve jumps at d=$d: ${byD(d).mkString(",")} -> ${byD(d + 1).mkString(",")}")
      }
    }
    // masking: coordinates wrap into the grid
    assert(HilbertIndex.axesToIndex(4, Array(19L, 5L, 7L)) ===
      HilbertIndex.axesToIndex(4, Array(3L, 5L, 7L)))
  }

  test("3-D SQL function and codegen agree with the k-d kernel; arity bound enforced") {
    val sp = spark; import sp.implicits._
    val df = (0 until 300).map(i =>
      (i.toLong, (i * 7 % 16).toLong, (i * 13 % 16).toLong, (i * 3 % 16).toLong))
      .toDF("id", "x", "y", "z")
    df.createOrReplaceTempView("hpts3")
    val viaSql = spark.sql(
      "SELECT id, graft_hilbert(4, x, y, z) AS h FROM hpts3 ORDER BY id").collect()
    val viaColumn = df.select($"id",
        graft.operators.Layout.hilbert(4, $"x", $"y", $"z").as("h"))
      .orderBy("id").collect()
    assert(viaSql.map(_.getLong(1)).toSeq === viaColumn.map(_.getLong(1)).toSeq)
    viaSql.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) === HilbertIndex.axesToIndex(4,
        Array(i * 7 % 16, i * 13 % 16, i * 3 % 16)))
    }
    // null coordinate propagates
    assert(spark.sql("SELECT graft_hilbert(4, 1L, CAST(NULL AS BIGINT), 3L) AS h")
      .collect().head.isNullAt(0))
    // bits × dims must fit one signed long: 16 bits × 4 dims = 64 > 63
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(16, 1L, 2L, 3L, 4L)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_hilbert"))
  }

  test("bits argument fails analysis (not eval) on NULL and on Long values past Int range") {
    // a foldable NULL bits must surface as a type-check failure during
    // analysis, not an IllegalArgumentException thrown out of it
    val nullErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(CAST(NULL AS INT), 1L, 2L)").collect()
    }
    assert(nullErr.getMessage.toLowerCase.contains("graft_hilbert"))
    // 2^32 + 7 truncates to 7 as an Int — the range check must see the
    // full Long and reject, never silently index at bits=7
    val bigErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(4294967303L, 1L, 2L)").collect()
    }
    assert(bigErr.getMessage.contains("4294967303"))
  }
}
