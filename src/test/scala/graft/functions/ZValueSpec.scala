package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native graft_zvalue expression + the z-order layout claim: files laid
  * out by z-value bound EVERY dimension, a plain sort only its leading
  * key — so min/max pruning works on non-leading predicates too.
  */
class ZValueSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("zvalue-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.schema.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Reference bit-interleave, written independently of the kernel. */
  private def refZ(bits: Int, vs: Seq[Long]): Long = {
    var z = 0L
    for (i <- 0 until bits; j <- vs.indices)
      z |= ((vs(j) >> i) & 1L) << (i * vs.length + j)
    z
  }

  test("kernel matches an independent reference on random coordinates") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 200; n <- 1 to 3) {
      val bits = 1 + rnd.nextInt(63 / n)
      val vs = Array.fill(n)(rnd.nextLong().abs & ((1L << bits) - 1))
      assert(ZValue.interleave(bits, vs) === refZ(bits, vs.toSeq))
    }
  }

  test("z-value of (x, y) de-interleaves back to the masked inputs") {
    // round-trip: every bit position must be recoverable — catches any
    // overlap or dropped bit in the interleave
    for (x <- Seq(0L, 1L, 5L, 255L); y <- Seq(0L, 2L, 170L, 255L)) {
      val z = ZValue.interleave(8, Array(x, y))
      val gotX = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val gotY = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(gotX === x && gotY === y)
    }
  }

  test("interpreted and codegen paths agree; SQL function is registered") {
    val sp = spark; import sp.implicits._
    val df = (0 until 300).map(i => (i.toLong, (i * 7 % 256).toLong, (i * 13 % 256).toLong))
      .toDF("id", "x", "y")
    df.createOrReplaceTempView("zpts")
    val viaSql = spark.sql(
      "SELECT id, graft_zvalue(8, x, y) AS z FROM zpts ORDER BY id").collect()
    val viaColumn = df.select($"id",
        graft.operators.Layout.zvalue(8, $"x", $"y").as("z"))
      .orderBy("id").collect()
    assert(viaSql.map(_.getLong(1)).toSeq === viaColumn.map(_.getLong(1)).toSeq)
    viaSql.foreach { r =>
      val i = r.getLong(0)
      assert(r.getLong(1) === refZ(8, Seq(i * 7 % 256, i * 13 % 256)))
    }
  }

  test("null coordinates yield null; bad arguments are rejected") {
    val sp = spark; import sp.implicits._
    val r = spark.sql("SELECT graft_zvalue(8, CAST(NULL AS BIGINT), 3L) AS z")
      .collect().head
    assert(r.isNullAt(0))
    // bits budget: 8 bits * 8+ coords > 63 must fail analysis
    val tooMany = intercept[Exception] {
      spark.sql("SELECT graft_zvalue(32, 1L, 2L, 3L)").collect()
    }
    assert(tooMany.getMessage.toLowerCase.contains("graft_zvalue"))
    val badType = intercept[Exception] {
      spark.sql("SELECT graft_zvalue(8, 'abc', 1L)").collect()
    }
    assert(badType.getMessage.toLowerCase.contains("graft_zvalue"))
  }

  test("READ-side proof: a y-filtered scan of z-ordered parquet decodes materially less") {
    val sp = spark; import sp.implicits._
    // 64x64 grid with a fat payload so decoded bytes are dominated by data
    val rnd = new scala.util.Random(7)
    val pts = rnd.shuffle((0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong))))
      .toDF("x", "y")
      .withColumn("payload", md5(concat_ws("_", $"x", $"y")))
    val z = pts.withColumn("z", graft.operators.Layout.zvalue(6, $"x", $"y"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-read").toString
    // same rows, two layouts, 16 files each → 16 row groups with min/max
    graft.operators.Layout.zorderLayout(z, "z", 16).drop("z")
      .write.mode("overwrite").parquet(s"$dir/zorder")
    z.repartitionByRange(16, $"x").sortWithinPartitions("x").drop("z")
      .write.mode("overwrite").parquet(s"$dir/xsort")

    val aqeBefore = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // (decoded rows from surviving row groups, bytes read off storage,
      // result checksum) of a y-slab query against one layout
      def scanCost(path: String): (Long, Long, Long) = {
        val readBytes = new java.util.concurrent.atomic.AtomicLong(0)
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (te.taskMetrics != null)
              { readBytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead); () }
        }
        spark.sparkContext.addSparkListener(listener)
        try {
          val q = spark.read.parquet(path).filter($"y" >= 16 && $"y" <= 19)
            .agg(sum($"x" * 1000 + $"y"))
          val check = q.collect().head.getLong(0)
          val scanRows = q.queryExecution.executedPlan.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.metrics("numOutputRows").value
          }.sum
          // listener events drain asynchronously — poll to a fixpoint
          var prev = -1L
          var tries = 0
          while (readBytes.get() != prev && tries < 50) {
            prev = readBytes.get(); Thread.sleep(100); tries += 1
          }
          (scanRows, readBytes.get(), check)
        } finally spark.sparkContext.removeSparkListener(listener)
      }
      val (zRows, zBytes, zCheck) = scanCost(s"$dir/zorder")
      val (xRows, xBytes, xCheck) = scanCost(s"$dir/xsort")
      assert(zCheck === xCheck, "layouts returned different query results")
      // x-sorted: every file spans the full y range → no row group prunes
      // → all 4096 rows decode. z-order: only the files whose rectangle
      // meets the slab decode — the read-side claim the operator exists for
      assert(xRows === 4096L, s"x-sorted scan unexpectedly pruned ($xRows rows)")
      assert(zRows * 2 <= xRows,
        f"z-order decoded $zRows of $xRows rows (${zRows.toDouble / xRows}%.2f); " +
          f"bytes read: $zBytes vs $xBytes (${zBytes.toDouble / xBytes}%.2f)")
      info(f"y-slab scan: z-order decoded $zRows rows / $zBytes B; " +
        f"x-sorted $xRows rows / $xBytes B — " +
        f"ratios ${zRows.toDouble / xRows}%.2f rows, ${zBytes.toDouble / xBytes}%.2f bytes")
    } finally aqeBefore match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("z-order layout bounds BOTH dimensions per partition; a plain sort does not") {
    val sp = spark; import sp.implicits._
    // 64x64 grid, one row per cell, shuffled input order
    val rnd = new scala.util.Random(3)
    val pts = rnd.shuffle((0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong))))
      .toDF("x", "y")
    val z = pts.withColumn("z", graft.operators.Layout.zvalue(6, $"x", $"y"))
    val nParts = 16

    def partExtents(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min($"x").as("x0"), max($"x").as("x1"), min($"y").as("y0"), max($"y").as("y1"))
        .collect().map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
          r.getAs[Long]("y0"), r.getAs[Long]("y1")))

    val zParts = partExtents(graft.operators.Layout.zorderLayout(z, "z", nParts))
    val xParts = partExtents(z.repartitionByRange(nParts, $"x").sortWithinPartitions("x"))

    // a query filtering on y alone: how many partitions (files) survive
    // min/max pruning for a 4-row y-slab?
    def overlapping(parts: Array[(Long, Long, Long, Long)], y0: Long, y1: Long) =
      parts.count { case (_, _, p0, p1) => p1 >= y0 && p0 <= y1 }
    val zHit = overlapping(zParts, 16, 19)
    val xHit = overlapping(xParts, 16, 19)
    // x-sorted files all span the full y range — nothing prunes; the
    // z-order layout confines y per file, so most files prune away
    assert(xHit === nParts, s"x-sorted layout unexpectedly pruned ($xHit/$nParts)")
    assert(zHit <= nParts / 2,
      s"z-order layout should prune most files on a y-only predicate, hit $zHit/$nParts")
  }
}
