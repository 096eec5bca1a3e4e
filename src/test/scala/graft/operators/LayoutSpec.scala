package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The file-skipping manifest's two claims: (1) a pruned range read is
  * RESULT-identical to a full scan + filter, boundaries and null-stats
  * files included; (2) it actually skips — the pruned read touches
  * materially fewer bytes than the full scan on a range-clustered
  * layout.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("layout-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("prunedRead equals full scan + filter, including range boundaries and all-null files") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    // 3 value files clustered by k (0-99, 100-199, 200-299) + 1 file of
    // all-null k: the null file has null min/max stats and must be
    // SKIPPED (none of its rows can satisfy a range) without breaking
    // anything
    (0L until 300L).map(i => (Some(i), s"v$i")).toDF("k", "v")
      .repartitionByRange(3, $"k").sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    Seq.fill(5)((Option.empty[Long], "nullrow")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeManifest(spark, dir, Seq("k"))

    def full(lo: Long, hi: Long) =
      spark.read.parquet(dir).filter($"k" >= lo && $"k" <= hi)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    def pruned(lo: Long, hi: Long) =
      Layout.prunedRead(spark, dir, Seq(("k", lo, hi)))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // interior, file-boundary-inclusive, single-point, cross-file spans
    for ((lo, hi) <- Seq((50L, 150L), (0L, 99L), (100L, 100L), (99L, 200L),
        (0L, 299L))) {
      assert(pruned(lo, hi) === full(lo, hi), s"mismatch on [$lo, $hi]")
      assert(pruned(lo, hi).nonEmpty, s"test range [$lo, $hi] selects nothing")
    }
    // empty survivors: right (empty) answer, schema intact
    val none = Layout.prunedRead(spark, dir, Seq(("k", 5000L, 6000L)))
    assert(none.columns.toSeq === Seq("k", "v") && none.count() === 0)
    // conjunction of two ranges on the same column behaves as AND
    val conj = Layout.prunedRead(spark, dir, Seq(("k", 50L, 150L), ("k", 100L, 300L)))
      .collect().map(_.getLong(0)).toSet
    assert(conj === (100L to 150L).toSet)
  }

  test("updateManifest appends stats for new files only, never rescanning covered ones") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-upd").toString
    (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Layout.writeManifest(spark, dir, Seq("k"))
    // tamper a covered file's stats: if update rescans old files, the
    // tampered row gets contradicted; if it appends only, it survives
    val manifestPath = s"$dir/${Layout.ManifestDir}"
    val tampered = spark.read.parquet(manifestPath)
      .withColumn("min_k", lit(-777L)).cache()
    tampered.count()
    tampered.write.mode("overwrite").parquet(manifestPath)
    tampered.unpersist()
    // append a new batch of rows (new files), update incrementally
    (100L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.updateManifest(spark, dir, Seq("k"))
    val m = spark.read.parquet(manifestPath).collect()
    assert(m.length === 2, s"manifest should cover 2 files, has ${m.length}")
    assert(m.count(_.getAs[Long]("min_k") == -777L) === 1,
      "update rescanned an already-covered file")
    // the appended range is served through the updated manifest
    val got = Layout.prunedRead(spark, dir, Seq(("k", 150L, 160L)))
      .collect().map(_.getLong(0)).toSet
    assert(got === (150L to 160L).toSet)
    // idempotent: nothing new -> nothing appended
    Layout.updateManifest(spark, dir, Seq("k"))
    assert(spark.read.parquet(manifestPath).count() === 2)
  }

  test("pruned read opens only the admitted files; full scan opens all of them") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-files").toString
    // 16 range-clustered files; the [0, 255] slab lives in 1 of them.
    // The manifest's 100 TB win is bounding which FILES the scan must
    // list/open at all (row-group stats only prune after every footer
    // has been fetched) — so the assertable claim is the file count in
    // the scan node, which is layout-deterministic, not the byte count,
    // which at this scale is dominated by footer overhead.
    val rows = (0L until 4096L).map(i => (i, s"payload-$i-" + "x" * 200))
    rows.toDF("k", "v").repartitionByRange(16, $"k").sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    Layout.writeManifest(spark, dir, Seq("k"))

    // Dataset.inputFiles is the public "which files back this scan"
    // surface (the scan node's numFiles metric is driver-side and never
    // accumulates back to the plan object)
    val pruned = Layout.prunedRead(spark, dir, Seq(("k", 0L, 255L)))
    val full = spark.read.parquet(dir).filter($"k" >= 0L && $"k" <= 255L)
    assert(pruned.collect().map(_.getLong(0)).toSet ===
      full.collect().map(_.getLong(0)).toSet, "pruned read returned different data")
    val (pf, ff) = (pruned.inputFiles.length, full.inputFiles.length)
    assert(ff === 16, s"expected the full scan to cover 16 files, saw $ff")
    assert(pf <= 2, s"manifest admitted $pf files for a 1-file slab")
    info(s"slab scan file counts: pruned=$pf full=$ff")
  }

  test("appendManifest covers appended files identically to a full rebuild") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-append").toString
    (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, $"k").sortWithinPartitions($"k")
      .write.mode("overwrite").parquet(dir)
    Layout.writeManifest(spark, dir, Seq("k"))
    val before = spark.read.parquet(s"$dir/${Layout.ManifestDir}").count()
    // append a disjoint key range as new files
    (2000L until 2500L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(2, $"k").sortWithinPartitions($"k")
      .write.mode("append").parquet(dir)
    val added = Layout.appendManifest(spark, dir, Seq("k"))
    assert(added >= 1, "append must register the new files")
    def rows(path: String) = spark.read.parquet(path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val incremental = rows(s"$dir/${Layout.ManifestDir}")
    assert(incremental.length === before + added)
    Layout.writeManifest(spark, dir, Seq("k")) // full rebuild, re-reads everything
    assert(incremental === rows(s"$dir/${Layout.ManifestDir}"),
      "incremental manifest diverged from a full rebuild")
    // idempotent: nothing new -> no-op
    assert(Layout.appendManifest(spark, dir, Seq("k")) === 0L)
    // the appended range prunes correctly through the incremental manifest
    val pruned = Layout.prunedRead(spark, dir, Seq(("k", 2100L, 2200L)))
    assert(pruned.count() === 101L)
    assert(pruned.inputFiles.length < spark.read.parquet(dir).inputFiles.length)
  }

  test("3-D hilbert layout clusters files so the min/max manifest prunes a box query") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-h3d").toString
    // the full order-4 3-D grid, one row per cell
    spark.range(4096)
      .select($"id",
        ($"id" % 16).as("x"),
        (($"id" / 16).cast("long") % 16).as("y"),
        (($"id" / 256).cast("long") % 16).as("z"))
      .withColumn("hval", Layout.hilbert(4, $"x", $"y", $"z"))
      .repartitionByRange(16, $"hval").sortWithinPartitions($"hval")
      .drop("hval")
      .write.mode("overwrite").parquet(dir)
    Layout.writeManifest(spark, dir, Seq("x", "y", "z"))
    val pruned = Layout.prunedRead(spark, dir,
      Seq(("x", 2L, 5L), ("y", 4L, 9L), ("z", 0L, 7L)))
    val full = spark.read.parquet(dir)
      .filter($"x".between(2, 5) && $"y".between(4, 9) && $"z".between(0, 7))
    assert(pruned.select($"id").as[Long].collect().toSet ===
      full.select($"id").as[Long].collect().toSet)
    val (pf, ff) = (pruned.inputFiles.length, full.inputFiles.length)
    assert(ff === 16, s"expected 16 files, saw $ff")
    // Hilbert locality: each file covers one connected near-cubic
    // region, so a 4x6x8 box (of the 16^3 grid) must skip files
    assert(pf < ff, s"hilbert layout pruned nothing ($pf of $ff files)")
    info(s"3-D hilbert box query file counts: pruned=$pf full=$ff")
  }

  // ---------------- per-file Bloom skipping ----------------

  test("bloomPrunedRead equals full scan + IN filter on a hash layout min/max can't prune") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // hash-distributed: every file spans nearly the whole key range, so
    // a min/max manifest admits ALL files for any point lookup
    (0L until 4096L).map(i => (i, s"payload-$i"))
      .toDF("k", "v").repartition(16, $"k")
      .write.mode("overwrite").parquet(dir)
    Layout.writeBloomManifest(spark, dir, "k")
    val probes = Seq(7L, 1234L, 4000L, 9999L) // 9999 absent from the data
    val pruned = Layout.bloomPrunedRead(spark, dir, "k", probes)
    val full = spark.read.parquet(dir).filter($"k".isin(probes: _*))
    assert(pruned.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      full.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    val (pf, ff) = (pruned.inputFiles.length, full.inputFiles.length)
    assert(ff === 16, s"expected 16 files in the full scan, saw $ff")
    // 3 present keys live in ≤ 3 files; Bloom false positives could
    // admit a couple more but must never approach the full listing
    assert(pf <= 6, s"bloom admitted $pf of 16 files for 3 present keys")
    info(s"bloom point-lookup file counts: pruned=$pf full=$ff")
  }

  test("bloom membership has no false negatives and bitsets are layout-independent") {
    val sp = spark; import sp.implicits._
    val values = (0 until 2000).map(i => s"key-$i")
    // every inserted value must probe true, at any (bitsLog2, nHashes)
    Seq((10, 3), (16, 5), (12, 7)).foreach { case (b, h) =>
      val agg = Layout.bloomAgg(b, h)
      val bloom = values.foldLeft(agg.zero)(agg.reduce).toSeq
      values.foreach { v =>
        assert(Layout.bloomMightContain(bloom, v, b, h),
          s"false negative for $v at 2^$b bits / $h hashes")
      }
    }
    // the aggregated bitset is a pure set-OR: partitioning cannot change it
    val ba = udaf(Layout.bloomAgg(16, 5))
    def bits(parts: Int): Seq[Long] = values.toDF("v").repartition(parts)
      .agg(ba($"v").as("b")).as[Seq[Long]].collect().head
    assert(bits(1) === bits(13))
    // false-positive rate stays near theory: n=2000, m=2^16, k=5 -> ~1.6%
    val bloom = bits(1)
    val fp = (0 until 2000).count(i =>
      Layout.bloomMightContain(bloom, s"absent-$i", 16, 5))
    assert(fp < 2000 * 0.06, s"false-positive rate ${fp / 2000.0} far above theory")
  }

  test("bloomPrunedRead has no false negatives on decimal keys whose toString diverges from Spark's cast") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-dec").toString
    // decimal(10,2): value 1.5 stringifies as "1.50" under Spark's cast
    // but "1.5" under JVM BigDecimal.toString — a probe hashed from the
    // JVM form would miss the file and silently drop its rows
    (0 until 512).map(i => (new java.math.BigDecimal(s"$i.50"), s"p-$i"))
      .toDF("k", "v")
      .select($"k".cast("decimal(10,2)").as("k"), $"v")
      .repartition(8, $"k").write.mode("overwrite").parquet(dir)
    Layout.writeBloomManifest(spark, dir, "k")
    // probe with scale-1 BigDecimals ("7.5" not "7.50")
    val probes: Seq[Any] = Seq(new java.math.BigDecimal("7.5"),
      new java.math.BigDecimal("123.5"))
    val pruned = Layout.bloomPrunedRead(spark, dir, "k", probes)
    assert(pruned.count() === 2L,
      "decimal probes must survive re-stringification through Spark's cast")
    val full = spark.read.parquet(dir).filter($"k".isin(probes: _*))
    assert(pruned.select($"v").as[String].collect().toSet ===
      full.select($"v").as[String].collect().toSet)
    assert(pruned.inputFiles.length < full.inputFiles.length,
      "pruning must still discard files")
  }

  test("appendBloomManifest registers appended files identically to a full rebuild") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-app").toString
    (0L until 1024L).map(i => (i, s"p$i")).toDF("k", "v")
      .repartition(4, $"k").write.mode("overwrite").parquet(dir)
    Layout.writeBloomManifest(spark, dir, "k")
    (5000L until 5512L).map(i => (i, s"p$i")).toDF("k", "v")
      .repartition(2, $"k").write.mode("append").parquet(dir)
    val added = Layout.appendBloomManifest(spark, dir, "k")
    assert(added >= 1)
    def rows(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).sortBy(_._1).toSeq
    val incremental = rows(s"$dir/${Layout.BloomManifestDir}")
    Layout.writeBloomManifest(spark, dir, "k")
    assert(incremental === rows(s"$dir/${Layout.BloomManifestDir}"),
      "incremental bloom manifest diverged from a full rebuild")
    assert(Layout.appendBloomManifest(spark, dir, "k") === 0L)
    // parameter drift fails loudly — mismatched bitsLog2 would make
    // probe bit positions silently inconsistent across files
    val drift = intercept[IllegalArgumentException] {
      Layout.appendBloomManifest(spark, dir, "k", bitsLog2 = 12)
    }
    assert(drift.getMessage.contains("bitsLog2"))
    // point lookups into BOTH the original and appended ranges prune
    val pruned = Layout.bloomPrunedRead(spark, dir, "k", Seq(7L, 5100L))
    assert(pruned.count() === 2L)
    assert(pruned.inputFiles.length < spark.read.parquet(dir).inputFiles.length)
  }

  test("bloomPrunedRead on all-absent probes reads nothing but keeps the schema") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-miss").toString
    (0L until 256L).map(i => (i, i * 2)).toDF("k", "w")
      .repartition(4, $"k").write.mode("overwrite").parquet(dir)
    Layout.writeBloomManifest(spark, dir, "k")
    val out = Layout.bloomPrunedRead(spark, dir, "k", Seq(100000L, 200000L))
    assert(out.columns.toSeq === Seq("k", "w"))
    assert(out.count() === 0L)
  }

  test("compactionPlan packs first-fit in name order with per-key restarts; oversized files get their own bin") {
    val sp = spark; import sp.implicits._
    // rows deliberately shuffled: packing must follow FILE-NAME order,
    // not input order
    val files = Seq(
      ("A", "f3", 3L), ("A", "f1", 5L), ("B", "g2", 1L),
      ("A", "f4", 2L), ("B", "g1", 10L), ("A", "f2", 4L))
      .toDF("part", "fname", "sz")
    val plan = Layout.compactionPlan(files, "part", "fname", "sz", targetBytes = 8L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // A in name order: f1(5)→bin0(5); f2(4): 9>8→bin1(4); f3(3): 7≤8
    // stays bin1; f4(2): 9>8→bin2
    assert(plan(("A", "f1")) === ((5L, 0L)))
    assert(plan(("A", "f2")) === ((4L, 1L)))
    assert(plan(("A", "f3")) === ((3L, 1L)))
    assert(plan(("A", "f4")) === ((2L, 2L)))
    // B restarts at bin 0; the oversized g1 sits alone, g2 opens bin 1
    assert(plan(("B", "g1")) === ((10L, 0L)))
    assert(plan(("B", "g2")) === ((1L, 1L)))
    // invariant: every bin is ≤ target unless it is a single oversized file
    val byBin = plan.toSeq.groupBy { case ((k, _), (_, bin)) => (k, bin) }
    byBin.values.foreach { members =>
      val tot = members.map(_._2._1).sum
      assert(tot <= 8L || members.length == 1, s"overfull multi-file bin: $members")
    }
  }
}
