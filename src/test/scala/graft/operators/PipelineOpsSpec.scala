package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-4 pipeline operators: exact distributed prefix
  * sum, sequence packing, CDC upsert, skew profiling, quantile binning,
  * winsorization, stratified sampling, bloom membership.
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("pipeline-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- withPrefixSum ----

  test("withPrefixSum equals the single-window formulation, any bucketSize") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    // non-contiguous ids with gaps, values incl. zeros
    val rows = (0 until 500).map(i => (i.toLong * 3 + (i % 2), rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "v").repartition(4)
    val reference = df.withColumn("cum",
      coalesce(sum($"v").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"id", $"cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (bs <- Seq(1L, 7L, 64L, 100000L)) {
      val got = Analytics.withPrefixSum(df, "id", "v", "cum", bs)
        .select($"id", $"cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === reference, s"bucketSize=$bs diverged from window prefix sum")
    }
  }

  test("withPrefixSumBy equals the per-group single-window formulation, any bucketSize") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 600).map(i =>
      (i.toLong * 3 + (i % 2), s"src${i % 5}", rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "src", "v").repartition(4)
    val reference = df.withColumn("cum",
      coalesce(sum($"v").over(Window.partitionBy($"src").orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"id", $"src", $"cum").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    for (bs <- Seq(1L, 7L, 64L, 100000L)) {
      val got = Analytics.withPrefixSumBy(df, "src", "id", "v", "cum", bs)
        .select($"id", $"src", $"cum").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got === reference, s"bucketSize=$bs diverged from grouped window prefix sum")
    }
  }

  test("prefix sums are tie-deterministic: duplicate order keys get the strictly-smaller-key sum") {
    val sp = spark; import sp.implicits._
    // keys with duplicates — a CONTRACT VIOLATION, but the RANGE-frame
    // pin must still produce one deterministic answer on every
    // partitioning: cum(k) = sum of v over all rows with key < k
    val rows = Seq((1L, 10L), (2L, 1L), (2L, 2L), (2L, 4L), (5L, 3L),
      (5L, 5L), (9L, 7L))
    val brute: Map[Long, Long] = rows.map(_._1).distinct
      .map(k => k -> rows.filter(_._1 < k).map(_._2).sum).toMap
    for (parts <- Seq(1, 3, 8); bs <- Seq(1L, 4L, 1000L)) {
      val df = rows.toDF("id", "v").repartition(parts)
      val got = Analytics.withPrefixSum(df, "id", "v", "cum", bs)
        .select($"id", $"v", $"cum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got === rows.map { case (k, v) => (k, v, brute(k)) }.sorted,
        s"parts=$parts bs=$bs")
      val gotBy = Analytics.withPrefixSumBy(
          rows.map { case (k, v) => (k, "g", v) }.toDF("id", "src", "v")
            .repartition(parts), "src", "id", "v", "cum", bs)
        .select($"id", $"v", $"cum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(gotBy === rows.map { case (k, v) => (k, v, brute(k)) }.sorted,
        s"grouped parts=$parts bs=$bs")
    }
  }

  // ---- mixtureByTokenBudget ----

  test("mixtureByTokenBudget selects the maximal whole-doc prefix per source under quota") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a", "w x y z"),        // 4 tokens
      (2L, "a", "w x y"),          // 3
      (3L, "a", "w x y z w x"),    // 6 — a-cum 13
      (4L, "a", "w"),              // a-cum 14 > quota
      (5L, "b", "w x"),            // 2
      (6L, "b", "w x y z w"),      // 5 — b-cum 7 > quota(6): dropped, prefix stops
      (7L, "b", "w"),              // would fit alone, but prefix semantics drop it
      (8L, "c", "w x y"),          // source absent from weights
      (9L, "a", "")                // zero tokens: excluded before counting
    ).toDF("doc_id", "lang", "text")
    // budget 20: quotas a = floor(0.65*20) = 13, b = floor(0.3*20) = 6
    val out = TextAnalysis.mixtureByTokenBudget(docs, "doc_id", "lang",
        "text", Map("a" -> 0.65, "b" -> 0.3), 20L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, "a", 4L, 4L, 13L),
      (2L, "a", 3L, 7L, 13L),
      (3L, "a", 6L, 13L, 13L),
      (5L, "b", 2L, 2L, 6L)))
    // quota never exceeded, by construction of the filter
    assert(out.forall { case (_, _, _, cum, quota) => cum <= quota })
    // zero budget selects nothing
    assert(TextAnalysis.mixtureByTokenBudget(docs, "doc_id", "lang",
      "text", Map("a" -> 1.0), 0L).isEmpty)
  }

  // ---- shardByTokens ----

  test("shardByTokens packs whole docs into contiguous capped shards") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"), (4L, "a b c"),
      (5L, "a b c"), (6L, "")).toDF("doc_id", "text") // 15 tokens total
    // cap = ceil(15/3) = 5: cums 0,3,6,9,12 -> shards 0,0,1,1,2
    val out = TextAnalysis.shardByTokens(docs, "doc_id", "text", nShards = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 3L, 0L, 0L), (2L, 3L, 3L, 0L), (3L, 3L, 6L, 1L),
      (4L, 3L, 9L, 1L), (5L, 3L, 12L, 2L)))
    // a straddling doc lands in the shard its FIRST token falls in
    val straddle = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text") // 12 tokens, 3 shards, cap 4
    val s2 = TextAnalysis.shardByTokens(straddle, "doc_id", "text", 3)
      .orderBy($"doc_id").collect().map(_.getLong(3))
    assert(s2.toSeq === Seq(0L, 1L, 2L))
    // every shard's token mass is within one doc of the cap
    val byShard = out.groupBy(_._4).view.mapValues(_.map(_._2).sum)
    assert(byShard.values.forall(_ <= 5L + 3L))
  }

  // ---- mixtureOrderKey ----

  test("mixtureOrderKey is the weighted round-robin stride key") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "en"), (2L, "en"), (3L, "en"), (4L, "en"),
      (5L, "de"), (6L, "de"), (7L, "xx")).toDF("doc_id", "lang")
    val out = TextAnalysis.mixtureOrderKey(docs, "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.25))
      .orderBy($"interleave_key", $"source", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // en ranks 1..4 -> keys 2,4,6,8; de ranks 1,2 -> keys 4,8;
    // ties (4.0, 8.0) break to the 'de' source first
    assert(out.toSeq === Seq(
      (1L, "en", 1L, 2.0), (5L, "de", 1L, 4.0), (2L, "en", 2L, 4.0),
      (3L, "en", 3L, 6.0), (6L, "de", 2L, 8.0), (4L, "en", 4L, 8.0)))
    // a weight-w source holds a ~w share of every stream prefix:
    // the first 3 keys carry 2 en (w .5/.75) and 1 de (w .25/.75)
    assert(out.take(3).count(_._2 == "en") === 2)
    // source absent from weights is excluded
    assert(!out.exists(_._2 == "xx"))
  }

  // ---- packingEfficiency ----

  test("packingEfficiency counts padded vs packed sequence waste exactly") {
    val sp = spark; import sp.implicits._
    val w100 = Seq.fill(100)("w").mkString(" ")
    val w300 = Seq.fill(300)("w").mkString(" ")
    val docs = Seq((1L, "a", w100), (2L, "a", w300), (3L, "b", w100),
      (4L, "b", "")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packingEfficiency(docs, "doc_id", "source",
        "text", seqLen = 256)
      .orderBy($"source").collect()
    // source a: padded ceil(100/256)+ceil(300/256) = 1+2 = 3 seqs,
    // waste 768-400 = 368; packed ceil(400/256) = 2, waste 112
    val a = out(0)
    assert((a.getString(0), a.getLong(1), a.getLong(2), a.getLong(3),
      a.getLong(4), a.getLong(5), a.getLong(6)) ===
      (("a", 2L, 400L, 3L, 368L, 2L, 112L)))
    assert(a.getDouble(7) === 0.479167) // round(368/768, 6)
    assert(a.getDouble(8) === 0.21875)  // 112/512 exact
    // source b: the zero-token doc is dropped from both layouts
    val b = out(1)
    assert((b.getString(0), b.getLong(1), b.getLong(2)) === (("b", 1L, 100L)))
  }

  // ---- packSequences ----

  test("packSequences spans are contiguous and cover the token stream") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g h"), (3L, ""), (4L, "i j k l m n o p q r"),
      (5L, "s"), (7L, "t u v w x y z aa bb cc dd ee")).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "doc_id", "text", seqLen = 4)
      .orderBy("doc_id").collect()
    // doc 3 has zero tokens -> dropped
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L, 7L))
    // first document starts at sequence 0
    assert(out.head.getAs[Long]("start_seq") === 0L)
    // each next doc starts in the same sequence its predecessor ended in,
    // or the one right after (documents straddle boundaries, no gaps)
    out.sliding(2).foreach { case Array(a, b) =>
      val endA = a.getAs[Long]("end_seq"); val startB = b.getAs[Long]("start_seq")
      assert(startB === endA || startB === endA + 1,
        s"gap between docs ${a.getLong(0)} and ${b.getLong(0)}")
    }
    // total stream = 5+3+10+1+12 = 31 tokens -> last token sits in seq 30/4 = 7
    assert(out.last.getAs[Long]("end_seq") === 30L / 4)
    // bucketSize invariance (exactness of the two-level prefix sum)
    val small = TextAnalysis.packSequences(docs, "doc_id", "text", 4, bucketSize = 2)
      .orderBy("doc_id").collect()
    assert(small.map(_.toSeq) === out.map(_.toSeq))
  }

  // ---- upsertLatest ----

  test("upsertLatest: updates win, version ties go to updates, tombstones drop") {
    val sp = spark; import sp.implicits._
    val base = Seq((1L, "a", 0L), (2L, "b", 5L), (3L, "c", 0L)).toDF("k", "v", "version")
    val upd = Seq(
      (1L, "a2", 1L, false), // normal update
      (2L, "b2", 5L, false), // SAME version as base -> update must win
      (3L, "gone", 9L, true), // tombstone
      (4L, "new", 1L, false)  // insert
    ).toDF("k", "v", "version", "deleted")
    val out = Analytics.upsertLatest(base, upd, Seq("k"), "version", Some("deleted"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a2"), (2L, "b2"), (4L, "new")))
  }

  test("upsertLatest tolerates schema evolution (new column null on base rows)") {
    val sp = spark; import sp.implicits._
    val base = Seq((1L, "a", 0L)).toDF("k", "v", "version")
    val upd = Seq((2L, "b", 1L, "extra")).toDF("k", "v", "version", "note")
    val out = Analytics.upsertLatest(base, upd, Seq("k"), "version")
      .orderBy("k").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(out(0).fieldIndex("note")))
    assert(out(1).getAs[String]("note") === "extra")
  }

  // ---- keySkewProfile ----

  test("keySkewProfile computes exact counts and skew ratio") {
    val sp = spark; import sp.implicits._
    // key 1 x6, key 2 x2, key 3 x2 -> 10 rows, 3 keys, max 6
    val df = (Seq.fill(6)(1) ++ Seq.fill(2)(2) ++ Seq.fill(2)(3)).toDF("k")
    val r = Analytics.keySkewProfile(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("max_cnt") === 6L)
    assert(r.getAs[Long]("n_keys_at_max") === 1L)
    assert(r.getAs[Double]("skew_ratio") === 1.8) // 6 * 3 / 10
  }

  test("keySkewProfile/quantileBins/winsorize approx routes stay structurally sound") {
    val sp = spark; import sp.implicits._
    // approx_percentile picks a real element instead of interpolating, so
    // the routes are NOT bit-equal even on small data — assert the shape
    // invariants the escape hatch must preserve
    val skew = (Seq.fill(6)(1) ++ Seq.fill(2)(2) ++ Seq.fill(2)(3)).toDF("k")
    val sr = Analytics.keySkewProfile(skew, "k", approx = true).collect().head
    assert(sr.getAs[Long]("n_rows") === 10L && sr.getAs[Long]("n_keys") === 3L)
    assert(sr.getAs[Long]("max_cnt") === 6L && sr.getAs[Double]("skew_ratio") === 1.8)
    // approx percentiles are real per-key counts, bounded by the data
    assert(Seq(2.0, 6.0).contains(sr.getAs[Double]("p50_cnt")))
    assert(sr.getAs[Double]("p99_cnt") <= 6.0 && sr.getAs[Double]("p99_cnt") >= 2.0)
    val vals = (1 to 800).map(_.toDouble).toDF("v").repartition(4)
    val bins = Analytics.quantileBins(vals, "v", 8, approx = true).orderBy("bin").collect()
    assert(bins.map(_.getAs[Int]("bin")).toSeq === (1 to 8))
    assert(bins.map(_.getAs[Long]("n")).sum === 800L)
    bins.foreach(b => assert(math.abs(b.getAs[Long]("n") - 100L) <= 2))
    val grouped = (1 to 200).map(i => (i % 2, i.toDouble)).toDF("grp", "x")
    val w = Analytics.winsorize(grouped, "grp", "x", approx = true).collect()
    assert(w.length === 200)
    w.foreach { r =>
      val s = r.getAs[Double]("x_scaled")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Double]("x_wins") >= 1.0 && r.getAs[Double]("x_wins") <= 200.0)
    }
  }

  test("profileColumns approx route drops the Expand and stays near-exact") {
    val sp = spark; import sp.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"v${i % 37}")).toDF("id", "cat")
    // exact: k count_distincts in one Aggregate -> Catalyst Expands the
    // input (k+1)x; approx: HLL++ sketch state needs no Expand at all —
    // the scale property the flag exists for
    val exact = Analytics.profileColumns(df, Seq("id", "cat"))
    val approx = Analytics.profileColumns(df, Seq("id", "cat"), approx = true)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    val e = exact.orderBy("col_name").collect()
    val a = approx.orderBy("col_name").collect()
    e.zip(a).foreach { case (er, ar) =>
      assert(er.getAs[String]("col_name") === ar.getAs[String]("col_name"))
      assert(er.getAs[Long]("n_nulls") === ar.getAs[Long]("n_nulls"))
      assert(er.getAs[String]("min_value") === ar.getAs[String]("min_value"))
      assert(er.getAs[String]("max_value") === ar.getAs[String]("max_value"))
      // HLL++ at default precision: within 5% on these cardinalities
      val (en, an) = (er.getAs[Long]("n_distinct"), ar.getAs[Long]("n_distinct"))
      assert(math.abs(en - an) <= math.max(1L, (en * 0.05).toLong),
        s"${er.getAs[String]("col_name")}: exact $en vs approx $an")
    }
  }

  // ---- tableDiff ----

  test("tableDiff survives a value column literally named 'present'") {
    val sp = spark; import sp.implicits._
    // 'present' used to collide with the _b_present/_a_present markers
    // and threw an ambiguity AnalysisException
    val before = Seq((1L, "a", true), (2L, "b", false)).toDF("k", "v", "present")
    val after = Seq((1L, "a", false), (3L, "c", true)).toDF("k", "v", "present")
    val out = Analytics.tableDiff(before, after, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"),
      r.getAs[String]("changed_cols"))).toSeq ===
      Seq((1L, "changed", "present"), (2L, "removed", ""), (3L, "added", "")))
  }

  // ---- quantileBins ----

  test("quantileBins is equi-depth on uniform data and partitions all rows") {
    val sp = spark; import sp.implicits._
    val df = (1 to 800).map(_.toDouble).toDF("v").repartition(4)
    val bins = Analytics.quantileBins(df, "v", 8).orderBy("bin").collect()
    assert(bins.map(_.getAs[Int]("bin")).toSeq === (1 to 8))
    assert(bins.map(_.getAs[Long]("n")).sum === 800L)
    // uniform data: every bin within ±1 of 100
    bins.foreach(b => assert(math.abs(b.getAs[Long]("n") - 100L) <= 1))
    // bins are ordered and non-overlapping
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("bin_max") <= b.getAs[Double]("bin_min"))
    }
  }

  // ---- winsorize ----

  test("winsorize clamps to group percentiles and scales into [0,1]") {
    val sp = spark; import sp.implicits._
    val df = ((1 to 100).map(i => ("g1", i.toLong)) ++ Seq(("flat", 5L), ("flat", 5L)))
      .toDF("grp", "x")
    val out = Analytics.winsorize(df, "grp", "x", 0.05, 0.95)
    val g1 = out.filter($"grp" === "g1").collect()
    val (lo, hi) = (g1.map(_.getAs[Double]("x_wins")).min, g1.map(_.getAs[Double]("x_wins")).max)
    // clamped range is the [p05, p95] of 1..100
    assert(lo === 5.95 && hi === 95.05)
    g1.foreach { r =>
      val s = r.getAs[Double]("x_scaled")
      assert(s >= 0.0 && s <= 1.0)
    }
    // degenerate group (p05 == p95) scales to the midpoint, no div-by-zero
    out.filter($"grp" === "flat").collect()
      .foreach(r => assert(r.getAs[Double]("x_scaled") === 0.5))
  }

  test("robustScores: hand-computed median/MAD z-scores; MAD=0 group yields NULL") {
    val sp = spark; import sp.implicits._
    // g1 = {1..9, 100}: med = 5.5, |x-med| = {4.5,3.5,...,0.5,0.5,...,94.5}
    //   -> MAD = 2.5; the outlier 100 scores (100-5.5)/(1.4826*2.5)
    val df = ((1 to 9).map(i => ("g1", i.toDouble)) :+ ("g1", 100.0))
      .++(Seq(("flat", 7.0), ("flat", 7.0), ("flat", 7.0)))
      .toDF("grp", "x")
    val out = Analytics.robustScores(df, "grp", "x")
    assert(out.count() === 13L)
    val g1 = out.filter($"grp" === "g1").collect()
    g1.foreach { r =>
      assert(r.getAs[Double]("x_med") === 5.5)
      assert(r.getAs[Double]("x_mad") === 2.5)
    }
    val outlier = g1.find(_.getAs[Double]("x") == 100.0).get
    assert(outlier.getAs[Double]("x_rz") ===
      BigDecimal(94.5 / (1.4826 * 2.5))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // robustness: the outlier barely moves the center (mean would be 13.9)
    assert(math.abs(g1.find(_.getAs[Double]("x") == 5.0).get
      .getAs[Double]("x_rz")) < 0.2)
    // constant group: MAD = 0 -> score NULL, rows survive
    val flat = out.filter($"grp" === "flat").collect()
    assert(flat.length === 3 && flat.forall(_.isNullAt(flat.head.fieldIndex("x_rz"))))
    // approx path returns the same shape on well-separated data
    val approx = Analytics.robustScores(df, "grp", "x", approx = true)
    assert(approx.count() === 13L)
  }

  test("cooccurrenceCosine: hand-computed basket affinities; hot baskets dropped whole") {
    val sp = spark; import sp.implicits._
    // baskets: {1,2} x3, {1,3} x1, singleton {4}, and one hot basket
    // {1,2,3,4,5} that must be dropped whole under basketCap = 4
    val rows = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L), (14L, 4L),
      (15L, 1L), (15L, 2L), (15L, 3L), (15L, 4L), (15L, 5L)
    ).toDF("bk", "it")
    val out = Analytics.cooccurrenceCosine(rows, "bk", "it",
        topN = 10, basketCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // capped frame: c_1 = 4, c_2 = 3, c_3 = 1; pairs (1,2) x3, (1,3) x1
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      (1L, 2L, r6(3.0 / math.sqrt(4.0 * 3.0))),
      (1L, 3L, r6(1.0 / math.sqrt(4.0 * 1.0)))))
    // item 5 appears ONLY in the hot basket: it must not reach any pair
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L))
  }

  // ---- stratifiedSample ----

  test("stratifiedSample is deterministic and monotone in the rate") {
    val sp = spark; import sp.implicits._
    val df = (1 to 1000).map(i => (i.toLong, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    def ids(rates: Map[String, Int]) =
      TextAnalysis.stratifiedSample(df, "lang", "id", rates, defaultPct = 0)
        .select("id").collect().map(_.getLong(0)).toSet
    val en30 = ids(Map("en" -> 30)); val en30b = ids(Map("en" -> 30))
    val en60 = ids(Map("en" -> 60))
    assert(en30 === en30b, "same rates must select the same rows")
    assert(en30.subsetOf(en60), "raising a stratum's rate must only add rows")
    // rate 0 default: no 'de' rows ever sampled
    val langs = TextAnalysis.stratifiedSample(df, "lang", "id", Map("en" -> 100), 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("en"))
    // ~30% of the en stratum (333 docs) within a loose band
    assert(en30.size > 40 && en30.size < 180)
  }

  // ---- bloomFlag ----

  test("bloomFlag has no false negatives and bounded false positives") {
    val sp = spark; import sp.implicits._
    val ref = (1 to 500).map(i => s"member-$i").toDF("s")
    val probe = ((1 to 500).map(i => s"member-$i") ++
      (1 to 5000).map(i => s"other-$i")).toDF("s").repartition(4)
    val out = Dedup.bloomFlag(probe, "s", "hit", ref, "s", fpp = 0.01)
    val members = out.filter($"s".startsWith("member-"))
    assert(members.filter(!$"hit").count() === 0L, "bloom false negative!")
    val fp = out.filter($"s".startsWith("other-") && $"hit").count()
    assert(fp <= 5000 * 0.01 * 5 + 10, s"false positives way over fpp bound: $fp")
    // deterministic: rebuilt filter flags the identical row set
    val again = Dedup.bloomFlag(probe, "s", "hit", ref, "s", fpp = 0.01)
      .filter($"hit").select("s").collect().map(_.getString(0)).toSet
    assert(again === out.filter($"hit").select("s").collect().map(_.getString(0)).toSet)
  }

  test("bloomFlag keeps the no-false-negative guarantee on a NON-string ref column") {
    val sp = spark; import sp.implicits._
    // a bigint ref used to be inserted via putLong while the probe hashed
    // the string rendering -> 100% false negatives
    val ref = (1L to 400L).toDF("id")
    val probe = (1L to 800L).toDF("id").repartition(3)
    val out = Dedup.bloomFlag(probe, "id", "hit", ref, "id", fpp = 0.01)
    assert(out.filter($"id" <= 400L && !$"hit").count() === 0L,
      "bloom false negative on integral ref column!")
    // and it still rejects most non-members
    val fp = out.filter($"id" > 400L && $"hit").count()
    assert(fp <= 400 * 0.01 * 5 + 10, s"false positives way over fpp bound: $fp")
  }

  test("quantileBins excludes null values instead of inflating bin 1") {
    val sp = spark; import sp.implicits._
    val df = ((1 to 80).map(i => Some(i.toDouble)) ++ Seq.fill(20)(Option.empty[Double]))
      .toDF("v").repartition(3)
    val bins = Analytics.quantileBins(df, "v", 4).orderBy("bin").collect()
    assert(bins.map(_.getAs[Long]("n")).sum === 80L, "null rows must not be binned")
    bins.foreach(b => assert(math.abs(b.getAs[Long]("n") - 20L) <= 1))
    // all-null column -> empty result, not a null-cuts crash
    val allNull = Seq.fill(5)(Option.empty[Double]).toDF("v")
    assert(Analytics.quantileBins(allNull, "v", 4).count() === 0L)
  }

  test("winsorize keeps null-group rows as their own group") {
    val sp = spark; import sp.implicits._
    val df = ((1 to 50).map(i => (Some("g"), i.toDouble)) ++
      (1 to 50).map(i => (Option.empty[String], i.toDouble * 10)))
      .toDF("grp", "x")
    val out = Analytics.winsorize(df, "grp", "x")
    assert(out.count() === 100L, "null-group rows must survive the join")
    val nulls = out.filter($"grp".isNull).collect()
    assert(nulls.length === 50)
    // winsorized against the null group's own percentiles (x*10 scale)
    assert(nulls.map(_.getAs[Double]("x_wins")).max > 100.0)
  }

  test("upsertLatest tieBreakCols make equal-version survivors deterministic") {
    val sp = spark; import sp.implicits._
    val base = Seq((9L, "base", 0L, "")).toDF("k", "v", "version", "src_id")
    // two updates with the SAME key and version: tie broken by src_id desc
    val upd = Seq((1L, "x", 5L, "a"), (1L, "y", 5L, "b"))
      .toDF("k", "v", "version", "src_id").repartition(4)
    (1 to 3).foreach { _ =>
      val out = Analytics.upsertLatest(base, upd, Seq("k"), "version",
          tieBreakCols = Seq("src_id"))
        .filter($"k" === 1L).collect()
      assert(out.length === 1 && out.head.getAs[String]("v") === "y")
    }
  }
}
