package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, concat, explode, length, lit, sequence, substring, transform}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class StreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("streams-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked windowed counts aggregate per window and type") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[StreamEvent]
    val q = Streams.windowedCounts(input.toDF(), windowDuration = "10 minutes",
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      input.addData(
        StreamEvent(1, ts(1), "view", 1.0),
        StreamEvent(2, ts(2), "view", 2.0),
        StreamEvent(1, ts(11), "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set(
        (Timestamp.valueOf("2026-01-01 10:00:00"), "view", 2L, 3.0),
        (Timestamp.valueOf("2026-01-01 10:10:00"), "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("incremental near-dup candidates: stream-vs-corpus equals the batch band join") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again today"),
      (101L, "completely different text about spark structured streaming state stores"),
      (102L, "another unrelated document mentioning parquet files and manifest pruning"))
      .toDF("doc_id", "text")
    // the static index: built once, reused by every micro-batch
    val corpusBands = graft.operators.Dedup.minhashBands(corpus, "doc_id", "text")
      .cache()
    val newDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"), // copy of 100
      (2L, "zebras graze far away from any of these other texts entirely"),
      (3L, "completely different text about spark structured streaming state machines"))
    val input = MemoryStream[(Long, String)]
    val q = Streams.incrementalNearDupCandidates(
        input.toDF().toDF("doc_id", "text"), corpusBands, "doc_id", "text")
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      input.addData(newDocs.take(2): _*)
      q.processAllAvailable()
      input.addData(newDocs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("neardup").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin: the same band join run once over all new docs
      val batch = graft.operators.Dedup
        .minhashBands(newDocs.toDF("doc_id", "text"), "doc_id", "text")
        .withColumnRenamed("doc_id", "new_id")
        .join(corpusBands.withColumnRenamed("doc_id", "corpus_id"), Seq("band", "key"))
        .select($"new_id", $"corpus_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch, "streamed candidates diverged from the batch join")
      assert(streamed.contains((1L, 100L)), "exact copy of a corpus doc not flagged")
      assert(!streamed.exists(_._1 == 2L), "unrelated doc produced a candidate")
    } finally { q.stop(); corpusBands.unpersist(); () }
  }

  test("incremental banded-Hamming candidates: stream-vs-corpus equals the batch pair join") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    // 16 bands of 4 bits, maxHamming 10 (the m16/m18 defaults' shape)
    val corpusHashes = Seq(
      (100L, 0x0123456789ABCDEFL), // target
      (101L, 0x7777777777777777L),
      (102L, 0L)).toDF("media_id", "dhash")
    val corpusBands = graft.operators.Multimodal
      .hashBands(corpusHashes, "dhash", bands = 16).cache()
    val newMedia = Seq(
      (1L, 0x0123456789ABCDEFL),        // exact copy of 100: hamming 0
      (2L, 0x0123456789ABCDEFL ^ 0x7L), // 3 bits off 100, one band touched
      (3L, ~0x0123456789ABCDEFL))       // shares a nibble with 0L but ham 32
    val input = MemoryStream[(Long, Long)]
    val q = Streams.incrementalHammingCandidates(
        input.toDF().toDF("media_id", "dhash"), corpusBands, "dhash",
        maxHamming = 10, bands = 16)
      .writeStream.format("memory").queryName("hamdup")
      .outputMode("append").start()
    try {
      input.addData(newMedia.take(2): _*)
      q.processAllAvailable()
      input.addData(newMedia.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("hamdup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // batch twin: bandedHammingPairs over corpus ∪ batch, cross pairs
      // only (new ids sort below corpus ids, so id1 is always the new
      // side there)
      val newIds = newMedia.map(_._1).toSet
      val batch = graft.operators.Multimodal.bandedHammingPairs(
          corpusHashes.unionAll(newMedia.toDF("media_id", "dhash")),
          "dhash", maxHamming = 10, bands = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .filter { case (a, b, _) => newIds.contains(a) && b >= 100L }
        .toSet
      assert(streamed === batch,
        "streamed Hamming candidates diverged from the batch pair join")
      assert(streamed.contains((1L, 100L, 0)) && streamed.contains((2L, 100L, 3)),
        "exact and 3-bit near-dup copies must surface")
      assert(!streamed.exists(_._1 == 3L),
        "a far hash sharing one bucket must die at the exact Hamming cut")
    } finally { q.stop(); corpusBands.unpersist(); () }
  }

  test("streaming decontamination screen equals the batch decontamFilter over sf0.001 docs") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val docs = sp.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("split", graft.operators.TextAnalysis.splitAssign($"doc_id"))
    val test = docs.filter($"split" === "test").select($"doc_id", $"text")
    val train = docs.filter($"split" === "train").select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = Streams.decontamScreen(
        input.toDF().toDF("doc_id", "text"), test, "doc_id", "text", tau = 0.2)
      .writeStream.format("memory").queryName("dscreen").outputMode("append").start()
    try {
      val (a, b) = train.splitAt(train.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("dscreen").select($"doc_id")
        .as[Long].collect().toSet
      val batch = graft.operators.TextAnalysis
        .decontamFilter(train.toDF("doc_id", "text"), test, "doc_id", "text", tau = 0.2)
        .select($"doc_id").as[Long].collect().toSet
      assert(streamed === batch, "streamed screen diverged from the batch filter")
      assert(streamed.nonEmpty, "screen dropped everything — vacuous equality")
      assert(streamed.size < train.length,
        "screen dropped nothing — vacuous gate (contaminated clones must be caught)")
    } finally { q.stop(); () }
  }

  test("streaming unigram encode equals the batch Viterbi encode over sf0.001 docs") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val docs = sp.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val vocab = graft.operators.TextAnalysis
      .unigramLmVocab(docs, "text", vocabMulti = 32, maxPieceLen = 4,
        maxWordLen = 12, emRounds = 1)
      .select($"piece", $"logp")
    // rows exercising both fallbacks ride along with real docs: a word
    // with chars unlikely in training, and one over the DP length cap
    val rows = docs.as[(Long, String)].collect().toSeq ++ Seq(
      (900001L, "zzzqqq internationalizations ok"),
      (900002L, "plain words again"))
    val input = MemoryStream[(Long, String)]
    val q = Streams.unigramEncodeScreen(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", vocab)
      .writeStream.format("memory").queryName("uscreen").outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("uscreen")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = graft.operators.TextAnalysis
        .unigramEncodeCounts(rows.toDF("doc_id", "text"), "doc_id", "text", vocab)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed === batch, "streamed encode diverged from batch")
      assert(streamed.nonEmpty && streamed.values.exists(v => v._2 > v._1),
        "vacuous: no doc with more pieces than words")
    } finally { q.stop(); () }
  }

  test("streaming wordpiece encode equals the batch greedy encode over sf0.001 docs") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val docs = sp.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val T = graft.operators.TextAnalysis
    val mergedPieces = T.wordpieceMerges(docs, "text", nMerges = 8)
      .select($"lhs", $"rhs").collect().map(r => r.getString(0) + r.getString(1))
    val alphabet = docs.filter($"text".isNotNull)
      .select(explode(T.tokens($"text")).as("w"))
      .select(explode(transform(sequence(lit(1), length($"w")),
        i => substring($"w", i, lit(1)))).as("c"))
      .distinct().as[String].collect()
    val pieces = (alphabet ++ mergedPieces).toIndexedSeq
    // a doc with an out-of-alphabet word exercises the UNK path in both
    val rows = docs.as[(Long, String)].collect().toSeq ++ Seq(
      (900001L, "zebra⊕glyph normal words")) // non-alnum splits; all-alnum words stay
    val input = MemoryStream[(Long, String)]
    val q = Streams.wordpieceEncodeScreen(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        pieces.toDF("piece"))
      .writeStream.format("memory").queryName("wpscreen").outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("wpscreen")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val batch = T.wordpieceEncodeCounts(rows.toDF("doc_id", "text"),
          "doc_id", "text", pieces)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(streamed === batch, "streamed wordpiece encode diverged from batch")
      assert(streamed.nonEmpty && streamed.values.exists(v => v._2 < v._1 * 10),
        "vacuous output")
    } finally { q.stop(); () }
  }

  test("streaming HLL sink: stored registers equal the batch sketch; versions prune; merge is idempotent") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-hll-sink").toString
    val statePath = s"$tmp/state"
    val rows = (0L until 3000L).map(i => (s"g${i % 2}", i))
    val input = MemoryStream[(String, Long)]
    val q = Streams.hllRegisterSink(input.toDF().toDF("g", "id"),
      statePath, s"$tmp/ckpt", "g", "id")
    try {
      val (a, b) = rows.splitAt(1000)
      input.addData(a: _*); q.processAllAvailable()
      val afterA = Streams.hllState(sp, statePath).get
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      input.addData(b: _*); q.processAllAvailable()
      val stored = Streams.hllState(sp, statePath).get
      val got = stored.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val batch = graft.operators.Analytics
        .hllRegisters(rows.toDF("g", "id"), "g", "id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === batch, "stream-accumulated registers diverged from batch sketch")
      assert(got !== afterA, "second batch changed nothing — vacuous")
      // re-merging an already-folded batch is a no-op (idempotent max)
      val again = graft.operators.Analytics.hllMergeRegisters(stored,
          graft.operators.Analytics.hllRegisters(b.toDF("g", "id"), "g", "id"), "g")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(again === got, "replay merge changed registers")
      // estimate over state ~ true distinct per group (1500 each)
      val est = Streams.hllStateEstimate(sp, statePath, "g")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(est.keySet === Set("g0", "g1"))
      est.values.foreach(v => assert(math.abs(v - 1500.0) / 1500.0 < 0.2, s"estimate $v"))
      // version pruning: at most 2 committed versions remain
      val root = new org.apache.hadoop.fs.Path(statePath)
      val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
      assert(fs.listStatus(root).count(_.getPath.getName.startsWith("v-")) <= 2)
    } finally { q.stop(); () }
  }

  test("streaming DDSketch sink: stored registers equal the batch sketch; replayed version id is skipped") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-dds-sink").toString
    val statePath = s"$tmp/state"
    val rows = (1L to 3000L).map(i =>
      (s"g${i % 2}", math.pow(10.0, 1.0 + (i * 2654435761L % 3000) / 1000.0)))
    val input = MemoryStream[(String, Double)]
    val q = Streams.ddsketchRegisterSink(input.toDF().toDF("g", "x"),
      statePath, s"$tmp/ckpt", "g", "x")
    try {
      val (a, b) = rows.splitAt(1000)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      def regs(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val stored = Streams.ddsketchState(sp, statePath).get
      val batch = graft.operators.Analytics
        .ddsketchRegisters(rows.toDF("g", "x"), "g", "x")
      assert(regs(stored) === regs(batch),
        "stream-accumulated registers diverged from batch sketch")
      // the replay guard: re-folding under an ALREADY-COMMITTED version
      // id must be a no-op (sum-merge would double-count without it)
      val root = new org.apache.hadoop.fs.Path(statePath)
      val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
      val lastV = fs.listStatus(root).map(_.getPath.getName)
        .filter(_.startsWith("v-")).map(_.stripPrefix("v-").toLong).max
      // simulate the crash-replay shape by checking the guard directly:
      // a second state read after another processAllAvailable with no
      // new data stays byte-identical
      q.processAllAvailable()
      assert(regs(Streams.ddsketchState(sp, statePath).get) === regs(batch))
      // quantiles over state match quantiles over the batch registers
      val sq = Streams.ddsketchStateQuantiles(sp, statePath, Seq(0.5, 0.99))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(4)).toMap
      val bq = graft.operators.Analytics
        .ddsketchQuantiles(batch, Seq(0.5, 0.99))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(4)).toMap
      assert(sq === bq && sq.size === 4)
      // version pruning holds
      assert(fs.listStatus(root).count(_.getPath.getName.startsWith("v-")) <= 2)
      assert(lastV >= 1L)
    } finally { q.stop(); () }
  }

  test("streaming mSPRT monitor: per-day folds equal the batch monitor's " +
      "looks, replay is a no-op, readout shares the batch columns") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    def md5arm(i: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 100 < 50) "a" else "b"
    }
    // the AnalyticsSpec corpus: 400 units over 10 arrival days, arm a
    // always converts, arm b never; each unit also has a later event so
    // the batch calendar runs to day 14
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int) = new java.sql.Timestamp(base.getTime + day * 86400000L)
    val events = (1L to 400L).flatMap { i =>
      val arrive = ((i - 1) % 10).toInt
      val typ = if (md5arm(i) == "a") "purchase" else "view"
      Seq((i, ts(arrive), typ), (i, ts(arrive + 5), "view"))
    }.toDF("user_id", "ts", "event_type")
    val batchRows = graft.operators.Analytics
      .sequentialMsprt(events, "user_id", "ts", "event_type", "purchase")
      .orderBy(col("day")).collect()
    val tmp = java.nio.file.Files.createTempDirectory("graft-msprt-sink").toString
    val statePath = s"$tmp/state"
    val input = MemoryStream[(Long, Long)]
    val q = Streams.msprtMonitorSink(input.toDF().toDF("u", "conv"),
      statePath, s"$tmp/ckpt", "u", "conv")
    try {
      // one micro-batch per arrival day, in day order: look k of the
      // stream is exactly look k of the batch monitor
      (0 until 10).foreach { day =>
        val units = (1L to 400L).filter(i => ((i - 1) % 10).toInt == day)
          .map(i => (i, if (md5arm(i) == "a") 1L else 0L))
        input.addData(units: _*); q.processAllAvailable()
      }
      val st = Streams.msprtState(sp, statePath).get.collect().head
      val b9 = batchRows(9) // last arrival day's look
      assert((st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3)) ===
        ((b9.getLong(1), b9.getLong(2), b9.getLong(3), b9.getLong(4))))
      assert(st.getDouble(4) === b9.getDouble(6), "log_lambda diverged")
      assert(st.getDouble(5) === b9.getDouble(7), "log_evidence diverged")
      // the batch calendar's trailing no-arrival days change nothing, so
      // the stream's final evidence equals the batch's LAST look too
      assert(st.getDouble(5) === batchRows.last.getDouble(7))
      // replay guard: another processAllAvailable with no data is a no-op
      q.processAllAvailable()
      val again = Streams.msprtState(sp, statePath).get.collect().head
      assert(again.toString === st.toString)
      // readout shares the batch columns: p and reject equal the batch's
      // final row
      val ro = Streams.msprtStateReadout(sp, statePath).collect().head
      assert(ro.getDouble(ro.fieldIndex("p_always_valid")) ===
        batchRows.last.getDouble(8))
      assert(ro.getBoolean(ro.fieldIndex("reject_h0")) ===
        batchRows.last.getBoolean(9))
      // version pruning holds
      val root = new org.apache.hadoop.fs.Path(statePath)
      val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
      assert(fs.listStatus(root).count(_.getPath.getName.startsWith("v-")) <= 2)
    } finally { q.stop(); () }
  }

  test("streaming ANN ingest: corpus store dedups, graph appends per batch, replay is a no-op") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-ingest").toString
    val e = sp.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") % 2 === 0)
    val cents = base.filter(col("vec_id") % 50 === 0)
      .orderBy(col("vec_id")).as[(Long, Array[Float])].collect()
    val corpusPath = s"$tmp/corpus"; val graphPath = s"$tmp/graph"
    base.write.parquet(corpusPath)
    graft.operators.Similarity.writeNswGraph(
      graft.operators.Similarity.nswGraphOn(base, cents, 8), graphPath, 4)
    val odds = e.filter(col("vec_id") % 2 === 1)
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = Streams.annAppendSink(input.toDF().toDF("vec_id", "embedding"),
      corpusPath, graphPath, s"$tmp/ckpt", cents, m = 8)
    try {
      val (b1, b2) = odds.splitAt(odds.length / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val store = sp.read.parquet(corpusPath)
      assert(store.count() === e.count(), "corpus store size wrong")
      assert(store.select(col("vec_id")).distinct().count() === e.count(),
        "corpus store has duplicate ids")
      val graph = sp.read.parquet(graphPath)
      assert(graph.filter(col("node_id") % 2 === 1)
        .select(col("node_id")).distinct().count() === odds.length.toLong,
        "not every streamed vector entered the graph")
      // crash-replay shape: the same rows delivered again change nothing
      val graphFiles = graph.inputFiles.toSet
      input.addData(b1: _*); q.processAllAvailable()
      assert(sp.read.parquet(corpusPath).count() === e.count(),
        "replayed batch duplicated corpus rows")
      assert(sp.read.parquet(graphPath).inputFiles.toSet === graphFiles,
        "replayed batch wrote graph files")
      // the grown index serves: streamed vectors find their exact NN
      val qs = e.filter(col("vec_id").isin(1L, 3L, 5L, 7L, 9L))
      val entries = base.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("node_id"))
      val served = graft.operators.Similarity
        .nswKnnStored(qs, sp.read.parquet(corpusPath), graphPath, entries,
          3, beam = 16, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .map { case (k2, v) => k2 -> v.map(_._2).toSet }
      val brute = graft.operators.Similarity.knn(qs, e, 1)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val hits = brute.count { case (qid, nn) => served.get(qid).exists(_(nn)) }
      assert(hits >= 3, s"only $hits/5 streamed queries found their exact NN")
    } finally { q.stop(); () }
  }

  test("decontamination screen bounds the test-side collect by the ANN broadcast contract") {
    val sp = spark
    import sp.implicits._
    // a "corpus passed as the test set": MaxBroadcastQueries + 1 tiny docs
    val over = sp.range(graft.operators.Similarity.MaxBroadcastQueries + 1L)
      .select($"id".as("doc_id"),
        concat(lit("alpha beta gamma delta "), $"id").as("text"))
    val train = Seq((1L, "totally unrelated")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Streams.decontamScreen(train, over, "doc_id", "text", tau = 0.2)
    }
    assert(e.getMessage.contains("decontamFilter"),
      s"oversized test set must point at the batch path: ${e.getMessage}")
    // the bound is a ceiling, not a truncation: a bounded set screens whole
    val okTest = Seq((10L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val screened = Streams.decontamScreen(
      Seq((1L, "the quick brown fox jumps high"), (2L, "nothing in common here at all"))
        .toDF("doc_id", "text"),
      okTest, "doc_id", "text", tau = 0.5)
    assert(screened.select($"doc_id").as[Long].collect().toSet === Set(2L),
      "bounded screen changed semantics")
  }

  test("streaming kNN label suggestion equals the batch classifier over sf0.001 embeddings") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val emb = sp.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // reference = the labeled corpus; stream = the same vectors arriving
    // (self excluded per record, mirroring the batch exclusion)
    val rows = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = Streams.streamingKnnClassify(
        input.toDF().toDF("vec_id", "embedding"), emb, k = 5)
      .writeStream.format("memory").queryName("kclassify")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("kclassify")
        .select($"vec_id", $"pred_label", $"votes")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      val batch = graft.operators.Labels.knnClassify(emb, emb, 5)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(streamed === batch, "streamed label suggestions diverged from batch")
      assert(streamed.nonEmpty && streamed.values.map(_._1).toSet.size > 1,
        "vacuous: all predictions identical")
    } finally { q.stop(); () }
  }

  test("streaming ANN serve over the stored NSW graph equals per-batch stored search") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val S = graft.operators.Similarity
    val emb = sp.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ann-serve").toString
    S.writeNswGraph(S.nswGraph(emb, m = 6), s"$tmp/graph", numFiles = 8)
    val entries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".cast("long").as("node_id"))
    val qrows = emb.filter($"vec_id" < 8)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = Streams.annServeSink(input.toDF().toDF("vec_id", "embedding"),
      emb, s"$tmp/graph", entries, s"$tmp/out", s"$tmp/ckpt",
      k = 3, beam = 6, rounds = 2)
    try {
      val (a, b) = qrows.splitAt(4)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      def resSet(df: org.apache.spark.sql.DataFrame) = df
        .select($"query_id", $"rank", $"neighbor_id", $"cs").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      // each micro-batch landed as its own overwrite-idempotent dir,
      // and the union equals the stored-graph batch search per batch
      val batches = new java.io.File(s"$tmp/out").listFiles()
        .filter(_.getName.startsWith("batch-")).sortBy(_.getName)
      assert(batches.length == 2, s"expected 2 batch dirs: ${batches.toSeq}")
      val streamed = resSet(sp.read.parquet(s"$tmp/out/batch-*"))
      val expected =
        resSet(S.nswKnnStored(a.toDF("vec_id", "embedding"), emb,
          s"$tmp/graph", entries, 3, beam = 6, rounds = 2)) ++
        resSet(S.nswKnnStored(b.toDF("vec_id", "embedding"), emb,
          s"$tmp/graph", entries, 3, beam = 6, rounds = 2))
      assert(streamed === expected, "streamed ANN serve diverged from batch")
      assert(streamed.map(_._1).size == streamed.map(t => t._1).size
        && streamed.nonEmpty && streamed.map(_._1) == qrows.map(_._1).toSet,
        "vacuous: not every streamed query answered")
    } finally { q.stop(); () }
  }

  test("streaming energy segmentation equals the batch kernel (map-only, no state)") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    def be(s: Short): Array[Byte] =
      Array(((s >> 8) & 0xFF).toByte, (s & 0xFF).toByte)
    val rnd = new scala.util.Random(17)
    val assets = (1L to 12L).map { id =>
      val samples = (0 until 60 + rnd.nextInt(60)).map { i =>
        val loud = (i / 10) % 2 == 0
        ((if (loud) 3000 + rnd.nextInt(9000) else rnd.nextInt(200)) *
          (if (rnd.nextBoolean()) 1 else -1)).toShort
      }
      graft.operators.MediaRecord(id, "audio/pcm", samples.flatMap(be).toArray)
    }
    val input = MemoryStream[graft.operators.MediaRecord]
    val q = graft.operators.Multimodal
      .pcm16EnergySegmentsKernel(input.toDS(), frameSize = 8, stride = 6,
        minEnergy = 1000000L)
      .writeStream.format("memory").queryName("esegs")
      .outputMode("append").start()
    try {
      val (a, b) = assets.splitAt(5)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getInt(5))).toSet
      val streamed = rows(sp.table("esegs"))
      val batch = rows(graft.operators.Multimodal
        .pcm16EnergySegmentsKernel(sp.createDataset(assets), 8, 6, 1000000L))
      assert(streamed === batch && streamed.nonEmpty,
        s"streamed segments diverged: ${streamed.size} vs ${batch.size}")
    } finally { q.stop(); () }
  }

  test("streaming group k-fold equals the batch folds (stream-static cluster map)") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val docs = (1L to 120L).map(i => (i, s"doc $i"))
    val clusters = Seq((5L, 5L), (8L, 5L), (16L, 5L), (30L, 30L), (42L, 30L))
      .toDF("doc_id", "cluster_id")
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.leakageSafeKFold(
        input.toDF().toDF("doc_id", "text"), "doc_id", clusters, 5)
      .writeStream.format("memory").queryName("lkfold")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(40)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = sp.table("lkfold").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("fold"))).toSet
      val batch = graft.operators.TextAnalysis.leakageSafeKFold(
          docs.toDF("doc_id", "text"), "doc_id", clusters, 5)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("fold"))).toSet
      assert(streamed === batch, "streamed folds diverged from batch folds")
      val m = streamed.toMap
      // cluster {30, 42} straddles micro-batches yet folds together
      assert(m(30L) === m(42L) && m(5L) === m(8L) && m(8L) === m(16L))
      assert(streamed.map(_._2).size === 5, "vacuous: not all 5 folds appeared")
    } finally { q.stop(); () }
  }

  test("streaming leakage-safe split equals the batch split (stream-static cluster map)") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val docs = (1L to 120L).map(i => (i, s"doc $i"))
    // clusters {5,8,16} (members' naive splits straddle) and {30,42}
    // (members arrive in DIFFERENT micro-batches)
    val clusters = Seq((5L, 5L), (8L, 5L), (16L, 5L), (30L, 30L), (42L, 30L))
      .toDF("doc_id", "cluster_id")
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.leakageSafeSplit(
        input.toDF().toDF("doc_id", "text"), "doc_id", clusters)
      .writeStream.format("memory").queryName("lsplit")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(40)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = sp.table("lsplit").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toSet
      val batch = graft.operators.TextAnalysis.leakageSafeSplit(
          docs.toDF("doc_id", "text"), "doc_id", clusters)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("split"))).toSet
      assert(streamed === batch, "streamed split diverged from the batch split")
      val m = streamed.toMap
      // the cluster straddling micro-batches still lands on ONE side —
      // the stateless guarantee a doc-keyed stream cannot give
      assert(m(30L) === m(42L) && m(5L) === m(8L) && m(8L) === m(16L))
      assert(streamed.map(_._2) === Set("train", "val", "test"),
        "vacuous: not all three splits appeared")
    } finally { q.stop(); () }
  }

  test("streaming quality screen equals the batch Gopher gate over sf0.001 docs") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val docs = sp.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    // permissive thresholds: the synthetic corpus fails the strict Gopher
    // defaults wholesale (no stopword prose), which would make the
    // equality vacuous — these pass SOME and fail SOME
    val q = Streams.qualityScreen(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        minWords = 50, minMeanLen = 1.0, maxMeanLen = 20.0,
        minAlphaFrac = 0.3, minStopHits = 0)
      .writeStream.format("memory").queryName("qscreen").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("qscreen").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getInt(4), r.getBoolean(5))).toSet
      val batch = graft.operators.TextAnalysis
        .gopherQuality(docs.toDF("doc_id", "text"), "doc_id", "text",
          minWords = 50, maxWords = 100000, minMeanLen = 1.0, maxMeanLen = 20.0,
          minAlphaFrac = 0.3, minStopHits = 0)
        .filter($"passes").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
          r.getInt(4), r.getBoolean(5))).toSet
      assert(streamed === batch, "streamed screen diverged from the batch gate")
      assert(streamed.nonEmpty, "screen passed nothing — vacuous equality")
      assert(streamed.size < docs.length, "screen passed everything — vacuous gate")
    } finally { q.stop(); () }
  }

  test("streaming media triage equals the batch path; hostile blobs dead-letter, never kill the query") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    // a mixed feed: real PNGs, real JPEGs, raw blobs, and HOSTILE
    // payloads (truncated JPEG, PNG bomb header) — the triage must
    // decode the good, dead-letter the bad, and the stream must match
    // the batch operator row for row
    val pngPx = Array.tabulate[Byte](16 * 4)(i => ((i * 29 + 3) % 256).toByte)
    val jpgPx = Array.fill[Byte](16 * 8)(77)
    val goodPng = graft.operators.Png.encodeGray(16, 4, pngPx, filter = 2)
    val goodJpg = graft.operators.Jpeg.encodeGray(16, 8, jpgPx,
      quant = graft.operators.Jpeg.UnitQuant)
    val truncatedJpg = java.util.Arrays.copyOf(goodJpg, 24)
    val bombPng = {
      val m = goodPng.clone()
      // blow up IHDR dims to 2^30 × 2^30 (CRC now wrong too — either
      // loud error is in contract)
      m(16) = 0x40; m(20) = 0x40
      m
    }
    val feed: Seq[(Long, String, Array[Byte])] = Seq(
      (1L, "image/png", goodPng), (2L, "image/jpeg", goodJpg),
      (3L, "application/octet-stream", Array[Byte](9, 8, 7)),
      (4L, "image/jpeg", truncatedJpg), (5L, "image/png", bombPng))
    val input = MemoryStream[(Long, String, Array[Byte])]
    val q = Streams.mediaTriageScreen(
        graft.operators.Multimodal.pack(
          input.toDF().toDF("media_id", "media_type", "payload"),
          "media_id", "media_type", "payload")(sp))
      .writeStream.format("memory").queryName("mtriage").outputMode("append").start()
    try {
      val (a, b) = feed.splitAt(2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getString(3),
          r.getInt(4), r.getString(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getLong(9))).toSet
      val streamed = rows(spark.table("mtriage"))
      val batch = rows(graft.operators.Multimodal.triageFeatures(
        sp.createDataset(feed.map(f =>
          graft.operators.MediaRecord(f._1, f._2, f._3)))).toDF())
      assert(streamed === batch, "streamed triage diverged from the batch path")
      val ok = streamed.filter(_._3).map(_._1)
      val dead = streamed.filter(!_._3).map(_._1)
      assert(ok === Set(1L, 2L, 3L), s"wrong survivors: $ok")
      assert(dead === Set(4L, 5L), s"wrong dead letters: $dead")
      // decoded features are REAL decodes, not payload passthrough
      val pngRow = streamed.find(_._1 == 1L).get
      assert(pngRow._5 === 16 * 4, "PNG did not decode to its pixel count")
      val jpgRow = streamed.find(_._1 == 2L).get
      assert(jpgRow._5 === 16 * 8, "JPEG did not decode to its pixel count")
      // dead letters carry the codec's loud message
      assert(streamed.find(_._1 == 5L).get._4.nonEmpty, "bomb row lost its error")
    } finally { q.stop(); () }
  }

  test("streaming blocklist screen equals the batch Aho-Corasick screen over sf0.001 docs") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val docs = sp.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val pats = Seq("table part", "fast table", "a a")
    val input = MemoryStream[(Long, String)]
    val q = Streams.blocklistScreen(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", pats, maxHits = 1)
      .writeStream.format("memory").queryName("bscreen").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      input.addData(a: _*); q.processAllAvailable()
      input.addData(b: _*); q.processAllAvailable()
      val streamed = spark.table("bscreen").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = graft.operators.Cleaning
        .blocklistScreen(docs.toDF("doc_id", "text"), "doc_id", "text",
          pats, maxHits = 1)
        .filter($"keep").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed === batch, "streamed screen diverged from the batch screen")
      assert(streamed.nonEmpty, "screen kept nothing — vacuous equality")
      assert(streamed.size < docs.length, "screen kept everything — vacuous gate")
    } finally { q.stop(); () }
  }

  test("streaming DSIR scoring under a frozen model equals the batch scorer") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    // model trained once on a static target + raw pool
    val target = Seq((100L, "science research data experiments analysis"),
      (101L, "data science methods research results")).toDF("doc_id", "text")
    val rawPool = Seq((200L, "casino jackpot slots winner bonus"),
      (201L, "shopping deals discount offers sale today")).toDF("doc_id", "text")
    val (model, wOov) = graft.operators.TextAnalysis
      .dsirModel(rawPool, target, "text")
    val frozen = model.cache(); frozen.count()
    // new docs arriving as a stream: target-like, raw-like, and
    // both-sides-OOV content (exercises the wOov fallback)
    val newDocs = Seq(
      (1L, "science data research"),
      (2L, "casino bonus offers"),
      (3L, "zebras telescopes astronomy"),
      (4L, "data casino zebras"))
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.dsirScore(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", frozen, wOov)
      .writeStream.format("memory").queryName("dsirscore").outputMode("update").start()
    try {
      input.addData(newDocs.take(2): _*); q.processAllAvailable()
      input.addData(newDocs.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("dsirscore").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      val batch = graft.operators.TextAnalysis.dsirScore(
          newDocs.toDF("doc_id", "text"), "doc_id", "text", frozen, wOov)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
      assert(streamed === batch, "streamed DSIR scores diverged from batch")
      val byId = streamed.map(t => t._1 -> t._3).toMap
      assert(byId(1L) > byId(2L), "target-like doc must outscore raw-like")
    } finally { q.stop(); frozen.unpersist(); () }
  }

  test("streaming quality-classifier scoring under frozen weights equals the batch scorer") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    // train once on a static labeled corpus, freeze the weights
    val labeled = ((1L to 8L).map(i => (i, s"excellent wonderful item $i", 1.0)) ++
      (9L to 16L).map(i => (i, s"terrible awful item $i", 0.0)))
      .toDF("doc_id", "text", "y")
    val w = graft.operators.Classifier
      .trainTextClassifier(labeled, "doc_id", "text", "y", rounds = 10, lr = 1.0)
      .cache()
    w.count()
    // new docs arrive as a stream: positive-like, negative-like, and a
    // token-free doc (exercises the explode_outer null-bucket path)
    val newDocs = Seq((101L, "excellent wonderful thing"),
      (102L, "terrible awful thing"), (103L, "???"))
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Classifier.scoreTextClassifier(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", w)
      .writeStream.format("memory").queryName("clfscore").outputMode("update").start()
    try {
      input.addData(newDocs.take(2): _*); q.processAllAvailable()
      input.addData(newDocs.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("clfscore").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      val batch = graft.operators.Classifier.scoreTextClassifier(
          newDocs.toDF("doc_id", "text"), "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      assert(streamed === batch, "streamed classifier scores diverged from batch")
      val byId = streamed.map(t => t._1 -> t._2).toMap
      assert(byId(101L) > byId(102L), "positive-like doc must outscore negative-like")
      assert(byId.contains(103L), "token-free doc must still be scored")
    } finally { q.stop(); w.unpersist(); () }
  }

  test("streaming ingest keeps the skipping manifest fresh with one updateManifest per batch") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-manifest").toFile
    root.deleteOnExit()
    val dataDir = s"${root.getAbsolutePath}/data"
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation", s"${root.getAbsolutePath}/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(dataDir)
        // idempotent per-batch maintenance: bootstraps on the first
        // batch, appends stats for the new files on every later one
        graft.operators.Layout.updateManifest(sp, dataDir, Seq("k"))
      }.start()
    try {
      input.addData((0L until 100L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      input.addData((100L until 200L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      val files = sp.read.parquet(dataDir).inputFiles.toSet
      val covered = sp.read
        .parquet(s"$dataDir/${graft.operators.Layout.ManifestDir}")
        .collect().map(_.getAs[String]("file")).toSet
      assert(covered === files,
        s"manifest drifted from the data: ${covered.size} vs ${files.size} files")
      // ranges spanning both batches serve correctly through the manifest
      val got = graft.operators.Layout
        .prunedRead(sp, dataDir, Seq(("k", 95L, 105L)))
        .collect().map(_.getLong(0)).toSet
      assert(got === (95L to 105L).toSet)
    } finally q.stop()
  }

  test("streaming count-min sketch over a MemoryStream equals the batch sketch") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val width = 64
    // skewed key stream over two triggers: the state between triggers is
    // the sketch buffer itself, never a per-key map
    val keys = (1 to 500).map(i => s"supp_${i % 37}")
    val input = MemoryStream[String]
    val q = Streams.streamingCountMin(input.toDF(), "value", width)
      .writeStream.format("memory").queryName("cms").outputMode("complete").start()
    try {
      input.addData(keys.take(200): _*)
      q.processAllAvailable()
      input.addData(keys.drop(200): _*)
      q.processAllAvailable()
      val streamed = spark.table("cms").collect()
      assert(streamed.length === 1)
      val batch = keys.toDF("k")
        .agg(org.apache.spark.sql.functions.udaf(
          graft.functions.Sketches.countMin(width)).apply(col("k")).as("sketch"))
        .collect()
      // identical state: same width, counter-for-counter
      assert(streamed.head.getStruct(0).getInt(0) === batch.head.getStruct(0).getInt(0))
      assert(streamed.head.getStruct(0).getSeq[Long](1) === batch.head.getStruct(0).getSeq[Long](1))
      // and the SAME estimator Column reads the streamed sketch: every
      // key's estimate covers its exact count (CM never undercounts)
      val exact = keys.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val est = spark.table("cms").crossJoin(exact.toSeq.toDF("k", "exact_cnt"))
        .select(col("k"), col("exact_cnt"),
          graft.functions.Sketches.cmEstimate(col("sketch"), col("k"), width).as("est"))
        .collect()
      assert(est.length === 37)
      est.foreach(r => assert(r.getLong(2) >= r.getLong(1),
        s"undercount for ${r.getString(0)}: ${r.getLong(2)} < ${r.getLong(1)}"))
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered keys within the watermark") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[StreamEvent]
    val q = Streams.dedupStream(input.toDF(), Seq("user_id", "event_type"),
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      input.addData(
        StreamEvent(1, ts(1), "view", 1.0),
        StreamEvent(1, ts(2), "view", 2.0), // duplicate key within watermark
        StreamEvent(1, ts(2), "click", 3.0),
        StreamEvent(2, ts(3), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("dd").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(spark.table("dd").count() == 3)
      assert(rows == Set((1L, "view"), (1L, "click"), (2L, "view")))
    } finally q.stop()
  }

  test("watermarked stream-stream interval join pairs events within the window") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val views = MemoryStream[StreamEvent]
    val purchases = MemoryStream[StreamEvent]
    val joined = Streams.intervalJoin(
        views.toDF().select($"user_id", $"ts", $"event_type".as("view_type")),
        purchases.toDF().select($"user_id", $"ts", $"event_type".as("p_type")),
        "user_id", windowSec = 300)
      .select(col("l.user_id"), col("l.ts").as("view_ts"), col("r.ts").as("p_ts"))
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      views.addData(StreamEvent(1, ts(0), "view", 0), StreamEvent(2, ts(0), "view", 0))
      purchases.addData(
        StreamEvent(1, ts(3), "purchase", 0),  // within 5 min of view -> joins
        StreamEvent(2, ts(9), "purchase", 0))  // 9 min after view -> outside window
      q.processAllAvailable()
      val rows = spark.table("ivj").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(rows == Set((1L, ts(0), ts(3))))
    } finally q.stop()
  }

  test("left-outer interval join emits the null row only after the watermark") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val views = MemoryStream[StreamEvent]
    val purchases = MemoryStream[StreamEvent]
    val joined = Streams.intervalJoin(
        views.toDF().select($"user_id", $"ts"),
        purchases.toDF().select($"user_id", $"ts", $"value".as("amount")),
        "user_id", windowSec = 300, watermark = "1 minute", joinType = "left_outer")
      .select(col("l.user_id"), col("l.ts").as("view_ts"), col("r.amount"))
    val q = joined.writeStream.format("memory").queryName("loj")
      .outputMode("append").start()
    try {
      views.addData(StreamEvent(1, ts(0), "view", 0), StreamEvent(2, ts(0), "view", 0))
      purchases.addData(StreamEvent(1, ts(3), "purchase", 9.5))
      q.processAllAvailable()
      // user 1 matched; user 2's null row must NOT appear yet — a
      // partner could still arrive within the window + watermark
      val early = sp.table("loj").collect().map(_.getLong(0)).toSet
      assert(early == Set(1L), s"got $early")
      // advance the watermark well past view_ts + window on both sides
      views.addData(StreamEvent(9, ts(30), "view", 0))
      purchases.addData(StreamEvent(9, ts(30), "purchase", 0))
      q.processAllAvailable()
      views.addData(StreamEvent(9, ts(50), "view", 0))
      purchases.addData(StreamEvent(9, ts(50), "purchase", 0))
      q.processAllAvailable()
      val rows = sp.table("loj").collect()
        .filter(r => r.getLong(0) <= 2L)
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(rows == Set((1L, Some(9.5)), (2L, None)), s"got $rows")
    } finally q.stop()
  }

  test("out-of-order event within watermark extends a session backwards") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[StreamEvent]
    val q = Streams.sessionize(input.toDS(), gapSec = 120)
      .writeStream.format("memory").queryName("ooo").outputMode("append").start()
    try {
      input.addData(StreamEvent(1, ts(20), "view", 1.0))
      q.processAllAvailable()
      // late event at 10:19 (within gap of the open session) arrives next batch
      input.addData(StreamEvent(1, ts(19), "view", 2.0))
      q.processAllAvailable()
      // push watermark far forward via another key to time the session out
      input.addData(StreamEvent(2, ts(40), "view", 0.0))
      q.processAllAvailable()
      input.addData(StreamEvent(2, ts(50), "view", 0.0))
      q.processAllAvailable()
      val s = spark.table("ooo").as[SessionOut].collect().find(_.user_id == 1L)
      assert(s.isDefined)
      assert(s.get.start == ts(19), "session start must extend backwards")
      assert(s.get.n_events == 2)
    } finally q.stop()
  }

  test("streaming sessionize replayed over sf0.001 events equals batch sessionize") {
    import org.apache.spark.sql.functions._
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val gapSec = 600L
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

    val batchDf = graft.queries.Queries.events(sp, "/root/testdata/sf0.001")
      .select($"user_id", $"ts", $"event_type", $"value")
    // batch oracle: the q28 shape — sessionize, then one row per session
    val expected = graft.operators.TemporalJoins
      .sessionize(batchDf, "user_id", "ts", gapSec)
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("start"), max($"ts").as("end"),
        count(lit(1)).as("n"), sum($"value").as("sv"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4), r4(r.getDouble(5)))).toSet

    val events = batchDf.as[StreamEvent].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[StreamEvent]
    val q = Streams.sessionize(input.toDS(), gapSec)
      .writeStream.format("memory").queryName("replay").outputMode("append").start()
    try {
      // replay in time order across two batches (exercises state carried
      // between batches), then two sentinel events on an unused key to
      // push the watermark past every real session's end + gap
      val (a, b) = events.splitAt(events.length / 2)
      input.addData(a.toSeq)
      q.processAllAvailable()
      input.addData(b.toSeq)
      q.processAllAvailable()
      val maxMs = events.map(_.ts.getTime).max
      input.addData(StreamEvent(-1L, new Timestamp(maxMs + 10 * gapSec * 1000L), "wm", 0.0))
      q.processAllAvailable()
      input.addData(StreamEvent(-1L, new Timestamp(maxMs + 20 * gapSec * 1000L), "wm", 0.0))
      q.processAllAvailable()
      val got = sp.table("replay").as[SessionOut].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.start, s.end, s.n_events.toLong, r4(s.sum_value)))
        .toSet
      assert(got.size == expected.size, s"${got.size} streamed vs ${expected.size} batch sessions")
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming windowed counts replayed over sf0.001 events equal batch aggregation") {
    import org.apache.spark.sql.functions._
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

    val batchDf = graft.queries.Queries.events(sp, "/root/testdata/sf0.001")
      .select($"user_id", $"ts", $"event_type", $"value")
    val expected = batchDf
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .collect()
      .map(r => (r.getStruct(0).getTimestamp(0), r.getString(1),
        r.getLong(2), r4(r.getDouble(3)))).toSet

    val events = batchDf.as[StreamEvent].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[StreamEvent]
    val q = Streams.windowedCounts(input.toDF(), windowDuration = "1 hour",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("wc_replay")
      .outputMode("append").start()
    try {
      input.addData(events.toSeq)
      q.processAllAvailable()
      val maxMs = events.map(_.ts.getTime).max
      // sentinel events close every real window (append emits finalized only)
      input.addData(StreamEvent(-1L, new Timestamp(maxMs + 7200 * 1000L), "wm", 0.0))
      q.processAllAvailable()
      input.addData(StreamEvent(-1L, new Timestamp(maxMs + 14400 * 1000L), "wm", 0.0))
      q.processAllAvailable()
      val got = sp.table("wc_replay").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r4(r.getDouble(3))))
        .filter(_._2 != "wm").toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("built-in session_window stream merges gaps and agrees with the stateful path") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[StreamEvent]
    val q = Streams.sessionWindowAgg(input.toDF(), gap = "2 minutes",
        watermark = "2 minutes")
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    try {
      input.addData(
        StreamEvent(1, ts(1), "view", 1.0),
        StreamEvent(1, ts(2), "view", 2.0), // same session (gap <= 2 min)
        StreamEvent(1, ts(10), "view", 4.0)) // new session
      q.processAllAvailable()
      // push watermark past both sessions' end
      input.addData(StreamEvent(2, ts(30), "view", 0.0))
      q.processAllAvailable()
      input.addData(StreamEvent(2, ts(45), "view", 0.0))
      q.processAllAvailable()
      val rows = sp.table("sw").collect()
        .filter(_.getLong(0) == 1L)
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(rows == Set(
        (1L, ts(1), ts(4), 2L, 3.0),   // end = last event + gap
        (1L, ts(10), ts(12), 1L, 4.0)))
    } finally q.stop()
  }

  test("stream-stream interval join replayed over sf0.001 equals batch range join") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val ev = graft.queries.Queries.events(sp, "/root/testdata/sf0.001")
      .select($"user_id", $"ts", $"event_type", $"value", $"event_id")
    // batch oracle: the q27 shape over the same inputs
    val bViews = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_event_id"), $"user_id", $"ts")
    val bPurch = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_event_id"), $"user_id", $"ts".as("p_ts"))
    val expected = graft.operators.TemporalJoins
      .range(bViews, bPurch, "user_id", "ts", "p_ts", 0L, 1800L)
      .select($"view_event_id", $"purchase_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val rows = ev.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(4)))
    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val joined = Streams.intervalJoin(
        views.toDF().toDF("user_id", "ts", "view_event_id"),
        purchases.toDF().toDF("user_id", "ts", "purchase_event_id"),
        "user_id", windowSec = 1800, watermark = "1 hour")
      .select(col("l.view_event_id"), col("r.purchase_event_id"))
    val q = joined.writeStream.format("memory").queryName("ivj_replay")
      .outputMode("append").start()
    try {
      views.addData(rows.collect { case (u, t, "view", id) => (u, t, id) }.toSeq)
      purchases.addData(rows.collect { case (u, t, "purchase", id) => (u, t, id) }.toSeq)
      q.processAllAvailable()
      val got = sp.table("ivj_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.size == expected.size, s"${got.size} streamed vs ${expected.size} batch pairs")
      assert(got == expected)
    } finally q.stop()
  }

  test("sessionize state survives a query restart from checkpoint") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.Encoders
    val srcDir = java.nio.file.Files.createTempDirectory("graft-rst-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-rst-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rst-ckpt").toString
    def append(rows: StreamEvent*): Unit =
      rows.toSeq.toDS().write.mode("append").parquet(srcDir)
    def start() = Streams.sessionize(
        sp.readStream.schema(Encoders.product[StreamEvent].schema)
          .parquet(srcDir).as[StreamEvent], gapSec = 120)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1: open a session, emit nothing, stop mid-flight
    append(StreamEvent(1, ts(1), "view", 1.0), StreamEvent(1, ts(2), "view", 2.0))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // run 2 from the SAME checkpoint: the open session must have been
    // restored from the state store, merged with new data, and closed
    // once the watermark passes
    append(StreamEvent(1, ts(10), "view", 4.0), StreamEvent(9, ts(40), "view", 0.0))
    val q2 = start()
    try {
      q2.processAllAvailable()
      append(StreamEvent(9, ts(55), "view", 0.0))
      q2.processAllAvailable()
      append(StreamEvent(9, ts(59), "view", 0.0))
      q2.processAllAvailable()
      val sessions = sp.read.parquet(outDir).as[SessionOut].collect()
        .filter(_.user_id == 1L).toSet
      assert(sessions.contains(SessionOut(1, ts(1), ts(2), 2, 3.0)),
        s"run-1 session lost across restart: $sessions")
      assert(sessions.contains(SessionOut(1, ts(10), ts(10), 1, 4.0)), s"got $sessions")
    } finally q2.stop()
  }

  test("stream-to-parquet sink roundtrip (append mode, checkpointed)") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val input = MemoryStream[StreamEvent]
    val q = Streams.windowedCounts(input.toDF(), windowDuration = "10 minutes",
        watermark = "5 minutes")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(
        StreamEvent(1, ts(1), "view", 1.0),
        StreamEvent(2, ts(2), "view", 2.0),
        StreamEvent(1, ts(11), "click", 3.0))
      q.processAllAvailable()
      // advance the watermark so the first window finalizes into the sink
      input.addData(StreamEvent(9, ts(40), "view", 0.0))
      q.processAllAvailable()
      input.addData(StreamEvent(9, ts(55), "view", 0.0))
      q.processAllAvailable()
      val back = sp.read.parquet(outDir)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(back.contains(
        (Timestamp.valueOf("2026-01-01 10:00:00"), "view", 2L, 3.0)), back.toSeq)
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on event-time gap") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = MemoryStream[StreamEvent]
    val q = Streams.sessionize(input.toDS(), gapSec = 120)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: events at 10:01, 10:02 (one session), then 10:10 (new session)
      input.addData(
        StreamEvent(1, ts(1), "view", 1.0),
        StreamEvent(1, ts(2), "view", 2.0))
      q.processAllAvailable()
      input.addData(StreamEvent(1, ts(10), "view", 4.0))
      q.processAllAvailable()
      // the first session closes once the 10:10 event pushes the
      // watermark (10:08) past its end + gap (10:04) — not before
      val afterGap = spark.table("sess").as[SessionOut].collect().toSet
      assert(afterGap == Set(SessionOut(1, ts(1), ts(2), 2, 3.0)))
      // advance the watermark past both sessions' end + gap
      input.addData(StreamEvent(2, ts(30), "view", 0.0))
      q.processAllAvailable()
      input.addData(StreamEvent(2, ts(40), "view", 0.0))
      q.processAllAvailable()
      val finalRows = spark.table("sess").as[SessionOut].collect().toSet
      assert(finalRows.contains(SessionOut(1, ts(1), ts(2), 2, 3.0)))
      assert(finalRows.contains(SessionOut(1, ts(10), ts(10), 1, 4.0)))
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch join and broadcasts the dim") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dim = spark.createDataFrame(Seq(
      (1L, "gold"), (2L, "silver"))).toDF("user_id", "tier")
    val input = MemoryStream[StreamEvent]
    val q = Streams.enrich(input.toDF(), dim, "user_id")
      .select(col("user_id"), col("event_type"), col("tier"))
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      input.addData(
        StreamEvent(1, ts(1), "view", 1.0),
        StreamEvent(2, ts(2), "click", 2.0),
        StreamEvent(3, ts(3), "view", 3.0)) // user 3 not in dim → dropped (inner)
      q.processAllAvailable()
      val got = spark.table("enr").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set((1L, "view", "gold"), (2L, "click", "silver")))
      // the static dimension must broadcast — a stream must not shuffle
      // per batch for a dimension-sized side
      val se = q.getClass.getMethod("streamingQuery").invoke(q)
      val plan = se.getClass.getMethod("lastExecution").invoke(se)
        .asInstanceOf[org.apache.spark.sql.execution.QueryExecution]
        .executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    } finally q.stop()
  }

  test("streaming file source prunes to touched leaves via the generated schema") {
    import org.apache.spark.sql.types.StructType
    import graft.schema.SchemaOnRead
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-prune").toString
    // nested input with fat UNTOUCHED columns — md5 chains, so the parquet
    // chunks are incompressible and the bytes-read delta is unmissable
    val junk = "concat_ws('', transform(sequence(1, 16), " +
      "i -> md5(concat(cast(id as string), '_', cast(i as string)))))"
    spark.range(0, 5000).selectExpr(
      "id",
      s"named_struct('keep', id, 'drop1', $junk, 'drop2', $junk) as big",
      s"concat($junk, $junk) as payload")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/in")
    val fullSchema: StructType = spark.read.parquet(s"$dir/in").schema

    def streamQuery(schema: StructType) =
      spark.readStream.schema(schema).parquet(s"$dir/in")
        .filter(col("big.keep") % 2 === 0)
        .select(col("id"), col("big.keep").as("k"))

    // generate from the STREAMING plan: the relation keys by its directory
    val res = SchemaOnRead.generate(streamQuery(fullSchema).queryExecution.analyzed, spark)
    val pruned = res.schemaFor(s"$dir/in")
    assert(pruned.isDefined, s"stream relation not analyzed: ${res.relationKeys}")
    assert(pruned.get.fieldNames.toSeq.sorted == Seq("big", "id"),
      s"payload not dropped: ${pruned.get.toDDL}")
    assert(pruned.get.find(_.name == "big").get.dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("keep"), s"big not narrowed: ${pruned.get.toDDL}")

    // run the same stream with the full vs generated schema, compare
    // results AND the input bytes each microbatch scan requires. Bytes are
    // footer-accounted (compressed size of the column chunks the scan's
    // requiredSchema touches) — local-FS byte counters miss parquet's
    // vectored column-chunk reads entirely, so they can't tell a full
    // scan from a pruned one. Built-in nested pruning is disabled for
    // both runs to isolate what the SOURCE schema alone delivers.
    def run(name: String, schema: StructType): (Set[(Long, Long)], Long) = {
      val q = streamQuery(schema).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      val scanSchemas =
        try {
          q.processAllAvailable()
          // lastExecution is private[sql] — reflect to reach the microbatch
          // QueryExecution (public API type) without living in spark's package
          val se = q.getClass.getMethod("streamingQuery").invoke(q)
          se.getClass.getMethod("lastExecution").invoke(se)
            .asInstanceOf[org.apache.spark.sql.execution.QueryExecution]
            .executedPlan.collect {
              case f: org.apache.spark.sql.execution.FileSourceScanExec => f.requiredSchema
            }
        } finally q.stop()
      assert(scanSchemas.nonEmpty, s"$name: no file scan in the microbatch plan")
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bytes = graft.PruneBench.requiredBytes(s"$dir/in", scanSchemas.head,
        spark.sessionState.newHadoopConf())
      (rows, bytes)
    }
    spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
    try {
      val (fullRows, fullBytes) = run("sp_full", fullSchema)
      val (prunedRows, prunedBytes) = run("sp_pruned", pruned.get)
      assert(prunedRows == fullRows, "pruned-schema stream changed results")
      assert(fullRows.size == 2500)
      // id+keep vs id+whole big (md5 junk): the reduction must be drastic
      assert(prunedBytes < fullBytes / 10,
        s"pruned stream scan not materially narrower: $prunedBytes vs $fullBytes")
    } finally spark.conf.unset("spark.sql.optimizer.nestedSchemaPruning.enabled")
  }

  test("ewmaLevels: streamed level is bit-identical to the batch ewma " +
      "after every in-order batch") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val b1 = Seq(EwmaEvent(1, 1, ts(1), 1.0), EwmaEvent(1, 2, ts(2), 2.0),
      EwmaEvent(2, 3, ts(1), 5.0))
    val b2 = Seq(EwmaEvent(1, 4, ts(3), 3.0), EwmaEvent(2, 5, ts(4), 7.0),
      EwmaEvent(3, 6, ts(5), 9.0))
    def batchTwin(evs: Seq[EwmaEvent]): Map[Long, (Int, Double)] =
      graft.operators.Analytics.ewma(evs.toDF(), "user_id", "ts",
          "event_id", "value")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
        .toMap
    val input = MemoryStream[EwmaEvent]
    val q = Streams.ewmaLevels(input.toDS())
      .writeStream.format("memory").queryName("ewma_lv")
      .outputMode("update").start()
    try {
      // update mode appends one row per touched key per batch; the
      // latest state per key is the row with the highest n_points
      // (strictly monotone for touched keys)
      def latest(): Map[Long, (Int, Double)] = spark.table("ewma_lv")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1)
        .map { case (k, rs) =>
          val top = rs.maxBy(_._2); k -> ((top._2, top._3)) }
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() === batchTwin(b1))
      input.addData(b2: _*)
      q.processAllAvailable()
      // fold splits over concatenation: carried state ≡ re-running the
      // batch operator over everything seen so far, bit for bit
      assert(latest() === batchTwin(b1 ++ b2))
      val l = latest()
      // hand check user 1: y = 1; .3*2+.7*1 = 1.3; .3*3+.7*1.3 = 1.81
      assert(l(1L)._1 === 3 && math.abs(l(1L)._2 - 1.81) < 1e-12)
      assert(l(3L) === ((1, 9.0)))
    } finally q.stop()
  }

  test("hampelAnomalies: streamed rows are identical to the trailing " +
      "batch operator over the union, batch split notwithstanding") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")
    // user 1: steady 2s with a day-5 spike; user 2: short ramp.
    // Split mid-series so day 6's trailing window straddles batches.
    val b1 = Seq(DailyCount(1, day(1), 2), DailyCount(1, day(2), 2),
      DailyCount(1, day(3), 2), DailyCount(1, day(4), 2),
      DailyCount(1, day(5), 10), DailyCount(2, day(1), 1))
    val b2 = Seq(DailyCount(1, day(6), 2), DailyCount(1, day(7), 2),
      DailyCount(2, day(2), 3), DailyCount(2, day(3), 5))
    // the batch twin consumes raw events; expand each daily count into
    // that many same-day rows
    def batchTwin(ds: Seq[DailyCount]): Set[(Long, String, Long, Double, Double, Boolean)] = {
      val events = ds.flatMap(d => (1L to d.n_events).map(_ =>
        (d.user_id, new java.sql.Timestamp(d.day.getTime))))
      graft.operators.Analytics.rollingMadAnomalies(
          events.toDF("user_id", "ts"), "user_id", "ts", centered = false)
        .collect().map(r => (r.getLong(0), r.getDate(1).toString,
          r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
        .toSet
    }
    val input = MemoryStream[DailyCount]
    val q = Streams.hampelAnomalies(input.toDS())
      .writeStream.format("memory").queryName("hampel_out")
      .outputMode("append").start()
    try {
      def emitted(): Set[(Long, String, Long, Double, Double, Boolean)] =
        spark.table("hampel_out").collect()
          .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
            r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSet
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(emitted() === batchTwin(b1))
      input.addData(b2: _*)
      q.processAllAvailable()
      // a trailing window only looks backward: carried state ≡ the
      // batch operator re-run over everything seen so far
      val all = emitted()
      assert(all === batchTwin(b1 ++ b2))
      // the spike day is flagged (window {2,2,2,2,10}: med 2, mad 0)
      assert(all.contains((1L, "2024-01-05", 10L, 2.0, 0.0, true)))
      // the day after is not (10 is in-window but off-median)
      val d6 = all.find(r => r._1 == 1L && r._2 == "2024-01-06").get
      assert(!d6._6)
    } finally q.stop()
  }

  test("cusumLevels: streamed state is bit-identical to the pinned-" +
      "baseline batch operator after every in-order batch") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")
    val mu = 3.0
    // user 1 drifts up mid-series; user 2 stays flat
    val b1 = Seq(DailyCount(1, day(1), 3), DailyCount(1, day(2), 5),
      DailyCount(1, day(3), 6), DailyCount(2, day(1), 3))
    val b2 = Seq(DailyCount(1, day(4), 7), DailyCount(1, day(5), 8),
      DailyCount(2, day(2), 3), DailyCount(2, day(3), 3))
    def batchTwin(ds: Seq[DailyCount]): Map[Long, (Int, Double, Double, Double, Long)] = {
      val events = ds.flatMap(d => (1L to d.n_events).map(_ =>
        (d.user_id, new java.sql.Timestamp(d.day.getTime))))
      graft.operators.Analytics.cusumChangepoints(
          events.toDF("user_id", "ts"), "user_id", "ts",
          refMean = Some(mu))
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getLong(5)))).toMap
    }
    val input = MemoryStream[DailyCount]
    val q = Streams.cusumLevels(input.toDS(), refMean = mu)
      .writeStream.format("memory").queryName("cusum_lv")
      .outputMode("update").start()
    try {
      def latest(): Map[Long, (Int, Double, Double, Double, Long)] =
        spark.table("cusum_lv").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4), r.getLong(5)))
          .groupBy(_._1)
          .map { case (k, rs) =>
            val top = rs.maxBy(_._2)
            k -> ((top._2, top._3, top._4, top._5, top._6)) }
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() === batchTwin(b1))
      input.addData(b2: _*)
      q.processAllAvailable()
      // pinning mu makes the fold prefix-stable: carried state ≡ the
      // batch operator re-run over everything seen so far
      assert(latest() === batchTwin(b1 ++ b2))
      // hand check user 1 (mu 3, kap .75): s+ after 3,5,6,7,8 =
      // 0, 1.25, 3.5, 6.75, 11.0; alarms (h = 12) = 0
      val l = latest()(1L)
      assert(l._1 === 5 && l._3 === 11.0 && l._5 === 0L)
      // user 2 never leaves baseline
      assert(latest()(2L)._3 === 0.0)
    } finally q.stop()
  }

  test("holtWintersLevels: streamed state is bit-identical to the batch " +
      "operator after every in-order batch") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")
    // user 1 ramps with a period-2 wiggle; user 2 is a single day
    val b1 = Seq(DailyCount(1, day(1), 1), DailyCount(1, day(2), 4),
      DailyCount(1, day(3), 2), DailyCount(2, day(1), 5))
    val b2 = Seq(DailyCount(1, day(4), 6), DailyCount(1, day(5), 3))
    def batchTwin(ds: Seq[DailyCount]): Map[Long, (Int, Double, Double, Double, Double)] = {
      val events = ds.flatMap(d => (1L to d.n_events).map(_ =>
        (d.user_id, new java.sql.Timestamp(d.day.getTime))))
      graft.operators.Analytics.holtWinters(
          events.toDF("user_id", "ts"), "user_id", "ts", period = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5)))).toMap
    }
    val input = MemoryStream[DailyCount]
    val q = Streams.holtWintersLevels(input.toDS(), period = 2)
      .writeStream.format("memory").queryName("hw_lv")
      .outputMode("update").start()
    try {
      def latest(): Map[Long, (Int, Double, Double, Double, Double)] =
        spark.table("hw_lv").collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4), r.getDouble(5)))
          .groupBy(_._1)
          .map { case (k, rs) =>
            val top = rs.maxBy(_._2)
            k -> ((top._2, top._3, top._4, top._5, top._6)) }
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() === batchTwin(b1))
      input.addData(b2: _*)
      q.processAllAvailable()
      // a left fold splits over concatenation: carried state ≡ the
      // batch operator re-run over everything seen so far
      assert(latest() === batchTwin(b1 ++ b2))
      // single-day key sits at the cold-start state
      assert(latest()(2L) === ((1, 5.0, 0.0, 0.0, 5.0)))
    } finally q.stop()
  }

  test("bootstrapReplicateMeans: streamed replicate state equals the " +
      "batch stage in ANY arrival order") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val b1 = (1L to 60L).map(i => MetricEvent(i, (i % 9).toDouble + 0.25))
    // second batch arrives OUT of id order: weights depend only on
    // (id, replicate), so order cannot matter (stronger than the
    // fold twins' in-order contract)
    val b2 = (120L to 61L by -1).map(i => MetricEvent(i, (i % 7).toDouble))
    def batchStage(ds: Seq[MetricEvent]): Map[Int, (Long, Option[Double])] =
      graft.operators.Analytics.bootstrapReplicateMeans(
          ds.toDF("id", "x"), replicates = 16)
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val input = MemoryStream[MetricEvent]
    val q = Streams.bootstrapReplicateMeans(input.toDS(), replicates = 16)
      .writeStream.format("memory").queryName("boot_reps")
      .outputMode("update").start()
    try {
      def latest(): Map[Int, (Long, Option[Double])] =
        spark.table("boot_reps").collect()
          .map(r => (r.getInt(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2))))
          .groupBy(_._1)
          .map { case (k, rs) =>
            val top = rs.maxBy(_._2)
            k -> ((top._2, top._3)) }
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() === batchStage(b1))
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(latest() === batchStage(b1 ++ b2))
      assert(latest().size === 16)
    } finally q.stop()
  }
}
