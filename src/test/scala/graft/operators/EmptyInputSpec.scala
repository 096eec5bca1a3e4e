package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Every operator must degrade to an empty (or cleanly-failing) result on
  * empty input — the shape a filtered-to-nothing partition produces in a
  * real pipeline. */
class EmptyInputSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("empty-input-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def emptyDocs: DataFrame =
    spark.createDataFrame(Seq.empty[(Long, String)]).toDF("doc_id", "text")
  private def emptyEvents: DataFrame =
    spark.createDataFrame(Seq.empty[(Long, java.sql.Timestamp, Double)])
      .toDF("user_id", "ts", "value")
  private def emptyVecs: DataFrame =
    spark.createDataFrame(Seq.empty[(Long, Array[Float])]).toDF("vec_id", "embedding")

  test("round-9 data-selection and retrieval operators on empty input") {
    // a non-empty target with an empty raw pool, and vice versa
    val sp = spark; import sp.implicits._
    val target = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(TextAnalysis.dsirWeights(emptyDocs, target, "doc_id", "text").count() == 0)
    assert(TextAnalysis.dsirResample(emptyDocs, target, "doc_id", "text", 5).count() == 0)
    // empty target: every raw term is OOV — weights still compute
    assert(TextAnalysis.dsirWeights(target, emptyDocs, "doc_id", "text").count() == 1)
    assert(TextAnalysis.perplexityBuckets(
      emptyDocs.withColumn("lang", lit("en")), "doc_id", "text", "lang").count() == 0)
    assert(TextAnalysis.temperatureSample(
      emptyDocs.withColumn("source", lit("s")), "source", "doc_id", 0.5, 10L).count() == 0)
    val emptyRanking = spark.createDataFrame(Seq.empty[(Long, Int, Long)])
      .toDF("query_id", "rank", "doc_id")
    assert(TextAnalysis.rrfFuse(Seq(emptyRanking), 5).count() == 0)
    assert(TextAnalysis.zipfFit(emptyDocs, "text").collect().head.getInt(0) == 0)
    assert(Dedup.dedupSurvivors(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.dedupSurvivorsBy(emptyDocs.withColumn("n_chars", lit(0L)),
      "doc_id", "text", "n_chars").count() == 0)
    val (mdl, wOov) = TextAnalysis.dsirModel(emptyDocs, target, "text")
    assert(TextAnalysis.dsirScore(emptyDocs, "doc_id", "text", mdl, wOov).count() == 0)
    assert(TextAnalysis.decontamFilter(emptyDocs, target, "doc_id", "text", 0.2)
      .count() == 0)
    // an empty TEST side flags nothing: the whole train side survives
    assert(TextAnalysis.decontamFilter(target, emptyDocs, "doc_id", "text", 0.2)
      .count() == 1)
    assert(Dedup.topDuplicatedGrams(emptyDocs, "doc_id", "text", 12, 5).count() == 0)
    val emptyMedia = sp.emptyDataset[MediaRecord]
    assert(Multimodal.pcm16FrameFeatures(emptyMedia, 8, 6).count() == 0)
  }

  test("dedup operators on an empty corpus") {
    assert(Dedup.exactGroups(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.minhashCandidates(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simhashKernel(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.duplicateClusters(
      spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("id1", "id2")).count() == 0)
  }

  test("temporal operators on empty inputs") {
    assert(TemporalJoins.sessionize(emptyEvents, "user_id", "ts", 600L).count() == 0)
    val r = emptyEvents.select(col("user_id"), col("ts").as("p_ts"),
      col("value").as("amount"))
    assert(TemporalJoins.range(emptyEvents, r, "user_id", "ts", "p_ts", 0L, 60L)
      .count() == 0)
    assert(TemporalJoins.asOf(emptyEvents, r, "user_id", "ts", "p_ts",
      Seq("amount")).count() == 0)
  }

  test("similarity operators on an empty corpus") {
    assert(Similarity.cosinePairsExact(emptyVecs, "vec_id", "embedding", 0.0).count() == 0)
    assert(Similarity.knnKernel(emptyVecs, emptyVecs, 5).count() == 0)
    assert(Similarity.annKnnKernel(emptyVecs, emptyVecs, 5).count() == 0)
    assert(Similarity.annKnn(emptyVecs, emptyVecs, 5).count() == 0)
    assert(Graph.triangleCounts(
      spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("src", "dst"),
      "src", "dst").count() == 0)
    // kmeans cannot produce a codebook from nothing — must fail loud
    val err = intercept[IllegalArgumentException] {
      Similarity.kmeansCodebook(emptyVecs, "vec_id", "embedding", k = 2)
    }
    assert(err.getMessage.contains("empty"))
    // semantic dedup needs a codebook too: empty corpus fails loud, like ivfKnn
    val err2 = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(emptyVecs, "vec_id", "embedding", 0.5)
    }
    assert(err2.getMessage.contains("centroid"))
  }

  test("text operators and the top-k aggregator on empty input") {
    assert(TextAnalysis.withQuality(emptyDocs, "text").count() == 0)
    assert(TextAnalysis.repetitionStats(emptyDocs, "doc_id", "text").count() == 0)
    assert(emptyDocs
      .select(posexplode(TextAnalysis.chunkWindows(
        TextAnalysis.tokens(col("text")), 32, 24))).count() == 0)
    val topk = udaf(graft.functions.Aggregators.topK(3))
    assert(emptyDocs.groupBy(col("doc_id"))
      .agg(topk(lit(1.0), col("doc_id")).as("t")).count() == 0)
  }

  test("round-8 operators on empty input") {
    // retrieval / quality / fingerprint / tokenizer family
    assert(TextAnalysis.bm25TopK(emptyDocs, emptyDocs.limit(0),
      "doc_id", "text", "doc_id", "text", k = 3).count() == 0)
    assert(TextAnalysis.gopherQuality(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.winnowFingerprints(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.bpeMerges(emptyDocs, "text", nMerges = 5).count() == 0)
    assert(TextAnalysis.bpeEncodeCounts(emptyDocs, "doc_id", "text",
      Seq(("a", "b"))).count() == 0)
    // graph peeling
    assert(Graph.kCore(
      spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("src", "dst"),
      "src", "dst", k = 2, rounds = 3).count() == 0)
    // IVF-SQ8: empty corpus cannot yield centroids — fail loud like ivfKnn
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfSq8Knn(emptyVecs, emptyVecs, 3).count()
    }
    assert(err.getMessage.contains("centroid"))
  }

  test("round-10 operators on empty input") {
    val sp = spark
    import sp.implicits._
    assert(TextAnalysis.bpeMergesBatched(emptyDocs, "text",
      rounds = 3, batch = 8).count() == 0)
    assert(TextAnalysis.contaminationPairs(emptyDocs, emptyDocs,
      "doc_id", "text", tau = 0.2, ngram = 8, maxDf = 2).count() == 0)
    assert(graft.streaming.Streams.decontamScreen(emptyDocs, emptyDocs,
      "doc_id", "text", tau = 0.2).count() == 0)
    // random projection: empty corpus yields no neighbors; empty query
    // side yields no rows either
    val vecs = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.rpKnn(emptyVecs, vecs, 3, dims = 2).count() == 0)
    assert(Similarity.rpKnn(vecs, emptyVecs, 3, dims = 2).count() == 0)
    // label family: empty corpus -> no predictions, nothing audited
    val lv = Seq((1L, Array(1.0f, 2.0f), 0)).toDF("vec_id", "embedding", "label")
    val emptyLv = lv.limit(0)
    assert(Labels.knnClassify(emptyLv, lv, 3).count() == 0)
    assert(Labels.knnLabelAudit(lv, emptyLv, 3).count() == 0)
  }

  test("round-9 operators on empty input") {
    val sp = spark
    import sp.implicits._
    // cleaning family
    assert(Cleaning.lineDedup(emptyDocs, "doc_id", "text").count() == 0)
    assert(Cleaning.piiRedact(emptyDocs, "doc_id", "text").count() == 0)
    assert(Cleaning.c4LineFilter(emptyDocs, "doc_id", "text").count() == 0)
    // screened exact spans: empty corpus AND empty candidate set
    assert(Dedup.duplicateSpansCandidates(emptyDocs, "doc_id", "text",
      k = 8, minLen = 16).count() == 0)
    assert(Dedup.duplicateSpansWithin(emptyDocs,
      Seq.empty[(Long, Long)].toDF("id1", "id2"), "doc_id", "text",
      k = 8, minLen = 16).count() == 0)
    // image family
    val emptyMedia = Seq.empty[MediaRecord].toDS()
    assert(Multimodal.imageDHash(emptyMedia).count() == 0)
    assert(Multimodal.imageNearDupPairs(emptyMedia).count() == 0)
    // index append over an empty corpus is the identity
    val cents = Array((0L, Array(1.0f, 0.0f)))
    val bounds = (Array(0.0, 0.0), Array(1.0, 1.0))
    val idx = Similarity.ivfSq8Index(
      Seq((1L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding"), cents, bounds)
    assert(Similarity.updateIvfSq8Index(emptyVecs, idx, cents, bounds).count() == 1)
  }

  test("third-session round-9 operators on empty input") {
    val sp = spark
    import sp.implicits._
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.labelPropagation(emptyEdges, "src", "dst").count() == 0)
    // binary ANN: empty corpus yields no neighbors; empty QUERY side too
    val vecs = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    assert(Similarity.binaryKnn(emptyVecs, vecs, 3).count() == 0)
    assert(Similarity.binaryKnn(vecs, emptyVecs, 3).count() == 0)
    assert(Similarity.binarySignatures(emptyVecs, "vec_id", "embedding").count() == 0)
    // fuzzy join on nothing, and on one string (no pairs possible)
    val emptyNames = Seq.empty[(Long, String)].toDF("id", "s")
    assert(Dedup.editDistancePairs(emptyNames, "id", "s").count() == 0)
    assert(Dedup.editDistancePairs(
      Seq((1L, "solo")).toDF("id", "s"), "id", "s").count() == 0)
    // classifier: empty corpus cannot train (fails loudly, not wrong);
    // scoring an empty corpus under real weights yields no rows
    val lbl = Seq((1L, "good stuff", 1.0), (2L, "bad stuff", 0.0))
      .toDF("doc_id", "text", "y")
    val err = intercept[IllegalArgumentException] {
      Classifier.trainTextClassifier(
        emptyDocs.withColumn("y", lit(0.0)), "doc_id", "text", "y")
    }
    assert(err.getMessage.contains("empty"))
    val w = Classifier.trainTextClassifier(lbl, "doc_id", "text", "y", rounds = 1)
    assert(Classifier.scoreTextClassifier(emptyDocs, "doc_id", "text", w).count() == 0)
  }

  test("fourth-session round-9 operators on empty input") {
    val sp = spark
    import sp.implicits._
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    // HITS on no edges: no nodes, no scores — and the per-round max
    // observation must tolerate the empty aggregate
    assert(Graph.hits(emptyEdges, "src", "dst", iterations = 2).count() == 0)
    // an all-zero bloom bitset (no insertions) can contain nothing
    val agg = Layout.bloomAgg(10, 3)
    assert(!Layout.bloomMightContain(agg.zero.toSeq, "anything", 10, 3))
    // null values never set bits
    assert(agg.reduce(agg.zero, null).forall(_ == 0L))
  }

  test("round-10 second-session operators on empty input") {
    val sp = spark
    import sp.implicits._
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val emptyWeighted = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(Graph.adamicAdar(emptyEdges, "src", "dst").count() == 0)
    // SSSP from a source with no edges: the source itself at distance 0
    val sOnly = Graph.ssspBellmanFord(emptyWeighted, "src", "dst", "w",
      source = 7L, rounds = 2).collect()
    assert(sOnly.length == 1 && sOnly.head.getLong(0) == 7L
      && sOnly.head.getLong(1) == 0L)
    assert(Similarity.mmrRerank(emptyVecs, emptyVecs, k = 2, nCandidates = 3)
      .count() == 0)
    // empty corpus with live queries: no candidates, no picks
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.mmrRerank(q, emptyVecs, k = 2, nCandidates = 3).count() == 0)
    assert(Cleaning.blocklistScreen(emptyDocs, "doc_id", "text",
      Seq("x")).count() == 0)
    assert(Dedup.prefixJaccardPairs(emptyDocs, "doc_id", "text", 0.5).count() == 0)
    assert(TextAnalysis.textRankKeywords(emptyDocs, "doc_id", "text").count() == 0)
    val emptyMedia = sp.createDataset(Seq.empty[MediaRecord])
    assert(Multimodal.byteHistogram(emptyMedia).count() == 0)
    assert(Dedup.normalizedExactGroups(emptyDocs, "text", "doc_id").count() == 0)
    assert(TextAnalysis.knBigramLogProb(emptyDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.knTrigramLogProb(emptyDocs, "doc_id", "text").count() == 0)
    assert(Analytics.rollingMadAnomalies(emptyEvents, "user_id", "ts").count() == 0)
    assert(Analytics.symbolicMotifs(emptyEvents, "user_id", "ts").count() == 0)
    assert(Analytics.cusumChangepoints(emptyEvents, "user_id", "ts").count() == 0)
    // empty reference: current rows are unbinnable; PSI degrades to the
    // all-zero-count bins, never a throw
    val psiEmpty = Analytics.psiDrift(emptyEvents, emptyEvents, "value")
      .collect()
    assert(psiEmpty.length == 10 &&
      psiEmpty.forall(r => r.getLong(1) == 0L && r.getDouble(5) == 0.0))
    // empty edge set: the three landmarks still report themselves at 0
    val ms = Graph.multiSourceSssp(emptyWeighted, "src", "dst", "w",
      Seq(1L, 2L).toDF("source"), rounds = 2).collect()
    assert(ms.length == 2 && ms.forall(r => r.getLong(2) == 0L))
    assert(Graph.temporalEarliestArrival(emptyWeighted.toDF("src", "dst", "tm"),
      "src", "dst", "tm", source = 5L, startTime = 7L, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((5L, 7L)))
    // empty labeling + edges: update degrades to a fresh clustering
    val emptyLabels = Seq.empty[(Long, Long)].toDF("node", "component")
    assert(Graph.updateConnectedComponents(emptyLabels,
      Seq((1L, 2L)).toDF("src", "dst"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 1L)))
  }

  test("round-11 operators on empty input") {
    val sp = spark
    import sp.implicits._
    // NSW: an empty corpus has no sampled centroid — the build fails
    // loudly instead of returning a silently-unsearchable graph
    val exBuild = intercept[IllegalArgumentException] {
      Similarity.nswGraph(emptyVecs)
    }
    assert(exBuild.getMessage.contains("centroid"))
    // a live graph with zero QUERIES returns an empty result cleanly
    val e = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (50L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val g = Similarity.nswGraph(e, m = 2)
    assert(Similarity.nswKnn(emptyVecs, e, g, 2, beam = 2, rounds = 1)
      .count() == 0)
    // a live query over an EMPTY graph frame degrades to the entry layer
    val emptyGraph = Seq.empty[(Long, Long)].toDF("node_id", "nbr_id")
    val q = Seq((9L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.nswKnnOn(q, e, emptyGraph,
      e.select($"vec_id".as("node_id")), 2, beam = 2, rounds = 2).count() == 2)
    // mixture: empty corpus selects nothing; weights covering no source
    // likewise
    assert(TextAnalysis.mixtureByTokenBudget(
      emptyDocs.withColumn("lang", lit("en")), "doc_id", "lang", "text",
      Map("en" -> 1.0), 100L).count() == 0)
    // media triage: empty stream of assets, and one hostile blob that
    // must become a dead-letter row, not an exception
    val emptyMedia = sp.createDataset(Seq.empty[MediaRecord])
    assert(Multimodal.triageFeatures(emptyMedia).count() == 0)
    // the full 8-byte PNG magic followed by garbage: sniffed as PNG,
    // rejected by the codec (a magic-less blob passes through undecoded)
    val hostile = sp.createDataset(Seq(MediaRecord(1L, "image",
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
        ++ "garbage".getBytes("ISO-8859-1"))))
    val rows = Multimodal.triageFeatures(hostile).collect()
    assert(rows.length == 1 && !rows.head.decode_ok)
    // JPEG decoder: empty and truncated streams fail as decode errors
    assert(intercept[IllegalArgumentException] {
      Jpeg.decode(Array.emptyByteArray)
    }.getMessage.nonEmpty)
    // salted join: empty fact, and an empty dim, both yield zero rows
    val emptyFact = Seq.empty[(String, Long)].toDF("k", "id")
    val dim = Seq(("a", 1L)).toDF("k", "payload")
    assert(SkewJoins.saltedEquiJoin(emptyFact, dim, "k", 4, $"id").count() == 0)
    val fact = Seq(("a", 1L)).toDF("k", "id")
    val emptyDim = Seq.empty[(String, Long)].toDF("k", "payload")
    assert(SkewJoins.saltedEquiJoin(fact, emptyDim, "k", 4, $"id").count() == 0)
    // louvain: an empty edge list yields an empty labeling; a graph of
    // pure self-loops likewise (they are filtered, leaving no nodes)
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.louvainMove(emptyEdges, "src", "dst", rounds = 2).count() == 0)
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    assert(Graph.louvainMove(loops, "src", "dst", rounds = 2).count() == 0)
    assert(Graph.louvainTwoPass(emptyEdges, "src", "dst").count() == 0)
    assert(Graph.louvainTwoPass(loops, "src", "dst").count() == 0)
    // conductance: no edges -> no communities to gauge
    val emptyLab = Seq.empty[(Long, Long)].toDF("node", "label")
    assert(Graph.conductance(emptyEdges, "src", "dst", emptyLab).count() == 0)
    // random walks: no edges, no walkers (first- and second-order)
    assert(Graph.randomWalks(emptyEdges, "src", "dst").count() == 0)
    assert(Graph.node2vecWalks(emptyEdges, "src", "dst").count() == 0)
    // hnsw: a corpus with no centroid-divisible id fails LOUDLY (the
    // nswGraph contract), and an empty query set returns no rows
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(intercept[IllegalArgumentException] {
      Similarity.hnswKnn(vecs, vecs, 1, centEvery = 50)
    }.getMessage.contains("centroid"))
    val withZero = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.hnswKnn(withZero.filter($"vec_id" < 0), withZero, 1,
      m = 2, beam = 2, roundsPerLayer = 1, maxLevel = 1).count() == 0)
  }

  test("round-11 fourth-session operators on empty input") {
    val sp = spark
    import sp.implicits._
    // betweenness: no edges -> nothing reached beyond the sources
    // themselves (self rows are excluded per Brandes); no sources ->
    // no traversal at all; self-loops are filtered like empty edges
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val srcs = Seq(0L).toDF("source")
    assert(Graph.betweenness(emptyEdges, "src", "dst", srcs, 2).count() == 0)
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val emptySrcs = Seq.empty[Long].toDF("source")
    assert(Graph.betweenness(edges, "src", "dst", emptySrcs, 2).count() == 0)
    val loops = Seq((1L, 1L)).toDF("src", "dst")
    assert(Graph.betweenness(loops, "src", "dst", srcs, 2).count() == 0)
    // hyperball: no edges (or only self-loops) -> no nodes, no sketches
    assert(Graph.hyperBallReach(emptyEdges, "src", "dst", 2).count() == 0)
    assert(Graph.hyperBallReach(loops, "src", "dst", 2).count() == 0)
    // harmonic centrality: empty edges or empty sources -> empty
    assert(Graph.harmonicCentrality(emptyEdges, "src", "dst", srcs, 2)
      .count() == 0)
    assert(Graph.harmonicCentrality(edges, "src", "dst", emptySrcs, 2)
      .count() == 0)
    // neighborhood function: no nodes -> no radii rows at all
    assert(Graph.neighborhoodFunction(emptyEdges, "src", "dst", 2)
      .count() == 0)
    // luby MIS: no edges (or only self-loops) -> empty set
    assert(Graph.lubyMis(emptyEdges, "src", "dst", 2).count() == 0)
    assert(Graph.lubyMis(loops, "src", "dst", 2).count() == 0)
    // global graph stats degrade to ONE row with NULL statistic —
    // a report query downstream still gets its row
    val pl = Graph.powerLawAlpha(emptyEdges, "src", "dst").collect()
    assert(pl.length == 1 && pl.head.getLong(0) == 0L && pl.head.isNullAt(2))
    val as = Graph.degreeAssortativity(emptyEdges, "src", "dst").collect()
    assert(as.length == 1 && as.head.getLong(0) == 0L && as.head.isNullAt(1))
    val cc = Graph.clusteringCoefficients(emptyEdges, "src", "dst").collect()
    assert(cc.length == 1 && cc.head.getLong(0) == 0L && cc.head.isNullAt(4))
    // co-occurrence: empty baskets and all-singleton baskets yield no pairs
    val emptyBaskets = Seq.empty[(Long, Long)].toDF("bk", "it")
    assert(Analytics.cooccurrenceCosine(emptyBaskets, "bk", "it").count() == 0)
    val singletons = Seq((1L, 10L), (2L, 20L)).toDF("bk", "it")
    assert(Analytics.cooccurrenceCosine(singletons, "bk", "it").count() == 0)
    // robust scores: empty frame stays empty (no phantom stats row)
    val emptyVals = Seq.empty[(String, Double)].toDF("grp", "x")
    assert(Analytics.robustScores(emptyVals, "grp", "x").count() == 0)
    // dedup impact: no clusters -> no report rows
    val someDocs = Seq((1L, "text")).toDF("doc_id", "text")
    val noClusters = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    assert(Dedup.dedupImpact(someDocs, "doc_id", "text", noClusters)
      .count() == 0)
    // contamination spans: an empty corpus on either side finds nothing
    assert(Dedup.contaminationSpans(emptyDocs, someDocs, "doc_id", "text",
      k = 2, minLen = 2).count() == 0)
    assert(Dedup.contaminationSpans(someDocs, emptyDocs, "doc_id", "text",
      k = 2, minLen = 2).count() == 0)
    // PCM normalize: zero assets, and a zero-sample asset
    val emptyMedia2 = sp.createDataset(Seq.empty[MediaRecord])
    assert(Multimodal.pcm16Normalize(emptyMedia2, 30000).count() == 0)
    val noSamples = sp.createDataset(Seq(
      MediaRecord(1L, "audio/pcm", Array.emptyByteArray)))
    val z = Multimodal.pcm16Normalize(noSamples, 30000).collect().head
    assert(z.getInt(1) == 0 && z.getLong(4) == 0L)
    // stored HNSW: an empty corpus has no centroid-divisible id — the
    // write fails LOUDLY (the nswGraph contract) and leaves no layout
    val emptyV = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-hnsw").toString
    assert(intercept[IllegalArgumentException] {
      Similarity.writeHnswIndex(emptyV, s"$tmp/idx", numFiles = 2)
    }.getMessage.contains("centroid"))
    // a real stored index with zero queries serves zero rows cleanly
    val vecs = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    Similarity.writeHnswIndex(vecs, s"$tmp/ok", numFiles = 2, m = 2,
      levelBase = 4, maxLevel = 1)
    assert(Similarity.hnswKnnStored(vecs.filter($"vec_id" < 0), vecs,
      s"$tmp/ok", 1, beam = 2, roundsPerLayer = 1, baseRounds = 1,
      maxLevel = 1).count() == 0)
  }

  test("round-12 operators on empty input") {
    // unigram-LM training: no documents -> empty vocabulary, no
    // division-by-zero from the empty normalizer
    assert(TextAnalysis.unigramLmVocab(emptyDocs, "text").count() == 0)
    // all-null / token-free text degrades the same way
    val sp = spark; import sp.implicits._
    val blank = Seq((1L, ""), (2L, "!!! ???")).toDF("doc_id", "text")
    assert(TextAnalysis.unigramLmVocab(blank, "text").count() == 0)
    // encode: empty docs -> empty; a real vocab over empty docs -> empty;
    // an EMPTY vocab still encodes via the per-char fallback
    val vocab = Seq(("a", -1.0), ("b", -2.0)).toDF("piece", "logp")
    assert(TextAnalysis.unigramEncodeCounts(emptyDocs, "doc_id", "text",
      vocab).count() == 0)
    assert(TextAnalysis.unigramEncodeCounts(blank, "doc_id", "text",
      vocab).count() == 0)
    val emptyVocab = Seq.empty[(String, Double)].toDF("piece", "logp")
    val one = TextAnalysis.unigramEncodeCounts(
      Seq((1L, "ab cd")).toDF("doc_id", "text"), "doc_id", "text",
      emptyVocab).collect()
    assert(one.length == 1 && one.head.getLong(1) == 2L &&
      one.head.getLong(2) == 4L)
  }

  test("round-12 time-series, chunking, and graph additions on empty input") {
    val sp = spark; import sp.implicits._
    val emptyEdges = spark.createDataFrame(Seq.empty[(Long, Long)])
      .toDF("src", "dst")
    assert(Graph.katzCentrality(emptyEdges, "src", "dst",
      iterations = 3).count() == 0)
    // no nodes -> no radius ever reaches the (null) horizon; the single
    // agg row carries nulls rather than inventing a diameter
    val ed = Graph.effectiveDiameter(emptyEdges, "src", "dst", rounds = 2)
      .collect()
    assert(ed.length == 1 && ed.head.isNullAt(0))
    assert(Analytics.gapFillDaily(emptyEvents, "user_id", "ts", "value")
      .count() == 0)
    val emptyIdEvents = spark
      .createDataFrame(Seq.empty[(Long, Long, java.sql.Timestamp, Double)])
      .toDF("user_id", "event_id", "ts", "value")
    assert(Analytics.ewma(emptyIdEvents, "user_id", "ts", "event_id",
      "value").count() == 0)
    assert(Analytics.holtLinear(emptyIdEvents, "user_id", "ts", "event_id",
      "value").count() == 0)
    assert(TextAnalysis.cdcChunks(emptyDocs, "doc_id", "text").count() == 0)
    // token-free text produces no chunks (not a zero-token chunk)
    val blank = Seq((1L, "!!!"), (2L, "real words here"))
      .toDF("doc_id", "text")
    val ch = TextAnalysis.cdcChunks(blank, "doc_id", "text").collect()
    assert(ch.nonEmpty && ch.forall(_.getLong(0) == 2L))
  }

  test("round-13 operators on empty input") {
    val sp = spark
    import sp.implicits._
    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val emptyW = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "wt")
    // MSF on no edges: empty forest, stable schema
    assert(Graph.minimumSpanningForest(emptyW, "src", "dst", "wt", 2)
      .count() == 0)
    // token-free corpus: empty shard table (not an NPE'd cap)
    assert(TextAnalysis.shardByTokens(emptyDocs, "doc_id", "text", 4)
      .count() == 0)
    assert(TextAnalysis.shardByTokens(
      Seq((1L, "!!!")).toDF("doc_id", "text"), "doc_id", "text", 4)
      .count() == 0)
    // vocab growth / Heaps on nothing: empty curve, one NULL-fit row
    assert(TextAnalysis.vocabGrowth(emptyDocs, "doc_id", "text")
      .count() == 0)
    val hf = TextAnalysis.heapsLawFit(emptyDocs, "doc_id", "text")
      .collect()
    assert(hf.length == 1 && hf.head.getLong(0) == 0L &&
      hf.head.isNullAt(3))
    // DDSketch: no registers, and quantiles over none is empty
    val emptyVals = Seq.empty[(String, Double)].toDF("g", "x")
    val regs = Analytics.ddsketchRegisters(emptyVals, "g", "x")
    assert(regs.count() == 0)
    assert(Analytics.ddsketchQuantiles(regs, Seq(0.5)).count() == 0)
    // k-anonymity over nothing: no classes
    assert(Cleaning.kAnonymityAudit(
      Seq.empty[(String, Long)].toDF("q", "u"), Seq("q"), "u", 2)
      .count() == 0)
    // calibration / group-rate audits over nothing: no bins / groups
    val emptyScored = Seq.empty[(Double, Double)].toDF("score", "y")
    assert(Classifier.calibrationTable(emptyScored, "score", "y")
      .count() == 0)
    assert(Classifier.groupRateAudit(
      Seq.empty[(String, Boolean)].toDF("g", "p"), "g", "p").count() == 0)
    // one-row contracts (srmCheck, abTestPowerMde) are asserted in
    // their own specs; mu-law roundtrip over no assets is empty
    val noMedia = sp.emptyDataset[MediaRecord]
    assert(Multimodal.pcm16MulawRoundtrip(noMedia).count() == 0)
  }
}
