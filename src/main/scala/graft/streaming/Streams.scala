package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A single stream event (the streaming face of the `events` table). */
final case class StreamEvent(user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** One open-session accumulator. */
final case class SessionState(startUs: Long, lastUs: Long, n: Int, sumValue: Double)

/** All of a key's not-yet-final sessions, kept in the state store. More
  * than one can be open at a time: a session is only FINAL once the
  * watermark passes its end + gap — an in-batch gap is not enough, since
  * a still-admissible out-of-order event may yet bridge it. */
final case class OpenSessions(sessions: Seq[SessionState])

/** A closed session emitted downstream. */
final case class SessionOut(
    user_id: Long, start: Timestamp, end: Timestamp, n_events: Int, sum_value: Double)

/** One identified stream event for order-sensitive folds ([[Streams.ewmaLevels]]):
  * `(ts, event_id)` must totally order a key's points. */
final case class EwmaEvent(user_id: Long, event_id: Long, ts: Timestamp, value: Double)

/** A key's carried EWMA state: points seen + current level. */
final case class EwmaState(n: Int, y: Double)

/** The per-key level emitted each micro-batch (Update mode). */
final case class EwmaLevel(user_id: Long, n_points: Int, ewma: Double)

/** One closed daily count for [[Streams.hampelAnomalies]] — the shape an
  * upstream watermarked daily aggregation emits in Append mode. */
final case class DailyCount(user_id: Long, day: java.sql.Date, n_events: Long)

/** A key's carried Hampel state: the trailing window of daily counts
  * (most recent last), never longer than 2·halfWindow + 1. */
final case class HampelState(counts: Seq[Long])

/** One scored day: the trailing-window robust stats and the flag. */
final case class HampelOut(user_id: Long, day: java.sql.Date, n_events: Long,
    med: Double, mad: Double, is_anomaly: Boolean)

/** A key's carried CUSUM state ([[Streams.cusumLevels]]). */
final case class CusumState(n: Int, sPos: Double, sNeg: Double,
    maxPos: Double, maxNeg: Double, alarms: Long)

/** The per-key CUSUM summary emitted each micro-batch (Update mode) —
  * the same shape [[graft.operators.Analytics.cusumChangepoints]] emits. */
final case class CusumLevel(user_id: Long, n_days: Int, mean_daily: Double,
    max_cusum_pos: Double, max_cusum_neg: Double, n_alarms: Long)

/** One metric observation for the streaming bootstrap
  * ([[Streams.bootstrapReplicateMeans]]). */
final case class MetricEvent(event_id: Long, value: Double)

/** A replicate's carried bootstrap state: the exact DECIMAL weighted
  * sum (scale 12, the batch addend quantization) and the drawn
  * weight total. */
final case class BootState(sum: java.math.BigDecimal, wsum: Long)

/** The per-replicate bootstrap mean emitted each micro-batch (Update
  * mode): the [[graft.operators.Analytics]] replicate-stage shape. */
final case class BootRep(b: Int, w_sum: Long, m: Option[Double])

/** A key's carried Holt–Winters state ([[Streams.holtWintersLevels]]):
  * level, trend, and the `period`-slot rotating seasonal register
  * (next slot to consume first). */
final case class HwState(n: Int, level: Double, trend: Double,
    seasons: Seq[Double])

/** The per-key Holt–Winters summary emitted each micro-batch (Update
  * mode) — the [[graft.operators.Analytics.holtWinters]] output shape. */
final case class HwLevel(user_id: Long, n_days: Int, level: Double,
    trend: Double, season_next: Double, forecast: Double)

/** Structured Streaming operators: the batch engine's aggregation /
  * sessionization semantics re-expressed as readStream → transform →
  * writeStream pipelines. State is bounded by watermarks (windowed aggs)
  * or explicit event-time timeouts (sessionization) — both prerequisites
  * for an unbounded 100 TB/day stream.
  */
object Streams {

  /** Watermarked tumbling-window aggregation: the streaming twin of
    * q17_date_agg. Late data beyond `watermark` is dropped; state for
    * closed windows is evicted automatically. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      typeCol: String = "event_type",
      valueCol: String = "value",
      windowDuration: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration).as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(typeCol), col("n"), col("sum_value"))

  /** Watermarked stream-stream interval join (the streaming twin of
    * TemporalJoins.range): pairs left/right events with equal keys where
    * `right.ts ∈ [left.ts, left.ts + windowSec]`. Both sides carry
    * watermarks so the join state for expired intervals is evicted —
    * without them a stream-stream join buffers forever. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      key: String, windowSec: Long,
      tsCol: String = "ts",
      watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).as("l")
    val r = right.withWatermark(tsCol, watermark).as("r")
    // outer variants emit the null-padded row only once the watermark
    // proves no in-window partner can still arrive — supported because
    // the condition bounds the join time range on both sides
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $windowSec SECONDS"),
      joinType)
  }

  /** Stream-STATIC enrichment join: each micro-batch of the stream joins
    * a static dimension table (no watermark needed — the static side is
    * re-planned per batch, so a broadcast-able dimension broadcasts and
    * the stream never buffers join state). The standard "attach user /
    * product attributes to a click stream" operator; stateless, so any
    * join type the planner allows works unbounded. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String,
      joinType: String = "inner"): DataFrame =
    stream.join(dim, Seq(key), joinType)

  /** Streaming exact dedup (the streaming twin of Dedup.exactGroups):
    * drops re-deliveries of the same key within the watermark horizon —
    * state stays bounded because expired keys are evicted with the
    * watermark. */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Running count-min frequency sketch over an unbounded stream: a
    * streaming GLOBAL aggregation whose state is the sketch buffer
    * itself — `depth × width` longs, key-cardinality-FREE. This is
    * where the sketch's constant-memory claim actually matters: a
    * `groupBy(key).count()` over an unbounded key domain grows state
    * forever, while this aggregation's state store holds one fixed
    * array no matter how many distinct keys flow by (the Aggregator's
    * partial-merge shape works unchanged as streaming update state).
    *
    * Emit with outputMode complete (or update): every trigger produces
    * the one-row sketch over everything seen so far, and
    * [[graft.functions.Sketches.cmEstimate]] applies to it unchanged —
    * same estimator Column, batch or stream. Sizing: see the ε/δ rule
    * at [[graft.functions.Sketches.CMDepth]]. */
  def streamingCountMin(keys: DataFrame, keyCol: String, width: Int,
      depth: Int = graft.functions.Sketches.CMDepth): DataFrame =
    keys.select(col(keyCol).cast("string").as("k"))
      .agg(udaf(graft.functions.Sketches.countMin(width, depth))
        .apply(col("k")).as("sketch"))

  /** Running per-group DISTINCT-count sketch over an unbounded stream:
    * the KMV signature ([[graft.functions.Sketches.kmv]]) as streaming
    * aggregation state — ≤ k longs per group no matter how many
    * distinct values flow by, where a streaming
    * `groupBy(g).approx_count_distinct` or exact distinct would grow
    * state with cardinality. The k-min of a set is insertion-order
    * independent, so the stream state equals the batch signature after
    * any micro-batch slicing (spec-proven), and
    * [[graft.functions.Sketches.kmvEstimate]] /
    * [[graft.functions.Sketches.kmvIntersectEstimate]] apply to the
    * emitted signatures unchanged — including intersecting a LIVE
    * group's signature with a static corpus signature, the streaming
    * "how much does today's traffic overlap yesterday's?" probe. Emit
    * with outputMode complete/update. */
  def streamingKmvDistinct(rows: DataFrame, groupCol: String,
      valueCol: String, k: Int): DataFrame =
    rows.select(col(groupCol).as("grp"),
        col(valueCol).cast("string").as("v"))
      .groupBy(col("grp"))
      .agg(udaf(graft.functions.Sketches.kmv(k)).apply(col("v")).as("sig"))
      .select(col("grp"), col("sig"),
        graft.functions.Sketches.kmvEstimate(col("sig"), k).as("est_distinct"))

  /** Incremental near-dup screen: MinHash-LSH candidates between a
    * STREAM of incoming documents and a static indexed corpus — the "is
    * this newly crawled page a duplicate of anything we already hold?"
    * gate, run per micro-batch instead of re-deduping the corpus.
    *
    * `corpusBands` is the persisted output of
    * [[graft.operators.Dedup.minhashBands]] over the corpus (build
    * once, reuse for every batch). The stream side computes its own
    * bands map-only (signature kernel + posexplode — no aggregation, no
    * watermark needed), and candidates are a stream-static equi-join on
    * `(band, key)`: per batch, work ∝ batch bands × matching buckets,
    * never batch × corpus. Output: `(new_id, corpus_id)` candidate
    * pairs; a pair surfaces once per matching band (bounded by k/r) —
    * `distinct()` downstream per batch if exact multiplicity matters,
    * and verify candidates with an exact Jaccard rerank as in batch
    * LSH. */
  /** Streaming corpus-quality screen: the batch Gopher prose gate
    * ([[graft.operators.TextAnalysis.gopherQuality]]) applied to a
    * document stream and filtered to survivors. The gate is pure
    * stateless Column arithmetic, so the SAME operator runs per
    * micro-batch with no state store, no watermark, and append output —
    * a stream batch-equal to the batch screen by construction (the spec
    * proves it anyway). At 100 TB this is the shape of an ingest-time
    * filter: quality decided the moment a crawl record lands, nothing
    * re-scanned later. */
  def qualityScreen(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Int = 2): DataFrame =
    graft.operators.TextAnalysis.gopherQuality(docs, idCol, textCol,
        minWords, maxWords, minMeanLen, maxMeanLen, minAlphaFrac, minStopHits)
      .filter(col("passes"))

  /** Ingest-time MEDIA TRIAGE screen — the streaming twin of
    * [[graft.operators.Multimodal.triageFeatures]]: decode each binary
    * payload the moment it lands (magic-byte sniffed PNG/JPEG through
    * the real codecs), emit features for good records and
    * `decode_ok=false` dead-letter rows for payloads the codecs
    * reject. Pure stateless map per micro-batch: no state store, no
    * watermark, append output — stream ≡ batch by construction (the
    * spec proves it anyway, malformed payloads included). At 100 TB
    * this is the crawl-ingest shape: triage at landing time, hostile
    * blobs quarantined by the SAME bomb-cap contract the batch path
    * enforces, nothing re-scanned later. */
  def mediaTriageScreen(media: Dataset[graft.operators.MediaRecord],
      codec: graft.operators.MediaCodec = graft.operators.SniffCodec)
      : Dataset[graft.operators.MediaTriageRow] =
    graft.operators.Multimodal.triageFeatures(media, codec)

  /** Ingest-time train/test DECONTAMINATION screen — the streaming twin
    * of [[graft.operators.TextAnalysis.decontamFilter]], completing the
    * family's diagnostic → filter → stream progression (as d10/d11 did
    * for near-dup). The TEST side is a static benchmark suite — bounded
    * by construction (thousands of documents, not billions) AND by the
    * enforced ANN broadcast contract
    * ([[graft.operators.Similarity.MaxBroadcastQueries]] docs, checked
    * loudly) — so its n-gram inverted index is collected once and
    * broadcast; each
    * arriving train document is then decided MAP-ONLY (no state, no
    * watermark, no shuffle): tokenize → distinct n-gram shingles →
    * tally hits per test doc through the broadcast index → drop when
    * any containment |∩| / |test shingles| reaches `tau`. Works
    * identically on batch input, which is how the spec proves
    * stream ≡ batch ≡ `decontamFilter`. (The batch filter's `maxDf`
    * train-side cap is a cross-document corpus statistic and so has no
    * streaming counterpart; the screen is the uncapped semantics.) */
  def decontamScreen(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, tau: Double, ngram: Int = 3): DataFrame = {
    require(tau > 0.0, "tau must be positive (tau <= 0 would drop every document)")
    val sp = test.sparkSession
    import sp.implicits._
    // Same driver-side bound as every ANN kernel
    // ([[graft.operators.Similarity.collectQueryVectors]]): read at most
    // MaxBroadcastQueries + 1 test documents — never a corpus-sized
    // collect — and fail LOUDLY pointing at the distributed batch path.
    val maxTest = graft.operators.Similarity.MaxBroadcastQueries
    val testSets = graft.operators.Dedup
      .shinglePostings(test, idCol, textCol, ngram)
      .groupBy(col("doc_id")).agg(collect_list(col("s")).as("sh"))
      .select(col("sh")).limit(maxTest + 1).as[Seq[String]].collect()
    require(testSets.length <= maxTest,
      s"decontamScreen test set exceeds $maxTest documents; the streaming " +
        "screen broadcasts the test-side inverted index to the driver. For " +
        "corpus-sized test sets use the batch distributed path instead " +
        "(TextAnalysis.decontamFilter, whose postings join shuffles with the data).")
    // shingle -> test-doc ordinals (ordinals keep the broadcast compact;
    // test doc ids never influence the verdict)
    val nTest: Array[Int] = testSets.map(_.size)
    val building = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    for ((sh, ord) <- testSets.zipWithIndex; s <- sh)
      building.computeIfAbsent(s, _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += ord
    val index = new java.util.HashMap[String, Array[Int]](building.size * 2)
    building.forEach((s, ords) => index.put(s, ords.toArray))
    val bIndex = sp.sparkContext.broadcast(index)
    val bN = sp.sparkContext.broadcast(nTest)
    val keep = udf { (text: String) =>
      if (text == null) true
      else {
        val idx = bIndex.value
        val n = bN.value
        val counts = new java.util.HashMap[Int, Int]()
        var contaminated = false
        val it = graft.operators.Dedup.Kernel.shingles(text, ngram).iterator
        while (!contaminated && it.hasNext) {
          val hits = idx.get(it.next())
          if (hits != null) {
            var i = 0
            while (!contaminated && i < hits.length) {
              val ord = hits(i)
              val c = counts.merge(ord, 1, (a, b) => a + b)
              if (c.toDouble / n(ord) >= tau) contaminated = true
              i += 1
            }
          }
        }
        !contaminated
      }
    }
    train.filter(keep(col(textCol)))
  }

  /** Ingest-time unigram TOKENIZE screen — the streaming twin of
    * [[graft.operators.TextAnalysis.unigramEncodeCounts]], completing
    * the tokenizer family's train → encode → stream progression. The
    * trained vocabulary is vocabulary-bounded by construction
    * (singles + vocabMulti pieces), so it is collected once (bounded
    * LOUDLY like every broadcast here) and each arriving document is
    * tokenized MAP-ONLY: the per-word Viterbi runs as a per-record
    * kernel over the broadcast scale-6 BigDecimal log-probs —
    * arithmetic exact and identical to the batch DECIMAL columns, so
    * stream ≡ batch bit-for-bit (the spec pins it, fallbacks
    * included). No state, no watermark, no shuffle before the sink.
    * Output: `(doc_id, n_words, n_pieces)` per arriving doc with ≥ 1
    * token. */
  def unigramEncodeScreen(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 4,
      maxWordLen: Int = 12): DataFrame = {
    require(maxPieceLen >= 1 && maxWordLen >= 1,
      "maxPieceLen and maxWordLen must be positive")
    val sp = vocab.sparkSession
    import sp.implicits._
    val maxVocab = 1 << 21
    val rows = vocab
      .select(col("piece").cast("string"),
        col("logp").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .limit(maxVocab + 1)
      .as[(String, java.math.BigDecimal)].collect()
    require(rows.length <= maxVocab,
      s"unigramEncodeScreen vocab exceeds $maxVocab pieces; the screen " +
        "broadcasts the vocabulary — use the batch distributed path " +
        "(TextAnalysis.unigramEncodeCounts) for corpus-sized vocabularies.")
    val lp = new java.util.HashMap[String, java.math.BigDecimal](rows.length * 2)
    rows.foreach { case (p, l) => if (p != null && l != null) lp.put(p, l) }
    val bLp = sp.sparkContext.broadcast(lp)
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val dict = bLp.value
        it.flatMap { case (id, text) =>
          val ws = graft.operators.Dedup.Kernel.tokens(text)
          if (ws.isEmpty) Iterator.empty
          else {
            // memoize per record: crawl docs repeat words heavily
            val memo = new java.util.HashMap[String, java.lang.Long]()
            var np = 0L
            var i = 0
            while (i < ws.length) {
              val w = ws(i)
              var n = memo.get(w)
              if (n == null) {
                n = java.lang.Long.valueOf(
                  graft.operators.TextAnalysis.unigramNpKernel(
                    w, dict, maxPieceLen, maxWordLen))
                memo.put(w, n)
              }
              np += n.longValue()
              i += 1
            }
            Iterator.single((id, ws.length.toLong, np))
          }
        }
      }.toDF("doc_id", "n_words", "n_pieces")
  }

  /** Streaming HyperLogLog sink: each micro-batch's values fold into a
    * persistent per-group register table
    * ([[graft.operators.Analytics.hllRegisters]] ∪ max-merge), so the
    * stored state answers "distinct ids seen EVER, per group" in
    * O(groups · 2^p) bytes no matter how long the stream runs — the
    * streaming cardinality profile exact distinct-count state cannot
    * give. Register max-merge is IDEMPOTENT and commutative, so a
    * replayed micro-batch (crash between write and checkpoint commit)
    * re-merges harmlessly — the sink needs no dedup bookkeeping, just
    * versioned writes: state lands at `statePath/v-<batchId>` (parquet
    * `_SUCCESS` is the commit marker), readers take the highest
    * committed version, and older versions are pruned to a depth of 2.
    * Read with [[hllState]] / estimate with [[hllStateEstimate]]. */
  def hllRegisterSink(stream: DataFrame, statePath: String,
      checkpointPath: String, groupCol: String, valueCol: String,
      p: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val fresh = graft.operators.Analytics
          .hllRegisters(batch, groupCol, valueCol, p)
        val merged = hllState(sp, statePath).fold(fresh)(cur =>
          graft.operators.Analytics.hllMergeRegisters(cur, fresh, groupCol))
        val root = new org.apache.hadoop.fs.Path(statePath)
        val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
        // register tables are (groups × 2^p)-sized: one file is right
        merged.coalesce(1).write.mode("overwrite")
          .parquet(s"$statePath/v-$batchId")
        hllVersions(fs, root).dropRight(2).foreach { old =>
          fs.delete(new org.apache.hadoop.fs.Path(root, s"v-$old"), true); ()
        }
        ()
      }
      .start()

  private def hllVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v-"))
      .flatMap(s => scala.util.Try(s.getPath.getName.stripPrefix("v-").toLong).toOption)
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(root,
        s"v-$v/_SUCCESS")))
      .sorted

  /** Latest committed register table of a [[hllRegisterSink]], if any. */
  def hllState(sp: org.apache.spark.sql.SparkSession,
      statePath: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
    hllVersions(fs, root).lastOption.map(v =>
      sp.read.parquet(s"$statePath/v-$v"))
  }

  /** Per-group distinct-count estimate over a [[hllRegisterSink]]'s
    * stored registers ([[graft.operators.Analytics.hllEstimate]]);
    * empty result when the sink has not committed yet. */
  def hllStateEstimate(sp: org.apache.spark.sql.SparkSession,
      statePath: String, groupCol: String, p: Int = 8): DataFrame =
    hllState(sp, statePath) match {
      case Some(regs) => graft.operators.Analytics.hllEstimate(regs, groupCol, p)
      case None => sp.emptyDataFrame
    }

  /** Streaming DDSKETCH sink — the quantile-profile counterpart of
    * [[hllRegisterSink]]: each micro-batch's values fold into a
    * persistent per-group register table
    * ([[graft.operators.Analytics.ddsketchRegisters]] ∪ sum-merge), so
    * the stored state answers "p50/p95/p99 of every value seen EVER,
    * per group, within α relative error" in O(groups · buckets) bytes
    * however long the stream runs.
    *
    * Replay safety differs from the HLL sink BY NECESSITY: register
    * SUM-merge is not idempotent (a replayed micro-batch would
    * double-count where HLL's max-merge re-merges harmlessly), so this
    * sink adds version-id bookkeeping — state lands at
    * `statePath/v-<batchId>`; a replayed batch whose version is
    * already committed is SKIPPED, and an uncommitted write (crash
    * mid-write, no `_SUCCESS`) recomputes from the highest committed
    * version BELOW the current batch id. Batch ids are monotone per
    * checkpoint, so this is exactly-once folding. Older versions prune
    * to a depth of 2, as in the HLL sink. Read with [[ddsketchState]] /
    * [[ddsketchStateQuantiles]]. */
  def ddsketchRegisterSink(stream: DataFrame, statePath: String,
      checkpointPath: String, groupCol: String, valueCol: String,
      gamma: Double = 1.02): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(statePath)
        val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
        val committed = hllVersions(fs, root) // generic v-<id> lister
        if (!committed.contains(batchId)) {
          val fresh = graft.operators.Analytics
            .ddsketchRegisters(batch, groupCol, valueCol, gamma)
          val base = committed.filter(_ < batchId).lastOption
            .map(v => sp.read.parquet(s"$statePath/v-$v"))
          val merged = base.fold(fresh)(cur =>
            graft.operators.Analytics.ddsketchMergeRegisters(cur, fresh))
          merged.coalesce(1).write.mode("overwrite")
            .parquet(s"$statePath/v-$batchId")
          hllVersions(fs, root).dropRight(2).foreach { old =>
            fs.delete(new org.apache.hadoop.fs.Path(root, s"v-$old"),
              true); ()
          }
        }
        ()
      }
      .start()

  /** Latest committed register table of a [[ddsketchRegisterSink]]. */
  def ddsketchState(sp: org.apache.spark.sql.SparkSession,
      statePath: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
    hllVersions(fs, root).lastOption.map(v =>
      sp.read.parquet(s"$statePath/v-$v"))
  }

  /** Per-group quantile estimates over a [[ddsketchRegisterSink]]'s
    * stored registers; empty when the sink has not committed yet. */
  def ddsketchStateQuantiles(sp: org.apache.spark.sql.SparkSession,
      statePath: String, quantiles: Seq[Double],
      gamma: Double = 1.02): DataFrame =
    ddsketchState(sp, statePath) match {
      case Some(regs) =>
        graft.operators.Analytics.ddsketchQuantiles(regs, quantiles, gamma)
      case None => sp.emptyDataFrame
    }

  /** Streaming SEQUENTIAL-mSPRT monitor sink — the continuously-
    * monitored-experiment twin of
    * [[graft.operators.Analytics.sequentialMsprt]]: each micro-batch is
    * ONE LOOK. The batch's unit increments (arm via the SAME md5 split,
    * counts as exact BIGINTs) fold into a persistent ONE-ROW state
    * `(n_a, n_b, conv_a, conv_b, log_lambda, log_evidence)`, where
    * lnΛ is computed by the batch operator's shared scoring chain
    * ([[graft.operators.Analytics.msprtScored]] — the twin cannot
    * drift) on the counts AFTER the fold, and
    * `log_evidence = max(previous evidence, lnΛ)` — the running-max
    * evidence process that makes peeking valid at every commit.
    *
    * INPUT CONTRACT: unit-level FIRST-TOUCH records
    * `(unitCol, convCol)` — [[dedupStream]] keyed on the unit id is the
    * canonical upstream (the batch operator's `groupBy(unit)` performs
    * the same dedup); feeding raw events would count a unit once per
    * event. A unit's conversion is whatever its first-touch record
    * carries — the honest streaming semantics (a later conversion
    * arrives as a later look's correction only if the upstream emits
    * one).
    *
    * Replay safety: count sum-folding is NOT idempotent, so this sink
    * uses the [[ddsketchRegisterSink]] version-id discipline verbatim —
    * state lands at `statePath/v-<batchId>` (`_SUCCESS` the commit
    * marker); a replayed committed batch is skipped; an uncommitted
    * write recomputes from the highest committed version below the
    * batch id; depth-2 pruning. Read with [[msprtState]] /
    * [[msprtStateReadout]]. */
  def msprtMonitorSink(units: DataFrame, statePath: String,
      checkpointPath: String, unitCol: String, convCol: String,
      tauSq: Double = 0.0001): org.apache.spark.sql.streaming.StreamingQuery = {
    require(tauSq > 0, "mixture variance tauSq must be positive")
    units.writeStream
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(statePath)
        val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
        val committed = hllVersions(fs, root)
        if (!committed.contains(batchId)) {
          import org.apache.spark.sql.functions._
          val A = graft.operators.Analytics
          val inc = batch.filter(col(unitCol).isNotNull)
            .withColumn("_graft_arm", A.md5ArmCol(col(unitCol)))
            .agg(
              coalesce(sum(when(col("_graft_arm") === "a", 1L)
                .otherwise(0L)), lit(0L)).as("i_na"),
              coalesce(sum(when(col("_graft_arm") === "b", 1L)
                .otherwise(0L)), lit(0L)).as("i_nb"),
              coalesce(sum(when(col("_graft_arm") === "a",
                col(convCol).cast("long")).otherwise(0L)), lit(0L))
                .as("i_ca"),
              coalesce(sum(when(col("_graft_arm") === "b",
                col(convCol).cast("long")).otherwise(0L)), lit(0L))
                .as("i_cb"))
          val base = committed.filter(_ < batchId).lastOption
            .map(v => sp.read.parquet(s"$statePath/v-$v"))
            .getOrElse(inc.sparkSession.range(1).select(
              lit(0L).as("n_a"), lit(0L).as("n_b"),
              lit(0L).as("conv_a"), lit(0L).as("conv_b"),
              lit(null).cast("double").as("log_lambda"),
              lit(null).cast("double").as("log_evidence")))
          val folded = base.crossJoin(inc).select(
            (col("n_a") + col("i_na")).as("n_a"),
            (col("n_b") + col("i_nb")).as("n_b"),
            (col("conv_a") + col("i_ca")).as("conv_a"),
            (col("conv_b") + col("i_cb")).as("conv_b"),
            col("log_evidence").as("_graft_prev_ev"))
          val scored = A.msprtScored(folded, tauSq)
            .withColumn("log_evidence",
              greatest(col("_graft_prev_ev"), col("log_lambda")))
            .select(col("n_a"), col("n_b"), col("conv_a"),
              col("conv_b"), col("log_lambda"), col("log_evidence"))
          scored.coalesce(1).write.mode("overwrite")
            .parquet(s"$statePath/v-$batchId")
          hllVersions(fs, root).dropRight(2).foreach { old =>
            fs.delete(new org.apache.hadoop.fs.Path(root, s"v-$old"),
              true); ()
          }
        }
        ()
      }
      .start()
  }

  /** Latest committed one-row state of a [[msprtMonitorSink]]. */
  def msprtState(sp: org.apache.spark.sql.SparkSession,
      statePath: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
    hllVersions(fs, root).lastOption.map(v =>
      sp.read.parquet(s"$statePath/v-$v"))
  }

  /** Always-valid readout over a [[msprtMonitorSink]]'s state — the
    * batch operator's shared `p_always_valid`/`reject_h0` columns over
    * the stored evidence; empty when the sink has not committed. */
  def msprtStateReadout(sp: org.apache.spark.sql.SparkSession,
      statePath: String, alpha: Double = 0.05): DataFrame =
    msprtState(sp, statePath) match {
      case Some(st) => graft.operators.Analytics.msprtReadout(st, alpha)
      case None => sp.emptyDataFrame
    }

  /** Map-only streaming twin of
    * [[graft.operators.TextAnalysis.wordpieceEncodeCounts]]: the trained
    * piece inventory broadcasts (bounded LOUDLY — a tokenizer vocabulary
    * is tens of thousands of pieces, never corpus-sized) and each
    * record runs the same greedy longest-match kernel
    * ([[graft.operators.TextAnalysis.wordpieceTokenCount]]), so
    * stream ≡ batch bit-for-bit (spec-pinned) and the screen attaches
    * to any readStream without state. Per-record word memoization keeps
    * repeated words O(1) like the unigram screen. */
  def wordpieceEncodeScreen(docs: DataFrame, idCol: String, textCol: String,
      pieces: DataFrame): DataFrame = {
    val sp = pieces.sparkSession
    import sp.implicits._
    val maxPieces = 1 << 21
    val rows = pieces.select(col("piece").cast("string"))
      .limit(maxPieces + 1).as[String].collect()
    require(rows.length <= maxPieces,
      s"wordpieceEncodeScreen inventory exceeds $maxPieces pieces; the " +
        "screen broadcasts it — use the batch distributed path " +
        "(TextAnalysis.wordpieceEncodeCounts) for larger inventories.")
    val ps = rows.iterator.filter(_ != null).toSet
    require(ps.nonEmpty, "empty piece inventory")
    val maxLen = ps.iterator.map(_.length).max
    val bc = sp.sparkContext.broadcast((ps, maxLen))
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val (pieceSet, ml) = bc.value
        it.flatMap { case (id, text) =>
          val ws = graft.operators.Dedup.Kernel.tokens(text)
          if (ws.isEmpty) Iterator.empty
          else {
            val memo = new java.util.HashMap[String, (Long, Long)]()
            var ntok = 0L
            var nunk = 0L
            var i = 0
            while (i < ws.length) {
              val w = ws(i)
              var e = memo.get(w)
              if (e == null) {
                val n = graft.operators.TextAnalysis
                  .wordpieceTokenCount(w, pieceSet, ml)
                e = if (n < 0) (1L, 1L) else (n.toLong, 0L)
                memo.put(w, e)
              }
              ntok += e._1
              nunk += e._2
              i += 1
            }
            Iterator.single((id, ws.length.toLong, ntok, nunk))
          }
        }
      }.toDF("doc_id", "n_words", "n_wp_tokens", "n_unk_words")
  }

  /** Streaming ANN INGEST into a STORED
    * [[graft.operators.Similarity.writeNswGraph]] layout — the
    * index-maintenance twin of [[annServeSink]]: each micro-batch of
    * new vectors (1) anti-joins the corpus store on `vec_id` and
    * appends only genuinely new rows (so a replayed batch cannot
    * duplicate corpus rows), then (2) folds the new vectors into the
    * stored graph via
    * [[graft.operators.Similarity.appendToStoredNswGraph]] against the
    * FROZEN build-time centroids — file-append-only, manifest rows
    * added for new files only, and idempotent under replay (an
    * already-indexed node is `known` and appends nothing). Together
    * with [[annServeSink]] this is the full streaming vector-database
    * loop: one stream grows corpus + index, another serves queries,
    * and deletes ride the [[graft.operators.Similarity
    * .writeGraphTombstones]] sidecar between them. Per-batch work is
    * O(new × cell) plus one column-pruned id scan of the corpus store —
    * never a rebuild. */
  def annAppendSink(newVectors: DataFrame, corpusPath: String,
      graphPath: String, checkpointPath: String,
      cents: Array[(Long, Array[Float])], m: Int, numFiles: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(cents.nonEmpty, "need the frozen build-time centroids")
    require(m >= 1, "m must be positive")
    newVectors.writeStream
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val existing = sp.read.parquet(corpusPath)
          .select(col("vec_id").cast("long").as("vec_id"))
        val fresh = batch
          .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
          .filter(col("vec_id").isNotNull && col("embedding").isNotNull)
          .join(existing, Seq("vec_id"), "left_anti")
        fresh.write.mode("append").parquet(corpusPath)
        val grown = sp.read.parquet(corpusPath)
        graft.operators.Similarity
          .appendToStoredNswGraph(grown, graphPath, cents, m, numFiles)
        ()
      }
      .start()
  }

  /** Streaming ANN SERVING over a STORED [[graft.operators.Similarity
    * .writeNswGraph]] layout — the query-stream twin of
    * [[graft.operators.Similarity.nswKnnStored]]: each micro-batch of
    * query vectors runs the full file-pruned beam search against the
    * static corpus + graph and lands its top-k as
    * `outPath/batch-<id>`, written with OVERWRITE so a checkpoint
    * replay of a micro-batch clobbers its own output instead of
    * double-appending (the idempotence discipline the CDC sink uses).
    * Unlike [[streamingKnnClassify]] this never broadcasts the corpus —
    * the corpus and graph stay on disk and each round reads only the
    * frontier's graph files, so the SAME serving path scales from this
    * spec's 500 vectors to a corpus no executor set could hold. The
    * per-batch query side rides the usual broadcast contract (a
    * micro-batch is bounded by construction; the limit is still checked
    * loudly). Read results with `spark.read.parquet(outPath + "/b*")`
    * or per batch. Returns the started query; callers own its
    * lifecycle. */
  def annServeSink(queries: DataFrame, corpus: DataFrame, graphPath: String,
      entryNodes: DataFrame, outPath: String, checkpointPath: String,
      k: Int, beam: Int = 12, rounds: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Similarity
            .nswKnnStored(batch, corpus, graphPath, entryNodes, k, beam, rounds)
            .write.mode("overwrite").parquet(s"$outPath/batch-$batchId")
        }
      }.start()

  /** Ingest-time kNN LABEL SUGGESTION — the streaming twin of
    * [[graft.operators.Labels.knnClassify]]: score each arriving
    * vector against a STATIC labeled reference set (bounded by the
    * same broadcast contract as the ANN query side —
    * [[graft.operators.Similarity.MaxBroadcastQueries]] rows, checked
    * loudly) and attach the majority label of its `k` nearest
    * reference vectors. MAP-ONLY: no state, no watermark, no shuffle —
    * the per-record cost is one pass over the broadcast reference, so
    * it runs identically on a batch frame, which is how the spec
    * proves stream ≡ batch. Ordering and ties mirror the batch
    * operator exactly (cosine round-6 desc, id asc; majority ties to
    * the smallest label; a reference row sharing the record's id is
    * excluded, null-label rows cast no vote). Null id/vector rows pass
    * through with a null prediction. Adds (pred_label, votes). */
  def streamingKnnClassify(stream: DataFrame, reference: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be positive")
    val sp = reference.sparkSession
    import sp.implicits._
    val ref: Array[(Long, Array[Float], Int)] = reference
      .select(col(idCol).cast("long"), col(vecCol), col("label").cast("int"))
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull && col("label").isNotNull)
      .limit(graft.operators.Similarity.MaxBroadcastQueries + 1)
      .as[(Long, Array[Float], Int)].collect()
    require(ref.length <= graft.operators.Similarity.MaxBroadcastQueries,
      "labeled reference set exceeds the broadcast contract " +
        s"(${graft.operators.Similarity.MaxBroadcastQueries} rows); " +
        "classify corpus-scale sets via Labels.classifyFromNeighbors over an ANN frame")
    require(ref.nonEmpty, "labeled reference set is empty")
    val bref = sp.sparkContext.broadcast(ref)
    val kk = k
    val predict = udf { (id: java.lang.Long, v: Array[Float]) =>
      if (id == null || v == null) null
      else {
        val refs = bref.value
        // bounded insertion top-k by (cosine round-6 desc, ref id asc)
        val topIds = new Array[Long](kk)
        val topCs = new Array[Double](kk)
        val topLb = new Array[Int](kk)
        var n = 0
        var i = 0
        while (i < refs.length) {
          val (rid, rv, rl) = refs(i)
          if (rid != id.longValue()) {
            val cs = graft.operators.Similarity.cosineKernel(v, rv)
            var pos = n
            while (pos > 0 &&
              (topCs(pos - 1) < cs || (topCs(pos - 1) == cs && topIds(pos - 1) > rid))) pos -= 1
            if (pos < kk) {
              val last = math.min(n, kk - 1)
              var j = last
              while (j > pos) {
                topIds(j) = topIds(j - 1); topCs(j) = topCs(j - 1); topLb(j) = topLb(j - 1)
                j -= 1
              }
              topIds(pos) = rid; topCs(pos) = cs; topLb(pos) = rl
              if (n < kk) n += 1
            }
          }
          i += 1
        }
        if (n == 0) null
        else {
          val counts = new java.util.HashMap[Int, Long]()
          var j = 0
          while (j < n) { counts.merge(topLb(j), 1L, (a, b) => a + b); j += 1 }
          var bestLabel = Int.MaxValue; var bestVotes = -1L
          counts.forEach { (lb, c) =>
            if (c > bestVotes || (c == bestVotes && lb < bestLabel)) {
              bestLabel = lb; bestVotes = c
            }
          }
          (bestLabel, bestVotes)
        }
      }
    }
    stream.withColumn("_graft_pred", predict(col(idCol).cast("long"), col(vecCol)))
      .withColumn("pred_label", col("_graft_pred._1"))
      .withColumn("votes", col("_graft_pred._2"))
      .drop("_graft_pred")
  }

  def incrementalNearDupCandidates(newDocs: DataFrame, corpusBands: DataFrame,
      idCol: String, textCol: String, k: Int = 16, r: Int = 4): DataFrame =
    graft.operators.Dedup.minhashBands(newDocs, idCol, textCol, k, r)
      .withColumnRenamed("doc_id", "new_id")
      .join(corpusBands.withColumnRenamed("doc_id", "corpus_id"), Seq("band", "key"))
      .select(col("new_id"), col("corpus_id"))

  /** Incremental STREAM-vs-CORPUS near-dup for the banded-Hamming
    * family ([[incrementalNearDupCandidates]]' contract applied to
    * image dHash / audio envelope hashes, m16/m18's batch join): the
    * new batch's 64-bit hashes band into bit-slice buckets
    * ([[graft.operators.Multimodal.hashBands]], the SAME projection the
    * batch pair join uses — the twin cannot drift) and equi-join the
    * PRE-BANDED stored corpus on `(band, key)`; survivors verify with
    * the exact XOR+popcount Hamming and the `maxHamming` cut. Per-batch
    * cost ∝ batch bands × matching buckets — never the corpus. By the
    * pigeonhole rule (`maxHamming < bands`, enforced here as in the
    * batch join) every true near-dup pair shares ≥ 1 band, so the
    * incremental path finds exactly the batch join's cross pairs
    * (StreamsSpec pins the equivalence); a pair sharing several bands
    * surfaces once per band — stateless map+join, so the op runs
    * unchanged on a structured stream; dedupe downstream if consuming
    * raw candidates. Output: `(new_id, corpus_id, hamming)`. */
  def incrementalHammingCandidates(newHashes: DataFrame,
      corpusBands: DataFrame, hashCol: String, maxHamming: Int = 10,
      bands: Int = 16): DataFrame = {
    require(maxHamming < bands,
      s"recall guarantee needs maxHamming < bands (got $maxHamming >= $bands)")
    graft.operators.Multimodal.hashBands(newHashes, hashCol, bands)
      .withColumnRenamed("media_id", "new_id")
      .withColumnRenamed("_graft_h", "_graft_hn")
      .join(corpusBands
        .withColumnRenamed("media_id", "corpus_id")
        .withColumnRenamed("_graft_h", "_graft_hc"), Seq("band", "key"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        bit_count(col("_graft_hn").bitwiseXOR(col("_graft_hc")))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Session-window aggregation via the BUILT-IN `session_window`
    * function — the declarative alternative to [[sessionize]] when the
    * per-session outputs are plain aggregates (the engine manages merge
    * state; watermark closes sessions). Works identically on batch input,
    * which is how q45 oracle-checks the semantics. */
  def sessionWindowAgg(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      gap: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(keyCol), col("sw.start").as("s_start"), col("sw.end").as("s_end"),
        col("n_events"), col("sum_value"))

  /** Gap-based streaming sessionization (the streaming twin of
    * TemporalJoins.sessionize): sessions close when no event arrives for
    * `gapSec` of *event time*, enforced with an event-time timeout so
    * state cannot grow unboundedly. Requires a watermark on the input. */
  /** Streaming CDC materialization: apply each micro-batch of changes
    * onto a parquet state table with
    * [[graft.operators.Analytics.upsertLatest]] — the `foreachBatch`
    * MERGE-INTO loop that keeps a queryable latest-state snapshot of an
    * unbounded change stream.
    *
    * State layout — BUCKETED to bound write amplification: keys are
    * hash-partitioned into `nBuckets` fixed buckets (`b-<i>` subdirs; the
    * count is pinned in a `_GRAFT_BUCKETS` meta file on first write so a
    * restart with a different argument cannot split keys across two
    * bucketings, and the merge columns are pinned alongside in
    * `_GRAFT_SINKCONF` so [[cdcState]] can resolve delta chains). A
    * micro-batch writes ONLY into the buckets its keys touch.
    *
    * WITHIN a bucket the layout is LSM-lite: the first commit is a full
    * snapshot `v-<n>`; subsequent batches append small DELTA dirs
    * `d-<n>` holding just that batch's changes (tombstones included) —
    * per-batch write volume is O(batch), not O(bucket), so a hot key
    * does not rewrite its bucket every micro-batch. Once a chain would
    * reach `compactEvery` deltas, the batch instead COMPACTS: base
    * snapshot + accumulated deltas + new changes merge into a fresh
    * snapshot, bounding read amplification at `compactEvery − 1` delta
    * files per bucket. `compactEvery = 1` degenerates to
    * merge-every-batch (the pre-delta behavior). Versions are one
    * ascending sequence per bucket across both kinds.
    *
    * "Committed" = carries the sink's OWN `_GRAFT_COMMIT` marker,
    * created after the parquet write returns — deliberately NOT the
    * committer's `_SUCCESS`, which deployments commonly disable on
    * object stores
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`); relying
    * on it there would silently merge every batch onto an empty base. A
    * crash mid-write leaves the committed chain intact: uncommitted dirs
    * are invisible to readers, the retried batch reuses the version
    * number when it maps to the same kind (clobbered by
    * `mode("overwrite")`), and stale debris is swept at the next
    * compaction. Compaction retires everything OLDER than the previous
    * snapshot, so a concurrent [[cdcState]] reader that resolved the
    * previous snapshot (+ its delta chain) keeps working while the sink
    * commits the next generation. All filesystem probing goes through
    * Hadoop `FileSystem`, so the sink works on HDFS/S3/ABFS, not just
    * `file:`. Checkpoint replay of a micro-batch re-applies the same
    * changes — idempotent under latest-wins (equal versions, updates
    * win; tombstoned keys stay absent). Read the current state with
    * [[cdcState]].
    *
    * Semantics note (inherent to snapshot-only state): a tombstone
    * erases the key AND its version history, so a later-arriving update
    * with an older version resurrects the key. Feed monotone versions
    * per key (event time does this) or retain tombstones upstream.
    *
    * SIZING `nBuckets` — with delta mode, per-batch write volume is
    * O(batch changes) and only COMPACTION rewrites a bucket whole, so
    * nBuckets sizes the compaction unit and the read-side file count:
    * pick nBuckets so a bucket is a few target parquet files (≈ 1–4 GB),
    * i.e. nBuckets ≈ |state| / 2 GB (at 100 TB ≈ 50k buckets — a
    * hot-key batch appends a delta measured in that batch's bytes, and
    * one in `compactEvery` batches pays a ~2 GB bucket compaction, never
    * 1.6 TB; the fixed-64 default is for small/medium state; the meta
    * file pins whatever the first writer chose). Touched buckets merge
    * CONCURRENTLY (`maxConcurrentBuckets` at a time), so a wide batch
    * pays max(bucket merge latency), not the sum.
    *
    * Returns the started query; callers own its lifecycle. */
  def cdcUpsertSink(updates: DataFrame, statePath: String, checkpointPath: String,
      keyCols: Seq[String], versionCol: String, deletedCol: Option[String] = None,
      nBuckets: Int = 64, maxConcurrentBuckets: Int = 8, compactEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(nBuckets >= 1, "nBuckets must be positive")
    require(maxConcurrentBuckets >= 1, "maxConcurrentBuckets must be positive")
    require(compactEvery >= 1, "compactEvery must be positive")
    updates.writeStream
      .option("checkpointLocation", checkpointPath)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(statePath)
        val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
        val nb = ensureBucketCount(fs, root, nBuckets)
        ensureSinkConf(fs, root, keyCols, versionCol, deletedCol)
        // stage the batch once; each touched bucket filters from it
        val staged = batch.withColumn("_graft_bkt",
          pmod(hash(keyCols.map(col): _*), lit(nb))).persist()
        try {
          val touched = staged.select("_graft_bkt").distinct()
            .collect().map(_.getInt(0)).sorted

          def mergeBucket(b: Int): Unit = {
            BucketMergeGauge.enter()
            try {
              val bRoot = new org.apache.hadoop.fs.Path(root, s"b-$b")
              val entries = committedEntries(fs, bRoot)
              val snapIdx = entries.lastIndexWhere(_.isSnapshot)
              val baseSnap = if (snapIdx >= 0) Some(entries(snapIdx)) else None
              val deltas = entries.drop(snapIdx + 1) // chain after latest snapshot
              val next = entries.lastOption.map(_.version + 1L).getOrElse(0L)
              val changes = staged.filter(col("_graft_bkt") === b).drop("_graft_bkt")
              if (baseSnap.isEmpty || deltas.length + 1 >= compactEvery) {
                // COMPACT: base + accumulated deltas + this batch → snapshot.
                // Each delta is tagged with its chain sequence (the d-<n>
                // version) as a tie-break: rows from DIFFERENT batches at
                // an equal version resolve by batch order — the serial
                // per-batch merge's newest-batch-wins semantics — instead
                // of partition-order luck.
                val base = baseSnap
                  .map(e => sp.read.parquet(e.path.toString))
                  .getOrElse(sp.createDataFrame(
                    sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                    batch.drop(deletedCol.toSeq: _*).schema))
                val allChanges = (deltas.map(e => sp.read.parquet(e.path.toString)
                    .withColumn("_graft_seq", lit(e.version)))
                  :+ changes.withColumn("_graft_seq", lit(next)))
                  .reduce(_.unionByName(_, allowMissingColumns = true))
                val merged = graft.operators.Analytics
                  .upsertLatest(base, allChanges, keyCols, versionCol, deletedCol,
                    tieBreakCols = Seq("_graft_seq"))
                  .drop("_graft_seq") // chain-internal; never in the snapshot
                val vDir = new org.apache.hadoop.fs.Path(bRoot, s"v-$next")
                // writes to a FRESH dir — the chain being read is untouched
                merged.write.mode("overwrite").parquet(vDir.toString)
                // the sink's own commit marker, created only after the
                // write action returned
                fs.create(new org.apache.hadoop.fs.Path(vDir, CommitMarker), true).close()
                // retire the generation BEFORE the previous snapshot (the
                // previous snapshot + its delta chain stay for concurrent
                // readers), plus any crash debris old enough that its
                // version can never commit
                entries.take(math.max(snapIdx, 0))
                  .foreach(e => fs.delete(e.path, true))
                uncommittedDebris(fs, bRoot, next)
                  .foreach(p => fs.delete(p, true))
              } else {
                // DELTA: append just this batch's changes (tombstones kept
                // as rows — a reader needs them to hide base entries)
                val dDir = new org.apache.hadoop.fs.Path(bRoot, s"d-$next")
                changes.write.mode("overwrite").parquet(dDir.toString)
                fs.create(new org.apache.hadoop.fs.Path(dDir, CommitMarker), true).close()
              }
            } finally BucketMergeGauge.exit()
          }

          // merge touched buckets CONCURRENTLY (bounded pool): each merge
          // is an independent read+merge+write job chain on its own
          // bucket, so a wide batch is not serialized into
          // touched-count × per-bucket latency. Any failure propagates
          // out of foreachBatch → the batch retries as a unit (same
          // semantics as the old serial loop; idempotent under
          // latest-wins, exactly like checkpoint replay). Every future is
          // lifted to Try and ALL are awaited before the first failure
          // rethrows: a fail-fast await would leave zombie merges writing
          // v-/d- dirs while the retried batch recomputes the same
          // version numbers and overwrites them concurrently.
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(maxConcurrentBuckets, math.max(1, touched.length)))
          try {
            implicit val ec: scala.concurrent.ExecutionContext =
              scala.concurrent.ExecutionContext.fromExecutorService(pool)
            val merges = touched.toSeq.map(b =>
              scala.concurrent.Future(mergeBucket(b))
                .transform(t => scala.util.Success(t)))
            val settled = scala.concurrent.Await.result(
              scala.concurrent.Future.sequence(merges),
              scala.concurrent.duration.Duration.Inf)
            settled.collectFirst { case scala.util.Failure(e) => e }
              .foreach(e => throw e)
          } finally pool.shutdown()
        } finally { staged.unpersist(); () }
      }
      .start()
  }

  /** Test-visible gauge of concurrent bucket merges inside one
    * [[cdcUpsertSink]] micro-batch — StreamingUpsertSpec asserts the
    * touched-bucket loop really overlaps (peak > 1) instead of
    * serializing. */
  private[streaming] object BucketMergeGauge {
    private val active = new java.util.concurrent.atomic.AtomicInteger(0)
    private val peakEver = new java.util.concurrent.atomic.AtomicInteger(0)
    def enter(): Unit = {
      val a = active.incrementAndGet()
      peakEver.accumulateAndGet(a, math.max(_, _)); ()
    }
    def exit(): Unit = { active.decrementAndGet(); () }
    def peak: Int = peakEver.get()
    def reset(): Unit = { peakEver.set(active.get()); () }
  }

  private val CommitMarker = "_GRAFT_COMMIT"
  private val BucketMeta = "_GRAFT_BUCKETS"
  private val SinkConfMeta = "_GRAFT_SINKCONF"
  // key-column list separator in the conf file: a control char no legal
  // Spark column name contains
  private val KeySep = '\u0001'

  /** The merge columns a CDC state dir was written with — pinned so
    * [[cdcState]] can resolve delta chains without the caller re-stating
    * them (and mis-stating them: a mismatch between writers corrupts
    * latest-wins, so a restart with different columns fails loudly). */
  private[streaming] final case class SinkConf(
      keyCols: Seq[String], versionCol: String, deletedCol: Option[String])

  private[streaming] def readSinkConf(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[SinkConf] = {
    val meta = new org.apache.hadoop.fs.Path(root, SinkConfMeta)
    if (!fs.exists(meta)) None
    else {
      val props = new java.util.Properties()
      val in = fs.open(meta)
      try props.load(in) finally in.close()
      // keys joined on U+0001 — not a legal Spark column-name char
      Some(SinkConf(
        props.getProperty("keys", "").split(KeySep).toSeq.filter(_.nonEmpty),
        props.getProperty("version", ""),
        Option(props.getProperty("deleted")).filter(_.nonEmpty)))
    }
  }

  /** Pin (first write) or check (every later batch) the merge columns —
    * same lock + atomic-create discipline as [[ensureBucketCount]]. */
  private[streaming] def ensureSinkConf(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, keyCols: Seq[String], versionCol: String,
      deletedCol: Option[String]): Unit = bucketPinLock.synchronized {
    val want = SinkConf(keyCols, versionCol, deletedCol)
    def check(pinned: SinkConf): Unit =
      if (pinned != want) throw new IllegalStateException(
        s"CDC sink config mismatch at $root: state pinned $pinned, sink asked $want")
    readSinkConf(fs, root) match {
      case Some(pinned) => check(pinned)
      case None =>
        fs.mkdirs(root)
        val props = new java.util.Properties()
        props.setProperty("keys", keyCols.mkString(KeySep.toString))
        props.setProperty("version", versionCol)
        deletedCol.foreach(props.setProperty("deleted", _))
        try {
          val out = fs.create(new org.apache.hadoop.fs.Path(root, SinkConfMeta), false)
          try props.store(out, "graft cdc sink merge columns") finally out.close()
        } catch {
          case _: java.io.IOException =>
            readSinkConf(fs, root).foreach(check) // lost the race — verify
        }
    }
  }

  /** Guards first-write pinning for sinks racing within one JVM — local
    * FS `create(overwrite = false)` is check-then-act, so without this a
    * same-process race can interleave two writers on the meta file. */
  private val bucketPinLock = new Object

  /** The bucket count pinned for this state dir: read the meta file if
    * present, else persist `requested` as the dir's permanent bucketing.
    * Of two sinks racing on an empty state dir, exactly one wins and the
    * loser adopts the winner's count, so keys can never split across two
    * bucketings: same-JVM racers serialize on [[bucketPinLock]];
    * cross-process racers rely on the filesystem's atomic
    * `create(overwrite = false)` (HDFS/ABFS arbitrate at the namenode;
    * on stores without atomic create — S3A, raw local — cross-process
    * double-start stays the documented single-writer contract). */
  private[streaming] def ensureBucketCount(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, requested: Int): Int = bucketPinLock.synchronized {
    val meta = new org.apache.hadoop.fs.Path(root, BucketMeta)
    // a just-created meta can be momentarily empty or mid-write between
    // the winner's create and close (locally that surfaces as a short
    // read or ChecksumException) — bounded retry instead of failing the
    // batch
    def readPinned(attempts: Int): Option[Int] =
      if (!fs.exists(meta)) None
      else {
        val parsed: Either[Throwable, Option[Int]] =
          try {
            val in = fs.open(meta)
            val txt = try new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
            finally in.close()
            Right(txt.toIntOption)
          } catch { case e: java.io.IOException => Left(e) }
        parsed match {
          case Right(some @ Some(_)) => some
          case _ if attempts > 1 => Thread.sleep(50); readPinned(attempts - 1)
          case Right(None) => throw new IllegalStateException(
            s"unreadable bucket-count meta at $meta")
          case Left(e) => throw e
        }
      }
    readPinned(5).getOrElse {
      fs.mkdirs(root)
      try {
        val out = fs.create(meta, false)
        try out.write(requested.toString.getBytes("UTF-8")) finally out.close()
        requested
      } catch {
        case _: java.io.IOException =>
          // lost the create race — the other writer's count is the pin
          readPinned(5).getOrElse(throw new IllegalStateException(
            s"bucket-count meta at $meta vanished after losing create race"))
      }
    }
  }

  /** The latest committed state written by [[cdcUpsertSink]]: per
    * bucket, the newest committed snapshot merged with the committed
    * delta chain after it (one global [[graft.operators.Analytics
    * .upsertLatest]] over all buckets — keys never cross buckets, so the
    * per-bucket merges collapse into a single key-shuffled pass; the
    * merge columns come from the pinned `_GRAFT_SINKCONF`). Buckets with
    * no deltas read snapshot-only with zero merge work. Safe to run
    * concurrently with the sink — the generation a reader resolves stays
    * on disk until the compaction after next. */
  def cdcState(sp: org.apache.spark.sql.SparkSession, statePath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
    val perBucket =
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("b-"))
        .flatMap { b =>
          val entries = committedEntries(fs, b)
          val snapIdx = entries.lastIndexWhere(_.isSnapshot)
          if (snapIdx < 0) None
          else Some((entries(snapIdx).path, entries.drop(snapIdx + 1)))
        }
    require(perBucket.nonEmpty, s"no committed CDC state under $statePath")
    val bases = sp.read.parquet(perBucket.map(_._1.toString): _*)
    val deltaEntries = perBucket.flatMap(_._2)
    if (deltaEntries.isEmpty) bases
    else {
      val conf = readSinkConf(fs, root).getOrElse(throw new IllegalStateException(
        s"delta chains under $statePath but no $SinkConfMeta — state dir corrupt"))
      // per-delta reads (not one multi-path scan) so each carries its
      // chain sequence — equal-version ties resolve by batch order, the
      // same rule the sink's compaction applies. Bounded fan-in: at most
      // compactEvery − 1 deltas per bucket.
      val tagged = deltaEntries
        .map(e => sp.read.parquet(e.path.toString)
          .withColumn("_graft_seq", lit(e.version)))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      graft.operators.Analytics.upsertLatest(bases, tagged,
        conf.keyCols, conf.versionCol, conf.deletedCol,
        tieBreakCols = Seq("_graft_seq"))
        .drop("_graft_seq")
    }
  }

  /** One committed snapshot (`v-<n>`) or delta (`d-<n>`) dir. */
  private[streaming] final case class CommittedEntry(
      version: Long, isSnapshot: Boolean, path: org.apache.hadoop.fs.Path)

  /** Every committed entry in one bucket dir, ascending by version. */
  private[streaming] def committedEntries(fs: org.apache.hadoop.fs.FileSystem,
      bucketPath: org.apache.hadoop.fs.Path): Seq[CommittedEntry] = {
    if (!fs.exists(bucketPath)) Seq.empty
    else fs.listStatus(bucketPath).toSeq.filter(_.isDirectory).map(_.getPath)
      .flatMap { p =>
        val (snap, rest) = p.getName match {
          case n if n.startsWith("v-") => (true, n.stripPrefix("v-"))
          case n if n.startsWith("d-") => (false, n.stripPrefix("d-"))
          case n => (false, n) // unparseable → dropped below
        }
        rest.toLongOption.map(CommittedEntry(_, snap, p))
      }
      .filter(e => fs.exists(new org.apache.hadoop.fs.Path(e.path, CommitMarker)))
      .sortBy(_.version)
  }

  /** Marker-less `v-`/`d-` dirs older than `beforeVersion` — crash
    * debris: their version number is already taken by the committed
    * chain (or skipped), so they can never commit and are safe to
    * sweep. */
  private def uncommittedDebris(fs: org.apache.hadoop.fs.FileSystem,
      bucketPath: org.apache.hadoop.fs.Path,
      beforeVersion: Long): Seq[org.apache.hadoop.fs.Path] = {
    if (!fs.exists(bucketPath)) Seq.empty
    else fs.listStatus(bucketPath).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith("v-") || n.startsWith("d-")) &&
          n.drop(2).toLongOption.exists(_ < beforeVersion) &&
          !fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker))
      }
  }

  def sessionize(events: Dataset[StreamEvent], gapSec: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSec * 1000000L

    // micros-exact conversions (getTime alone truncates to millis, but
    // the batch engine compares full microseconds — Timestamp keeps the
    // sub-second part in nanos)
    def us(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    def toTs(usVal: Long): Timestamp = {
      val t = new Timestamp(math.floorDiv(usVal, 1000000L) * 1000L)
      t.setNanos((math.floorMod(usVal, 1000000L) * 1000L).toInt)
      t
    }
    def close(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, toTs(s.startUs), toTs(s.lastUs), s.n, s.sumValue)

    events
      .withWatermark("ts", s"$gapSec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[OpenSessions]) =>
          // Merge kept sessions and this batch's events as time INTERVALS
          // sorted by start — out-of-order events (admissible up to the
          // watermark) may extend a session backwards or bridge two.
          val intervals =
            (state.getOption.map(_.sessions).getOrElse(Seq.empty) ++
              batch.map(e => SessionState(us(e.ts), us(e.ts), 1, e.value)))
              .sortBy(s => (s.startUs, s.lastUs))
          val merged = Seq.newBuilder[SessionState]
          var cur: SessionState = null
          intervals.foreach { iv =>
            cur match {
              case null => cur = iv
              case s if iv.startUs - s.lastUs <= gapUs =>
                cur = SessionState(s.startUs, math.max(s.lastUs, iv.lastUs),
                  s.n + iv.n, s.sumValue + iv.sumValue)
              case s =>
                merged += s
                cur = iv
            }
          }
          if (cur != null) merged += cur
          // A session is final only when the watermark has passed its
          // end + gap — no admissible event can reach it any more.
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.result().partition(_.lastUs + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            state.setTimeoutTimestamp(open.map(_.lastUs).min / 1000L + gapSec * 1000L + 1L)
          }
          closed.map(close(userId, _)).iterator
      }
  }

  /** Streaming EWMA twin of [[graft.operators.Analytics.ewma]]: one
    * (count, level) pair of state per key, each micro-batch's rows
    * folded in (ts, event_id) order onto the carried level with the
    * SAME recurrence (y ← α·x + (1−α)·y, first-ever point as init, no
    * rounding — two IEEE multiplies + one add per point, bit-exact
    * across engines and across the stream/batch split).
    *
    * Equivalence contract (spec-pinned): with batches delivered in
    * event-time order — the kappa replay contract every stateful twin
    * here assumes — the level emitted for a key after batch k is
    * BIT-IDENTICAL to the batch operator over the union of batches
    * 1..k, because a left fold splits over concatenation:
    * fold(xs ++ ys) = fold(fold(xs), ys). Out-of-order delivery
    * ACROSS batches changes the fold order and therefore the result
    * (the batch operator re-sorts; carried state cannot) — callers
    * needing cross-batch reorder tolerance must replay.
    *
    * Scale shape: state is two scalars per key (no per-event buffer —
    * contrast [[sessionize]], which must buffer open intervals), the
    * per-batch sort is per-key in-memory over that key's batch rows
    * only, and output rides Update mode (one row per touched key per
    * batch). */
  def ewmaLevels(events: Dataset[EwmaEvent],
      alpha: Double = 0.3): Dataset[EwmaLevel] = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    import events.sparkSession.implicits._
    val oneMinus = 1.0 - alpha
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaLevel](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[EwmaEvent], state: GroupState[EwmaState]) =>
          val pts = batch.toArray.sortBy(e =>
            (e.ts.getTime, e.ts.getNanos, e.event_id))
          var (n, y) = state.getOption
            .map(s => (s.n, s.y)).getOrElse((0, 0.0))
          pts.foreach { e =>
            if (n == 0) y = e.value
            else y = alpha * e.value + oneMinus * y
            n += 1
          }
          state.update(EwmaState(n, y))
          EwmaLevel(userId, n, y)
      }
  }

  /** Streaming Hampel-filter twin of
    * [[graft.operators.Analytics.rollingMadAnomalies]] with
    * `centered = false`: consumes CLOSED daily counts (the Append-mode
    * output of a watermarked daily aggregation) and scores each day
    * against the trailing window of its key's 2·halfWindow + 1 most
    * recent counts — median and MAD both taken EXPLICITLY from the
    * sorted window (middle element, or the average of the two middles)
    * with the SAME fixed IEEE ops as the batch operator, so stream and
    * batch agree bit-for-bit.
    *
    * Equivalence contract (spec-pinned, the [[ewmaLevels]] kappa
    * shape): with daily records delivered in day order, the rows
    * emitted across batches 1..k are IDENTICAL to the trailing batch
    * operator over the union — a trailing window only ever looks
    * backward, so splitting the series across micro-batches cannot
    * change any day's window. Out-of-order delivery across batches
    * breaks the window contents (the batch operator re-sorts; carried
    * state cannot) — replay to repair, as with every stateful twin.
    *
    * Scale shape: state is a BOUNDED window of counts per key (seven
    * longs at the default — no per-event buffer, no unbounded growth),
    * one row emitted per closed day (flatMap, Append-friendly). */
  def hampelAnomalies(daily: Dataset[DailyCount], halfWindow: Int = 3,
      threshold: Double = 3.5): Dataset[HampelOut] = {
    require(halfWindow >= 1, "halfWindow must be positive")
    require(threshold > 0, "threshold must be positive")
    import daily.sparkSession.implicits._
    val win = 2 * halfWindow + 1
    def medOf(sorted: IndexedSeq[Double]): Double = {
      val n = sorted.length
      if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    }
    daily
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HampelState, HampelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[DailyCount], state: GroupState[HampelState]) =>
          val days = batch.toArray.sortBy(_.day.getTime)
          var counts = state.getOption.map(_.counts.toVector)
            .getOrElse(Vector.empty[Long])
          val out = days.map { d =>
            counts = (counts :+ d.n_events).takeRight(win)
            val sorted = counts.map(_.toDouble).sorted
            val med = medOf(sorted)
            val mad = medOf(counts.map(c => math.abs(c.toDouble - med)).sorted)
            HampelOut(userId, d.day, d.n_events, med, mad,
              math.abs(d.n_events.toDouble - med) > threshold * mad)
          }
          state.update(HampelState(counts))
          out.iterator
      }
  }

  /** Streaming two-sided CUSUM twin of
    * [[graft.operators.Analytics.cusumChangepoints]] with a PINNED
    * baseline: μ comes from `refMean` (a trained reference level — a
    * stream cannot know its own series mean), κ = kFrac·μ and
    * h = hFrac·μ fixed at start, and each closed daily count folds
    * onto four carried scalars with the SAME fixed IEEE update as the
    * batch operator's array fold:
    *
    *   s⁺ ← max(0, s⁺ + (x − μ − κ)),  s⁻ ← max(0, s⁻ + (μ − x − κ))
    *
    * Equivalence contract (spec-pinned, the [[ewmaLevels]] kappa
    * shape): with daily records in day order, the latest row per key
    * after batch k is BIT-IDENTICAL to
    * `cusumChangepoints(refMean = Some(μ))` over the union of batches
    * 1..k — a left fold splits over concatenation, and pinning μ is
    * exactly what makes the fold prefix-stable (the batch default
    * re-estimates μ from the whole series, which a prefix cannot know).
    *
    * Scale shape: five scalars + a count of state per key, Update-mode
    * one row per touched key per batch. */
  def cusumLevels(daily: Dataset[DailyCount], refMean: Double,
      kFrac: Double = 0.25, hFrac: Double = 4.0): Dataset[CusumLevel] = {
    require(kFrac >= 0, "kFrac must be non-negative")
    require(hFrac > 0, "hFrac must be positive")
    import daily.sparkSession.implicits._
    val mu = refMean
    val kap = kFrac * mu
    val h = hFrac * mu
    daily
      .groupByKey(_.user_id)
      .mapGroupsWithState[CusumState, CusumLevel](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[DailyCount], state: GroupState[CusumState]) =>
          val days = batch.toArray.sortBy(_.day.getTime)
          var st = state.getOption.getOrElse(CusumState(0, 0.0, 0.0, 0.0, 0.0, 0L))
          days.foreach { d =>
            val x = d.n_events.toDouble
            val sPos = math.max(0.0, st.sPos + (x - mu - kap))
            val sNeg = math.max(0.0, st.sNeg + (mu - x - kap))
            st = CusumState(st.n + 1, sPos, sNeg,
              math.max(st.maxPos, sPos), math.max(st.maxNeg, sNeg),
              st.alarms + (if (sPos > h || sNeg > h) 1L else 0L))
          }
          state.update(st)
          CusumLevel(userId, st.n, mu, st.maxPos, st.maxNeg, st.alarms)
      }
  }

  /** Streaming Holt–Winters twin of
    * [[graft.operators.Analytics.holtWinters]]: per key, the carried
    * state is (level, trend, `period` rotating seasonal slots), and
    * each closed daily count folds on with the SAME fixed IEEE update
    * as the batch operator's array fold —
    *
    *   l ← α·(x − s_head) + (1−α)·(l + b)
    *   b ← γ·(l_new − l) + (1−γ)·b
    *   s ← rotate(s) :+ δ·(x − l_new) + (1−δ)·s_head
    *
    * from the batch cold-start convention (first point becomes the
    * level, zero trend, zero seasonals).
    *
    * Equivalence contract (spec-pinned, the [[ewmaLevels]] kappa
    * shape): with daily records delivered in day order, the latest row
    * per key after batch k is BIT-IDENTICAL to `holtWinters` over the
    * union of batches 1..k — a left fold splits over concatenation,
    * and every arithmetic expression here replays the batch HOF's
    * operand order exactly (recomputing l_new in the batch fold equals
    * reusing it here: identical expression, identical bits).
    *
    * Scale shape: 2 + `period` doubles of state per key, Update-mode
    * one row per touched key per batch. */
  def holtWintersLevels(daily: Dataset[DailyCount], period: Int = 7,
      alpha: Double = 0.3, gamma: Double = 0.1,
      delta: Double = 0.2): Dataset[HwLevel] = {
    require(period >= 2, "period must be at least 2")
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(gamma > 0 && gamma <= 1, "gamma must be in (0, 1]")
    require(delta > 0 && delta <= 1, "delta must be in (0, 1]")
    import daily.sparkSession.implicits._
    val (oneA, oneG, oneD) = (1.0 - alpha, 1.0 - gamma, 1.0 - delta)
    daily
      .groupByKey(_.user_id)
      .mapGroupsWithState[HwState, HwLevel](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[DailyCount], state: GroupState[HwState]) =>
          val days = batch.toArray.sortBy(_.day.getTime)
          var st = state.getOption.getOrElse(
            HwState(0, 0.0, 0.0, Vector.fill(period)(0.0)))
          days.foreach { d =>
            val x = d.n_events.toDouble
            if (st.n == 0) st = HwState(1, x, 0.0, st.seasons)
            else {
              val sHead = st.seasons.head
              val lNew = alpha * (x - sHead) + oneA * (st.level + st.trend)
              val bNew = gamma * (lNew - st.level) + oneG * st.trend
              val sNew = delta * (x - lNew) + oneD * sHead
              st = HwState(st.n + 1, lNew, bNew,
                st.seasons.tail :+ sNew)
            }
          }
          state.update(st)
          HwLevel(userId, st.n, st.level, st.trend, st.seasons.head,
            st.level + st.trend + st.seasons.head)
      }
  }

  /** Streaming POISSON-BOOTSTRAP twin of
    * [[graft.operators.Analytics.bootstrapMeanCi]]'s replicate stage —
    * live error bars on a streamed metric: each arriving row folds its
    * md5-derived Poisson(1) weight into every replicate's carried
    * (exact DECIMAL weighted sum, weight total), and each micro-batch
    * emits all current replicate means; the consumer reads the CI off
    * their order statistics exactly as the batch operator does.
    *
    * Equivalence contract (spec-pinned): the rows emitted after batch
    * k are IDENTICAL to `Analytics.bootstrapReplicateMeans` over the
    * union of batches 1..k — in ANY arrival order, not just in-order
    * (stronger than the fold twins): the weight depends only on
    * (id, replicate), and decimal addition is exact and commutative,
    * so the carried sums cannot drift from the batch DECIMAL sums. The
    * per-addend quantization replays the batch path bit-for-bit
    * (`BigDecimal.valueOf` = Spark's shortest-repr double→DECIMAL
    * cast, scale 12 HALF_UP).
    *
    * Scale shape: `replicates` rows of state TOTAL (not per key), a
    * bounded B× flatMap per event, Update-mode B rows per batch. */
  def bootstrapReplicateMeans(events: Dataset[MetricEvent],
      replicates: Int = 64): Dataset[BootRep] = {
    require(replicates >= 2, "need at least two replicates")
    import events.sparkSession.implicits._
    def poissonW(id: Long, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${id}_$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex.substring(0, 7), 16) + 0.5) /
        268435456.0
      if (u < 0.36787944117144233) 0L
      else if (u < 0.7357588823428847) 1L
      else if (u < 0.9196986029286058) 2L
      else if (u < 0.9810118431238463) 3L
      else if (u < 0.9963401531726563) 4L
      else 5L
    }
    events
      .flatMap(e => (0 until replicates).map(b => (b, e.event_id, e.value)))
      .groupByKey(_._1)
      .mapGroupsWithState[BootState, BootRep](
        GroupStateTimeout.NoTimeout) {
        (b: Int, batch: Iterator[(Int, Long, Double)],
            state: GroupState[BootState]) =>
          var st = state.getOption.getOrElse(
            BootState(java.math.BigDecimal.ZERO, 0L))
          batch.foreach { case (_, id, x) =>
            val w = poissonW(id, b)
            if (w > 0L) {
              val addend = java.math.BigDecimal.valueOf(w.toDouble * x)
                .setScale(12, java.math.RoundingMode.HALF_UP)
              st = BootState(st.sum.add(addend), st.wsum + w)
            }
          }
          state.update(st)
          val m =
            if (st.wsum == 0L) None
            else Some(java.math.BigDecimal
              .valueOf(st.sum.doubleValue() / st.wsum.toDouble)
              .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue())
          BootRep(b, st.wsum, m)
      }
  }

  /** Ingest-time BLOCKLIST screen — the streaming face of
    * [[graft.operators.Cleaning.blocklistScreen]]. The scorer is
    * map-only by construction (broadcast Aho–Corasick automaton, no
    * state, no watermark, no shuffle), so the SAME operator call
    * screens a micro-batch stream unchanged — this alias exists to
    * document the contract and give StreamsSpec a named surface to pin
    * stream ≡ batch on. Emits only the rows the screen keeps. */
  def blocklistScreen(docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], maxHits: Long = 0L): DataFrame =
    graft.operators.Cleaning
      .blocklistScreen(docs, idCol, textCol, patterns, maxHits)
      .filter(col("keep"))
}
