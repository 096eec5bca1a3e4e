package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming face of CDC: a change stream merged micro-batch by
  * micro-batch into a bucketed parquet latest-state table must converge
  * to the same table as one batch-mode upsert over all the changes —
  * and an incremental batch must rewrite only the buckets it touches.
  */
class StreamingUpsertSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("streaming-upsert-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Committed (marker-carrying) snapshot AND delta dirs per bucket
    * under `state`, ascending by version. */
  private def committedDirs(statePath: String): Map[String, Seq[java.io.File]] =
    Option(new java.io.File(statePath).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b-"))
      .map { b =>
        b.getName -> b.listFiles().filter(v => v.isDirectory &&
          (v.getName.startsWith("v-") || v.getName.startsWith("d-")) &&
          new java.io.File(v, "_GRAFT_COMMIT").exists()).toSeq
          .sortBy(_.getName.drop(2).toLong)
      }.toMap

  /** Bytes of the dirs `after` has that `before` does not — what one
    * batch actually wrote and committed. */
  private def newlyCommittedBytes(before: Map[String, Seq[java.io.File]],
      after: Map[String, Seq[java.io.File]]): Long =
    after.map { case (b, vs) =>
      val old = before.getOrElse(b, Seq.empty).map(_.getName).toSet
      vs.filterNot(v => old(v.getName)).map(dirBytes).sum
    }.sum

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(dirBytes).sum

  test("foreachBatch CDC sink converges to the batch upsert of all changes") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Streams.cdcUpsertSink(
      input.toDF().toDF("k", "v", "version", "deleted"),
      statePath, ckpt, Seq("k"), "version", Some("deleted"), nBuckets = 4)
    try {
      // batch 1: three inserts
      input.addData((1L, "a", 1L, false), (2L, "b", 1L, false), (3L, "c", 1L, false))
      q.processAllAvailable()
      // batch 2: update key 1, tombstone key 2, insert key 4
      input.addData((1L, "a2", 2L, false), (2L, "b", 2L, true), (4L, "d", 2L, false))
      q.processAllAvailable()
      // batch 3: stale update for key 1 (version 0) must lose
      input.addData((1L, "stale", 0L, false))
      q.processAllAvailable()
    } finally q.stop()

    val got = Streams.cdcState(spark, statePath)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("version"))).toSet
    assert(got === Set((1L, "a2", 2L), (3L, "c", 1L), (4L, "d", 2L)))

    // retention: at most TWO committed snapshots per bucket (the
    // previous generation stays alive for concurrent readers) and a
    // delta chain shorter than compactEvery
    committedDirs(statePath).foreach { case (b, vs) =>
      val (snaps, deltas) = vs.partition(_.getName.startsWith("v-"))
      assert(snaps.length <= 2, s"bucket $b kept ${snaps.map(_.getName).mkString(",")}")
      assert(deltas.length < 8, s"bucket $b delta chain ${deltas.map(_.getName)}")
    }

    // batch-mode twin over the full change log agrees
    val all = Seq(
      (1L, "a", 1L, false), (2L, "b", 1L, false), (3L, "c", 1L, false),
      (1L, "a2", 2L, false), (2L, "b", 2L, true), (4L, "d", 2L, false),
      (1L, "stale", 0L, false)).toDF("k", "v", "version", "deleted")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      all.drop("deleted").schema)
    val batchTwin = graft.operators.Analytics
      .upsertLatest(empty, all, Seq("k"), "version", Some("deleted"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("version"))).toSet
    assert(batchTwin === got)
  }

  test("equal-version re-emits resolve by batch order, in the delta chain and through compaction") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-tie").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    // an upstream violating the soft monotone-version contract: key 1 is
    // re-emitted at the SAME version with different content in three
    // separate batches. The serial pre-delta sink deterministically let
    // the newest batch win; the delta chain must preserve that rule both
    // when cdcState resolves live deltas and when compaction folds them.
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Streams.cdcUpsertSink(
      input.toDF().toDF("k", "v", "version", "deleted"),
      statePath, ckpt, Seq("k"), "version", Some("deleted"),
      nBuckets = 1, compactEvery = 3)
    try {
      input.addData((1L, "first", 5L, false)) // → v-0 (initial compaction)
      q.processAllAvailable()
      input.addData((1L, "second", 5L, false)) // → d-1
      q.processAllAvailable()
      input.addData((1L, "third", 5L, false)) // → d-2
      q.processAllAvailable()
      // live chain: v-0 + d-1 + d-2 — the reader must pick batch 3's row
      val live = Streams.cdcState(spark, statePath)
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
      assert(live === Set((1L, "third")),
        s"delta-chain tie resolved against batch order: $live")
      assert(!Streams.cdcState(spark, statePath).columns.contains("_graft_seq"),
        "chain-internal sequence column leaked into the state schema")
      // next touch compacts (2 deltas + 1 ≥ compactEvery): the folded
      // snapshot must keep batch 3's row, not a partition-order winner
      input.addData((2L, "other", 1L, false))
      q.processAllAvailable()
      val compacted = Streams.cdcState(spark, statePath)
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
      assert(compacted === Set((1L, "third"), (2L, "other")),
        s"compaction tie resolved against batch order: $compacted")
    } finally q.stop()
  }

  test("incremental batch rewrites only the touched buckets, not the state") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-buckets").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Streams.cdcUpsertSink(
      input.toDF().toDF("k", "v", "version", "deleted"),
      statePath, ckpt, Seq("k"), "version", Some("deleted"), nBuckets = 8)
    try {
      // seed: 64 keys spread across the 8 buckets
      input.addData((1L to 64L).map(k => (k, s"v$k", 1L, false)): _*)
      q.processAllAvailable()
      val afterSeed = committedDirs(statePath)
      val seededBuckets = afterSeed.filter(_._2.nonEmpty).keySet
      assert(seededBuckets.size > 1, s"want several buckets, got $seededBuckets")
      val versionsBefore = afterSeed.map { case (b, vs) =>
        b -> vs.map(_.getName) }

      // incremental: ONE key updated
      input.addData((7L, "v7b", 2L, false))
      q.processAllAvailable()

      val after = committedDirs(statePath)
      val changed = after.filter { case (b, vs) =>
        vs.map(_.getName) != versionsBefore.getOrElse(b, Seq.empty) }.keySet
      assert(changed.size === 1,
        s"one-key batch must touch exactly one bucket, touched $changed")
      // bytes rewritten by the incremental batch = the touched bucket's
      // newest version — strictly less than the whole state
      val rewritten = dirBytes(after(changed.head).last)
      val total = dirBytes(new java.io.File(statePath))
      assert(rewritten * 2 < total,
        s"rewrote $rewritten of $total bytes — not incremental")
    } finally q.stop()

    // and the state is still right
    val got = Streams.cdcState(sp, statePath)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(got.size === 64 && got.contains((7L, "v7b")))
  }

  test("delta chain: hot batches write O(batch) deltas; compaction bounds the chain") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-lsm").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"

    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Streams.cdcUpsertSink(
      input.toDF().toDF("k", "v", "version", "deleted"),
      statePath, s"${dir.getAbsolutePath}/ckpt", Seq("k"), "version",
      Some("deleted"), nBuckets = 4, compactEvery = 3)
    try {
      // seed: snapshots (first commit per bucket is always a snapshot).
      // Values are KBs of incompressible noise so bucket snapshots dwarf
      // parquet's fixed ~1 KB per-file overhead — the delta-vs-snapshot
      // byte ratio then reflects data volume, not footer noise.
      input.addData((1L to 8L).map { k =>
        val rnd = new scala.util.Random(k)
        (k, Seq.fill(8192)(rnd.nextPrintableChar()).mkString, 1L, false)
      }: _*)
      q.processAllAvailable()
      val seeded = committedDirs(statePath)
      assert(seeded.values.flatten.forall(_.getName.startsWith("v-")))
      val hotBucket = { // the bucket key 7 hashes into
        input.addData((7L, "h2", 2L, false)); q.processAllAvailable()
        committedDirs(statePath).find { case (b, vs) =>
          vs.map(_.getName) != seeded.getOrElse(b, Seq.empty).map(_.getName) }.get._1
      }
      val snapBytes = dirBytes(seeded(hotBucket).last)

      // drive the hot key through two compaction cycles, checking every
      // batch's write volume and the bucket layout as the chain grows
      var before = committedDirs(statePath)
      for (ver <- 3L to 8L) {
        input.addData((7L, s"h$ver", ver, false))
        q.processAllAvailable()
        val after = committedDirs(statePath)
        val wrote = newlyCommittedBytes(before, after)
        val kinds = after(hotBucket).map(_.getName)
        val newDirs = kinds.toSet -- before(hotBucket).map(_.getName).toSet
        if (newDirs.head.startsWith("d-")) {
          // a delta batch writes ~one row, never a bucket rewrite
          assert(wrote * 4 < snapBytes,
            s"delta batch for one key wrote $wrote B vs $snapBytes B snapshot")
        }
        // read amplification stays bounded: chain after the latest
        // snapshot is always < compactEvery
        val lastSnap = kinds.lastIndexWhere(_.startsWith("v-"))
        assert(kinds.drop(lastSnap + 1).length < 3,
          s"delta chain exceeded compactEvery: $kinds")
        // and the merged state is correct after every batch
        assert(Streams.cdcState(sp, statePath).filter($"k" === 7L)
          .collect().head.getAs[String]("v") === s"h$ver")
        before = after
      }
      // compactions happened (hot bucket has a snapshot newer than v-0)
      // and retired the pre-previous generation
      val kinds = committedDirs(statePath)(hotBucket).map(_.getName)
      assert(kinds.count(_.startsWith("v-")) <= 2, s"kept too many snapshots: $kinds")
      assert(kinds.exists(n => n.startsWith("v-") && n != "v-0"),
        s"no compaction ever ran: $kinds")
      assert(Streams.cdcState(sp, statePath).count() === 8)
    } finally q.stop()
  }

  test("compactEvery=1 pins the merge-every-batch layout: no delta dirs") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-nodelt").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Streams.cdcUpsertSink(
      input.toDF().toDF("k", "v", "version", "deleted"),
      statePath, s"${dir.getAbsolutePath}/ckpt", Seq("k"), "version",
      Some("deleted"), nBuckets = 2, compactEvery = 1)
    try {
      for (ver <- 1L to 3L) {
        input.addData((1L, s"v$ver", ver, false), (2L, s"w$ver", ver, false))
        q.processAllAvailable()
      }
    } finally q.stop()
    val dirs = committedDirs(statePath)
    assert(dirs.values.flatten.forall(_.getName.startsWith("v-")),
      s"compactEvery=1 wrote deltas: ${dirs.values.flatten.map(_.getName)}")
    dirs.foreach { case (b, vs) =>
      assert(vs.length <= 2, s"bucket $b kept ${vs.map(_.getName)}")
    }
    val got = Streams.cdcState(sp, statePath)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(got === Set((1L, "v3"), (2L, "w3")))
  }

  test("touched buckets merge concurrently, not as a serial per-bucket loop") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-par").toFile
    dir.deleteOnExit()

    Streams.BucketMergeGauge.reset()
    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Streams.cdcUpsertSink(
      input.toDF().toDF("k", "v", "version", "deleted"),
      s"${dir.getAbsolutePath}/state", s"${dir.getAbsolutePath}/ckpt",
      Seq("k"), "version", Some("deleted"), nBuckets = 8, maxConcurrentBuckets = 8)
    try {
      // 64 keys spread over all 8 buckets → one batch, 8 bucket merges
      input.addData((1L to 64L).map(k => (k, s"v$k", 1L, false)): _*)
      q.processAllAvailable()
    } finally q.stop()

    // the merges must have OVERLAPPED: with 8 buckets submitted to an
    // 8-thread pool, at least two were in flight at once (each merge is
    // a multi-job read+merge+write — far longer than thread startup)
    assert(Streams.BucketMergeGauge.peak >= 2,
      s"bucket merges serialized: peak concurrency ${Streams.BucketMergeGauge.peak}")
    val got = Streams.cdcState(sp, s"${dir.getAbsolutePath}/state").count()
    assert(got === 64)
  }

  test("hot-key workload at nBuckets=256: per-batch bytes bounded by bucket size") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-hot").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"

    val input = MemoryStream[(Long, String, Long, Boolean)]
    val q = Streams.cdcUpsertSink(
      input.toDF().toDF("k", "v", "version", "deleted"),
      statePath, s"${dir.getAbsolutePath}/ckpt", Seq("k"), "version",
      Some("deleted"), nBuckets = 256)
    try {
      // seed state across a few dozen of the 256 buckets
      input.addData((1L to 48L).map(k => (k, s"seed$k" * 8, 1L, false)): _*)
      q.processAllAvailable()
      val totalAfterSeed = dirBytes(new java.io.File(statePath))

      // hot-key workload: the SAME key updated batch after batch
      val perBatch = (2L to 4L).map { ver =>
        val before = committedDirs(statePath).map { case (b, vs) =>
          b -> vs.map(_.getName) }
        input.addData((7L, s"hot$ver", ver, false))
        q.processAllAvailable()
        val after = committedDirs(statePath)
        val changed = after.filter { case (b, vs) =>
          vs.map(_.getName) != before.getOrElse(b, Seq.empty) }.keys
        assert(changed.size === 1, s"hot key touched $changed")
        dirBytes(after(changed.head).last)
      }
      // every hot batch rewrites ~one bucket (1–2 keys of 48), never a
      // state-sized amount — the write amplification the bucketing and
      // the docstring's nBuckets sizing rule exist to bound
      perBatch.foreach { bytes =>
        assert(bytes * 8 < totalAfterSeed,
          s"hot-key batch rewrote $bytes of $totalAfterSeed state bytes")
      }
    } finally q.stop()
    assert(Streams.cdcState(sp, statePath).filter($"k" === 7L)
      .collect().head.getAs[String]("v") === "hot4")
  }

  test("two sinks racing on an empty state dir agree on one pinned bucket count") {
    val dir = Files.createTempDirectory("graft-cdc-race").toFile
    dir.deleteOnExit()
    val root = new org.apache.hadoop.fs.Path(s"${dir.getAbsolutePath}/state")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // drive the pin API exactly as two concurrently-starting sinks would:
    // many threads, different requested counts, one winner
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val pins = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((0 until 16).map { i =>
          scala.concurrent.Future(Streams.ensureBucketCount(fs, root, 4 + i))
        }),
        scala.concurrent.duration.Duration(30, "s"))
      assert(pins.toSet.size === 1,
        s"racing sinks saw different bucket counts: ${pins.toSet}")
      // and the pin is durable: a later reader sees the same value
      assert(Streams.ensureBucketCount(fs, root, 999) === pins.head)
    } finally pool.shutdown()
  }

  test("CDC sink survives a crashed partial snapshot and a query restart") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-crash").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"
    val ckpt = s"${dir.getAbsolutePath}/ckpt"

    val in1 = MemoryStream[(Long, String, Long, Boolean)]
    val q1 = Streams.cdcUpsertSink(
      in1.toDF().toDF("k", "v", "version", "deleted"),
      statePath, ckpt, Seq("k"), "version", Some("deleted"), nBuckets = 2)
    try {
      in1.addData((1L, "a", 1L, false), (2L, "b", 1L, false))
      q1.processAllAvailable()
    } finally q1.stop()

    // simulate a crash mid-write of the NEXT snapshot of some bucket: a
    // v- dir with data but NO _GRAFT_COMMIT marker must be invisible to
    // readers and get clobbered by the next attempt. A bare _SUCCESS (the
    // committer's marker) must NOT count as committed.
    val seeded = committedDirs(statePath).filter(_._2.nonEmpty).keys.head
    val partial = new java.io.File(new java.io.File(statePath, seeded), "v-1")
    assert(partial.mkdirs())
    java.nio.file.Files.write(partial.toPath.resolve("part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(partial.toPath.resolve("_SUCCESS"), Array[Byte]())
    val before = Streams.cdcState(sp, statePath)
      .collect().map(_.getAs[Long]("k")).toSet
    assert(before === Set(1L, 2L)) // still the committed snapshot

    // restart the stream from the same checkpoint with more changes
    val in2 = MemoryStream[(Long, String, Long, Boolean)]
    val q2 = Streams.cdcUpsertSink(
      in2.toDF().toDF("k", "v", "version", "deleted"),
      statePath, ckpt, Seq("k"), "version", Some("deleted"), nBuckets = 2)
    try {
      in2.addData((1L, "a", 1L, false), (2L, "b", 1L, false)) // replayed offsets
      in2.addData((2L, "b2", 2L, false), (3L, "c", 2L, false))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = Streams.cdcState(sp, statePath)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("version"))).toSet
    assert(got === Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 2L)))
  }

  test("a restart with a different nBuckets argument keeps the pinned bucketing") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val dir = Files.createTempDirectory("graft-cdc-meta").toFile
    dir.deleteOnExit()
    val statePath = s"${dir.getAbsolutePath}/state"

    val in1 = MemoryStream[(Long, String, Long, Boolean)]
    val q1 = Streams.cdcUpsertSink(
      in1.toDF().toDF("k", "v", "version", "deleted"),
      statePath, s"${dir.getAbsolutePath}/ckpt1", Seq("k"), "version",
      Some("deleted"), nBuckets = 4)
    try {
      in1.addData((1L to 16L).map(k => (k, s"v$k", 1L, false)): _*)
      q1.processAllAvailable()
    } finally q1.stop()

    // second query asks for 16 buckets — the meta file pins 4, so every
    // key still routes to its original bucket
    val in2 = MemoryStream[(Long, String, Long, Boolean)]
    val q2 = Streams.cdcUpsertSink(
      in2.toDF().toDF("k", "v", "version", "deleted"),
      statePath, s"${dir.getAbsolutePath}/ckpt2", Seq("k"), "version",
      Some("deleted"), nBuckets = 16)
    try {
      in2.addData((1L to 16L).map(k => (k, s"w$k", 2L, false)): _*)
      q2.processAllAvailable()
    } finally q2.stop()

    val buckets = committedDirs(statePath).filter(_._2.nonEmpty).keySet
    assert(buckets.forall(_.stripPrefix("b-").toInt < 4),
      s"keys leaked outside the pinned 4-bucket layout: $buckets")
    val got = Streams.cdcState(sp, statePath)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(got === (1L to 16L).map(k => (k, s"w$k")).toSet)
  }
}
