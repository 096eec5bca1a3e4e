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

  /** Committed (marker-carrying) version dirs per bucket under `state`. */
  private def committedDirs(statePath: String): Map[String, Seq[java.io.File]] =
    Option(new java.io.File(statePath).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b-"))
      .map { b =>
        b.getName -> b.listFiles().filter(v => v.isDirectory &&
          v.getName.startsWith("v-") &&
          new java.io.File(v, "_GRAFT_COMMIT").exists()).toSeq.sortBy(_.getName)
      }.toMap

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

    // retention: at most the newest TWO committed versions per bucket
    // (the previous one stays alive for concurrent readers)
    committedDirs(statePath).foreach { case (b, vs) =>
      assert(vs.length <= 2, s"bucket $b kept ${vs.map(_.getName).mkString(",")}")
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
