package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming face of CDC: a change stream merged micro-batch by
  * micro-batch into a parquet latest-state snapshot must converge to the
  * same table as one batch-mode upsert over all the changes.
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

  private case class Change(k: Long, v: String, version: Long, deleted: Boolean)

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
      statePath, ckpt, Seq("k"), "version", Some("deleted"))
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

    // superseded snapshots are retired: exactly one committed version left
    val stateDirs = new java.io.File(statePath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("v-"))
    assert(stateDirs.length === 1, s"expected 1 snapshot, got ${stateDirs.mkString(",")}")

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
      statePath, ckpt, Seq("k"), "version", Some("deleted"))
    try {
      in1.addData((1L, "a", 1L, false), (2L, "b", 1L, false))
      q1.processAllAvailable()
    } finally q1.stop()

    // simulate a crash mid-write of the NEXT snapshot: a v- dir with
    // data but NO _SUCCESS marker must be invisible to readers and get
    // clobbered by the next attempt
    val partial = new java.io.File(statePath, "v-1")
    assert(partial.mkdirs())
    java.nio.file.Files.write(partial.toPath.resolve("part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    val before = Streams.cdcState(sp, statePath)
      .collect().map(_.getAs[Long]("k")).toSet
    assert(before === Set(1L, 2L)) // still the committed snapshot

    // restart the stream from the same checkpoint with more changes
    val in2 = MemoryStream[(Long, String, Long, Boolean)]
    val q2 = Streams.cdcUpsertSink(
      in2.toDF().toDF("k", "v", "version", "deleted"),
      statePath, ckpt, Seq("k"), "version", Some("deleted"))
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
}
