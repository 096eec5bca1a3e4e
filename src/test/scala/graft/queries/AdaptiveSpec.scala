package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime re-planning evidence: AQE is the third leg of the repo's
  * skew strategy (salting `SkewJoins.saltedEquiJoin` for known-hot keys,
  * map-side-combining two-phase aggs everywhere, AQE for the skew
  * nobody predicted). [[PlanQualitySpec]] pins static shapes with AQE
  * OFF; this suite pins that with AQE ON the engine actually SPLITS a
  * skewed join partition and COALESCES fragmented shuffle output at
  * runtime — the behaviors a 1000-executor job relies on when one key
  * holds 1% of 100 TB.
  */
class AdaptiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[4]")
      .appName("adaptive-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds sized to the fixture: the hot key's partition (~2 MB)
      // must exceed both factor × median and the absolute floor
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    val sp = spark; import sp.implicits._
    // one hot key carries ~10k fat rows (~2.5 MB in one shuffle
    // partition), 40 cold keys carry 10 rows each — the unpredicted-skew
    // shape. The payload must be INCOMPRESSIBLE: skew detection reads
    // compressed shuffle sizes, and a constant pad lz4-compresses to
    // nothing (observed: the hot partition fell under every threshold)
    def pad(i: Int): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until 8).map(j => md.digest(s"$i:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    }
    val fact = ((1 to 10000).map(_ => "hot") ++
        (1 to 400).map(i => s"cold${i % 40}"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong, pad(i)) }
      .toDF("k", "id", "payload")
    val dim = (Seq("hot") ++ (0 until 40).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "w")
    // the downstream agg must NOT require the join key's partitioning
    // (a groupBy(k) right after would veto the split: AQE refuses to
    // break a reusable distribution), and it must consume the payload
    // so column pruning can't strip the bytes that make the skew
    val joined = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
    val row = joined.collect().head
    // correctness first: the split must not change the answer
    assert(row.getLong(0) === 10400L && row.getLong(1) === 10400L * 256)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"),
      s"AQE did not finalize:\n${plan.take(2000)}")
    assert(plan.contains("skew=true"),
      s"AQE never marked the hot partition as skewed:\n${plan.take(4000)}")
  }

  test("AQE coalesces fragmented shuffle partitions at runtime") {
    val sp = spark; import sp.implicits._
    // 8 shuffle partitions over a few KB of data: AQE should read them
    // back as fewer, advisory-sized partitions
    val tiny = (1 to 200).map(i => (i % 50, i.toLong)).toDF("k", "v")
    val agg = tiny.groupBy("k").agg(sum("v").as("s"))
    assert(agg.collect().length === 50)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("coalesced") || plan.contains("AQEShuffleRead"),
      s"AQE never coalesced the shuffle read:\n${plan.take(4000)}")
    val parts = agg.rdd.getNumPartitions
    assert(parts < 8, s"still $parts partitions — no runtime coalesce")
  }
}
