package graft.schema

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Hive-FORMAT catalog tables (no analysis-time file listing; read through
  * the Hive serde, not HadoopFsRelation) must be narrowed by the
  * auto-apply rule via their "catalog:" relation key — the arm the
  * reference never had (it matched only LogicalRelation,
  * TreeNodeProcessingRegistry.java:25-30).
  *
  * `convertMetastoreParquet` is disabled so the analyzed plan genuinely
  * holds a [[HiveTableRelation]] (with it on, Spark converts to a
  * datasource relation and the DSv1 path covers it).
  */
class HiveRuleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val wh = Files.createTempDirectory("graft-hive-wh").toString
    val metastore = Files.createTempDirectory("graft-hive-ms").toString
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("hive-rule-spec")
      .config("spark.sql.extensions", "graft.schema.GraftExtensions")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", wh)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore/metastore_db;create=true")
      .config("spark.sql.hive.convertMetastoreParquet", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("DROP TABLE IF EXISTS graft_hive_t")
    spark.sql(
      """CREATE TABLE graft_hive_t (
        |  id BIGINT,
        |  big STRUCT<keep: BIGINT, drop1: STRING, drop2: STRING>
        |) STORED AS PARQUET""".stripMargin)
    val rows = (1 to 40).map(i => (i.toLong, (i.toLong, s"a$i", s"b$i")))
    spark.createDataFrame(rows).toDF("id", "big")
      .write.mode("overwrite").insertInto("graft_hive_t")
  }

  override def afterAll(): Unit = if (spark != null) {
    spark.sql("DROP TABLE IF EXISTS graft_hive_t")
    spark.stop()
  }

  private def withRuleOff[A](f: => A): A = {
    spark.conf.set("spark.graft.schemaOnRead.enabled", "false")
    try f finally spark.conf.set("spark.graft.schemaOnRead.enabled", "true")
  }

  test("generator analyzes a hive relation and registers it by table name") {
    val q = spark.table("graft_hive_t").select(col("id"), col("big.keep").as("k"))
    assert(q.queryExecution.analyzed.exists(_.isInstanceOf[HiveTableRelation]),
      "plan lost its HiveTableRelation — convertMetastoreParquet kicked in?")
    val res = SchemaOnRead.generate(q)
    val s = res.schemaForTable("graft_hive_t")
    assert(s.isDefined)
    val big = s.get.find(_.name == "big").get.dataType.asInstanceOf[StructType]
    assert(big.fieldNames.toSeq == Seq("keep"), s"got $big")
  }

  test("auto-apply rule narrows the hive scan; results are rule-invariant") {
    // fresh Dataset per phase: a Dataset's optimizedPlan is computed once,
    // so reusing one across the rule toggle would pin the rule-off plan
    def mk = spark.table("graft_hive_t")
      .filter(col("big.keep") > 5)
      .select(col("id"), col("big.keep").as("k"))
    val expected = withRuleOff(mk.collect().toSet)
    val q = mk
    assert(q.collect().toSet == expected)
    assert(q.schema == withRuleOff(mk.schema))
    val metas = q.queryExecution.optimizedPlan.collect {
      case h: HiveTableRelation => h.tableMeta.schema
    }
    assert(metas.nonEmpty, "no HiveTableRelation survived to the optimized plan")
    val big = metas.head.find(_.name == "big").get.dataType.asInstanceOf[StructType]
    assert(big.fieldNames.toSeq == Seq("keep"), s"hive scan not narrowed: $big")
  }

  test("whole-struct demand keeps the hive schema intact") {
    def mk = spark.table("graft_hive_t").select(col("big"), col("id"))
    val expected = withRuleOff(mk.collect().toSet)
    val q = mk
    assert(q.collect().toSet == expected)
    assert(q.schema == withRuleOff(mk.schema))
  }
}
