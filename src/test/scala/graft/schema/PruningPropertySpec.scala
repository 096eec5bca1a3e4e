package graft.schema

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5 property: for a random nested query over a nested schema,
  * (a) running it against a re-read with the generated pruned schema
  * yields exactly the full-read results, and (b) the pruned schema never
  * has more leaves than the full one. */
class PruningPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var pqPath: String = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder().master("local[2]")
      .appName("pruning-property-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft-prop").toString
    val rows = (1 to 40).map { i =>
      s"""{"someStr":"s$i","someLong":$i,"someDouble":${i * 1.5},
         |"struct":{"col1":${i * 10},"col2":${i % 5},"col3":${i % 3},"subArray":[$i,${i + 1}]},
         |"nestedStruct":{"childStruct":{"col1":${i % 7},"col2":$i},"str":"n$i"},
         |"someComplexArray":[{"col1":$i,"col2":${i + 2}}]}""".stripMargin.replace("\n", "")
    }
    Files.writeString(Paths.get(s"$dir/d.json"), rows.mkString("\n"))
    pqPath = s"$dir/p"
    spark.read.json(s"$dir/d.json").write.parquet(pqPath)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // pool of projections (name -> column builder) over valid nested paths
  private val projections: Seq[(String, () => Column)] = Seq(
    "someLong" -> (() => col("someLong")),
    "someStr" -> (() => col("someStr")),
    "c1" -> (() => col("struct.col1").as("c1")),
    "c2" -> (() => col("struct.col2").as("c2")),
    "sub" -> (() => col("struct.subArray").as("sub")),
    "nc1" -> (() => col("nestedStruct.childStruct.col1").as("nc1")),
    "nstr" -> (() => col("nestedStruct.str").as("nstr")),
    "arr0" -> (() => element_at(col("someComplexArray"), 1).getField("col2").as("arr0")),
    "whole" -> (() => col("struct").as("whole")))

  private val predicates: Seq[() => Column] = Seq(
    () => col("struct.col3") === 0,
    () => col("someLong") > 10,
    () => col("nestedStruct.str").isNotNull,
    () => element_at(col("struct.subArray"), 1) % 2 === 0)

  private case class RandomQuery(projIdx: Seq[Int], predIdx: Option[Int], agg: Boolean) {
    def apply(df: DataFrame): DataFrame = {
      val base = predIdx.map(i => df.filter(predicates(i)())).getOrElse(df)
      val cols = projIdx.map(i => projections(i)._2())
      if (agg)
        base.groupBy(cols.head).agg(count(lit(1)).as("n"))
          .orderBy(projections(projIdx.head)._1, "n")
      else base.select(cols: _*).orderBy(col("someLong"))
    }
  }

  private val genQuery: Gen[RandomQuery] = for {
    k <- Gen.choose(1, 4)
    idx <- Gen.pick(k, projections.indices)
    pred <- Gen.option(Gen.choose(0, predicates.length - 1))
    agg <- Gen.oneOf(true, false)
    // groupBy head must not be the array-typed "sub" (order-by on arrays is
    // fine; grouping key array works too, keep it — but exclude nothing)
  } yield RandomQuery(idx.toSeq, pred, agg)

  test("pruned re-read is result-identical for random nested queries") {
    val full = spark.read.parquet(pqPath)
    val fullLeaves = PlanRewriter.leafCount(full.schema)
    val prop = Prop.forAll(genQuery) { rq =>
      val expected = rq(full).collect().map(_.toString).toSeq
      val result = SchemaOnRead.generate(rq(full))
      val pruned = result.schemas.head._2
      val rereadRows = rq(spark.read.schema(pruned).parquet(pqPath))
        .collect().map(_.toString).toSeq
      rereadRows == expected && PlanRewriter.leafCount(pruned) <= fullLeaves
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
