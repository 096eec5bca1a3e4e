package graft.schema

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's golden-schema scenarios
  * (score SchemaOnReadGeneratorTest.java, 67 tests — see SURVEY.md §5)
  * against fixtures rebuilt from FIXTURES.md, plus result-equality checks
  * the reference lacked (it only verified executability).
  */
class SchemaOnReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _
  private def jsonPath = s"$dir/sample.json"
  private def json2Path = s"$dir/sample2.json"
  private def crazyPath = s"$dir/crazy.json"
  private def parquetPath = s"$dir/sample-parquet"
  private def partitionedPath = s"$dir/sample-partitioned"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("schema-on-read-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("graft-sor").toString

    // F1 `sample` — one row covering every nesting combination.
    val sampleRow =
      """{"someStr":"abc","someLong":12,"someDouble":1.5,"someBoolean":true,
        |"someStrArray":["a","b"],
        |"someComplexArray":[{"col1":1,"col2":2}],
        |"struct":{"col1":10,"col2":20,"col3":30,"subArray":[7,8]},
        |"nestedStruct":{"childStruct":{"col1":5,"col2":6},"str":"xyz"},
        |"someArrayOfArrays":[[1,2],[3]],
        |"someArrayOfComplexArrays":[{"col1":1,"col2":[4,5],"col3":9}]}""".stripMargin.replace("\n", "")
    Files.writeString(Paths.get(jsonPath), sampleRow)
    val sample2Row = sampleRow.replace("\"someLong\":12", "\"someLong\":13")
    Files.writeString(Paths.get(json2Path), sample2Row)

    // F2 `crazy` — F1 plus condition flag + depth-4 repetition.
    val crazyRow =
      """{"someStr":"abc","someLong":12,
        |"struct":{"col1":10,"col2":20,"col3":30,"condition":true,"subArray":[7,8]},
        |"crazyStruct":{"justAString":"s","repeatedStuff":[
        |  {"justABool":true,"longArray":[1,2],
        |   "anotherRepeatedStuff":[{"innerField1":"a","innerField2":"b"}]}]}}"""
        .stripMargin.replace("\n", "")
    Files.writeString(Paths.get(crazyPath), crazyRow)

    val df = spark.read.json(jsonPath)
    df.write.mode("overwrite").parquet(parquetPath)
    df.union(spark.read.json(json2Path))
      .write.mode("overwrite").partitionBy("someLong").parquet(partitionedPath)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- helpers -------------------------------------------------------

  private def jsonDF: DataFrame = spark.read.json(jsonPath)
  private def parquetDF: DataFrame = spark.read.parquet(parquetPath)

  /** Order-insensitive recursive schema equality (reference
    * assertSchemasEqual:1719-1724 did a two-way seq diff). */
  private def schemasEqual(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      x.fields.length == y.fields.length &&
        x.fields.forall(f => y.fields.find(_.name.equalsIgnoreCase(f.name))
          .exists(g => schemasEqual(f.dataType, g.dataType)))
    case (ArrayType(x, _), ArrayType(y, _)) => schemasEqual(x, y)
    case (MapType(xk, xv, _), MapType(yk, yv, _)) =>
      schemasEqual(xk, yk) && schemasEqual(xv, yv)
    case (x, y) => x == y
  }

  private def assertSchema(actual: Option[StructType], expected: StructType): Unit = {
    assert(actual.isDefined, "no pruned schema produced")
    assert(schemasEqual(actual.get, expected),
      s"\nactual:   ${actual.get.toDDL}\nexpected: ${expected.toDDL}")
  }

  /** The single relation's pruned schema. */
  private def pruned(df: DataFrame): Option[StructType] = {
    val r = SchemaOnRead.generate(df)
    assert(r.schemas.size == 1, s"expected 1 relation, got ${r.schemas.keySet}")
    r.schemas.headOption.map(_._2)
  }

  private def fld(name: String, t: DataType): StructField = StructField(name, t, nullable = true)
  private def st(fields: StructField*): StructType = StructType(fields)
  private def arr(t: DataType): ArrayType = ArrayType(t)

  private val structType =
    st(fld("col1", LongType), fld("col2", LongType), fld("col3", LongType),
      fld("subArray", arr(LongType)))
  private val nestedStructType =
    st(fld("childStruct", st(fld("col1", LongType), fld("col2", LongType))),
      fld("str", StringType))

  // ---- projections & filters ----------------------------------------

  test("simple nested select prunes to accessed leaves") {
    val df = jsonDF.select(col("someLong"), col("nestedStruct.str"), col("struct.col1"))
    assertSchema(pruned(df), st(
      fld("someLong", LongType),
      fld("nestedStruct", st(fld("str", StringType))),
      fld("struct", st(fld("col1", LongType)))))
  }

  test("where-clause-only column is required at leaf level") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT sample_json.someLong, sample_json.nestedStruct.str, sample_json.struct.col1
        |FROM sample_json WHERE struct.col3 = 10""".stripMargin)
    val r = SchemaOnRead.generate(q)
    val expected = st(
      fld("someLong", LongType),
      fld("nestedStruct", st(fld("str", StringType))),
      fld("struct", st(fld("col1", LongType), fld("col3", LongType))))
    assertSchema(r.schemas.headOption.map(_._2), expected)
    assertSchema(r.schemaForView("sample_json"), expected)
  }

  test("select * keeps full schema") {
    val df = jsonDF
    assertSchema(pruned(df.select(col("*"))), df.schema)
  }

  test("filter-only query keeps full schema") {
    val df = jsonDF
    assertSchema(pruned(df.filter(col("someLong") > 0)), df.schema)
  }

  test("inner select unused complex column becomes skeleton") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """WITH base AS (SELECT someLong AS myLong, struct FROM sample_json)
        |SELECT myLong FROM base""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someLong", LongType),
      fld("struct", st())))
  }

  test("alias narrows through subquery") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """WITH base AS (SELECT struct AS myStruct FROM sample_json)
        |SELECT myStruct.col1 FROM base""".stripMargin)
    assertSchema(pruned(q), st(fld("struct", st(fld("col1", LongType)))))
  }

  test("dropped columns vanish; untouched complex passthrough becomes skeleton") {
    val df = jsonDF.drop("someStr", "someArrayOfComplexArrays").select("someLong")
    assertSchema(pruned(df), st(
      fld("someLong", LongType),
      fld("someDouble", DoubleType),
      fld("someBoolean", BooleanType),
      fld("someStrArray", arr(StringType)),
      fld("someComplexArray", arr(st())),
      fld("struct", st()),
      fld("nestedStruct", st()),
      fld("someArrayOfArrays", arr(arr(LongType)))))
  }

  test("top-level select of complex column keeps its full subtree") {
    val df = jsonDF.select(col("someArrayOfComplexArrays"))
    assertSchema(pruned(df), st(
      fld("someArrayOfComplexArrays",
        arr(st(fld("col1", LongType), fld("col2", arr(LongType)), fld("col3", LongType))))))
  }

  // ---- aggregates ----------------------------------------------------

  test("group by leaves + sum of nested path") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT someLong, nestedStruct.str, sum(struct.col1) AS total
        |FROM sample_json GROUP BY 1, nestedStruct.str""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someLong", LongType),
      fld("nestedStruct", st(fld("str", StringType))),
      fld("struct", st(fld("col1", LongType)))))
  }

  test("group by whole struct demands full subtree") {
    val df = jsonDF.groupBy(col("struct")).agg(count(lit(1)).as("n"))
    assertSchema(pruned(df), st(fld("struct", structType)))
  }

  test("group by struct, aggregate struct part") {
    val df = jsonDF.groupBy(col("struct")).agg(max(col("struct.col1")).as("m"))
    assertSchema(pruned(df), st(fld("struct", structType)))
  }

  test("group by struct part, aggregate only leaves") {
    val df = jsonDF.groupBy(col("struct.col2")).agg(sum(col("struct.col1")).as("s"))
    assertSchema(pruned(df), st(
      fld("struct", st(fld("col1", LongType), fld("col2", LongType)))))
  }

  test("count(1) group-by prunes to grouping column") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql("SELECT someLong, count(1) AS c FROM sample_json GROUP BY someLong")
    assertSchema(pruned(q), st(fld("someLong", LongType)))
  }

  test("conditional aggregation sum(if(...)) touches condition and value") {
    spark.read.json(crazyPath).createOrReplaceTempView("crazy_json")
    val q = spark.sql(
      """SELECT someLong, sum(if(struct.condition, struct.col1, 0)) AS s
        |FROM crazy_json GROUP BY someLong""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someLong", LongType),
      fld("struct", st(fld("col1", LongType), fld("condition", BooleanType)))))
  }

  // ---- sort / window -------------------------------------------------

  test("order by complex value demands full subtree") {
    val df = jsonDF.select(col("someLong")).orderBy(col("someLong")) // warm shape
    assertSchema(pruned(df), st(fld("someLong", LongType)))
    val df2 = jsonDF.orderBy(col("struct")).select(col("someLong"))
    assertSchema(pruned(df2), st(fld("someLong", LongType), fld("struct", structType)))
  }

  test("window partition/order are mandatory; window input pruned") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT first(struct.col1) OVER (PARTITION BY someStr ORDER BY someLong) AS f
        |FROM sample_json""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someStr", StringType),
      fld("someLong", LongType),
      fld("struct", st(fld("col1", LongType)))))
  }

  test("window with complex partition demands full subtree") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT first(someLong) OVER (PARTITION BY struct ORDER BY someLong) AS f
        |FROM sample_json""".stripMargin)
    assertSchema(pruned(q), st(fld("someLong", LongType), fld("struct", structType)))
  }

  test("window frame spec with first_value/last_value") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT first_value(struct.col2) OVER
        |  (PARTITION BY someStr ORDER BY someLong
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v
        |FROM sample_json WHERE someDouble > 0""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someStr", StringType),
      fld("someLong", LongType),
      fld("someDouble", DoubleType),
      fld("struct", st(fld("col2", LongType)))))
  }

  // ---- joins / unions ------------------------------------------------

  test("join condition columns are mandatory; two sources pruned separately") {
    val a = spark.read.json(jsonPath)
    val b = spark.read.json(json2Path)
    val q = a.join(b, a("someLong") === b("someLong"))
      .select(a("nestedStruct.str"), b("struct.col1"))
    val r = SchemaOnRead.generate(q)
    assert(r.schemas.size == 2)
    assertSchema(r.schemaFor(jsonPath), st(
      fld("someLong", LongType),
      fld("nestedStruct", st(fld("str", StringType)))))
    assertSchema(r.schemaFor(json2Path), st(
      fld("someLong", LongType),
      fld("struct", st(fld("col1", LongType)))))
  }

  test("self-join keeps one relation with merged demand") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT a.nestedStruct.str FROM sample_json a
        |JOIN sample_json b ON a.someLong = b.someLong""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someLong", LongType),
      fld("nestedStruct", st(fld("str", StringType)))))
  }

  test("broadcast hint is transparent") {
    val a = spark.read.json(jsonPath)
    val b = spark.read.json(json2Path)
    val q = a.join(broadcast(b), a("someLong") === b("someLong")).select(a("someStr"))
    val r = SchemaOnRead.generate(q)
    assertSchema(r.schemaFor(jsonPath), st(
      fld("someLong", LongType), fld("someStr", StringType)))
    assertSchema(r.schemaFor(json2Path), st(fld("someLong", LongType)))
  }

  test("implicit cross join with WHERE condition prunes like an ON join") {
    jsonDF.createOrReplaceTempView("sample_json")
    spark.read.json(json2Path).createOrReplaceTempView("sample_json2")
    val q = spark.sql(
      """SELECT a.someLong, a.someStr, b.struct.col1
        |FROM sample_json a, sample_json2 b
        |WHERE a.someLong = b.someLong""".stripMargin)
    val r = SchemaOnRead.generate(q)
    assertSchema(r.schemaFor(jsonPath), st(
      fld("someLong", LongType), fld("someStr", StringType)))
    assertSchema(r.schemaFor(json2Path), st(
      fld("someLong", LongType), fld("struct", st(fld("col1", LongType)))))
  }

  test("API join with USING column and post-select") {
    val a = spark.read.json(jsonPath)
    val b = spark.read.json(json2Path)
    val q = a.select(a("someLong"), a("someStr"))
      .join(b.select(b("someLong"), b("struct.col3")), "someLong")
      .select("someLong", "someStr", "col3")
    val r = SchemaOnRead.generate(q)
    assertSchema(r.schemaFor(jsonPath), st(
      fld("someLong", LongType), fld("someStr", StringType)))
    assertSchema(r.schemaFor(json2Path), st(
      fld("someLong", LongType), fld("struct", st(fld("col3", LongType)))))
  }

  test("local relation side of a join does not pollute pruning") {
    val local = spark.createDataFrame(Seq((12L, "x"))).toDF("id", "tag")
    val j = jsonDF
    val q = j.join(local, j("someLong") === local("id"))
      .select(col("nestedStruct.str"), col("tag"))
    val r = SchemaOnRead.generate(q)
    assert(r.schemas.size == 1)
    assertSchema(r.schemas.headOption.map(_._2), st(
      fld("someLong", LongType),
      fld("nestedStruct", st(fld("str", StringType)))))
  }

  test("union of two sources prunes each branch") {
    val a = spark.read.json(jsonPath).select(col("struct.col1").as("v"))
    val b = spark.read.json(json2Path).select(col("nestedStruct.childStruct.col2").as("v"))
    val r = SchemaOnRead.generate(a.union(b))
    assertSchema(r.schemaFor(jsonPath), st(fld("struct", st(fld("col1", LongType)))))
    assertSchema(r.schemaFor(json2Path), st(
      fld("nestedStruct", st(fld("childStruct", st(fld("col2", LongType)))))))
  }

  // ---- generate (explode family) ------------------------------------

  test("explode of top-level complex array at top level keeps element struct") {
    val df = jsonDF.select(explode(col("someComplexArray")).as("item"))
    assertSchema(pruned(df), st(
      fld("someComplexArray", arr(st(fld("col1", LongType), fld("col2", LongType))))))
  }

  test("explode with single-field access prunes element struct") {
    val df = jsonDF.select(explode(col("someComplexArray")).as("item"))
      .select(col("item.col1"))
    assertSchema(pruned(df), st(
      fld("someComplexArray", arr(st(fld("col1", LongType))))))
  }

  test("explode of sub-array under struct") {
    val df = jsonDF.select(explode(col("struct.subArray")).as("x"))
    assertSchema(pruned(df), st(fld("struct", st(fld("subArray", arr(LongType))))))
  }

  test("consecutive explodes traverse nested arrays") {
    val df = jsonDF
      .select(explode(col("someArrayOfComplexArrays")).as("outer"))
      .select(explode(col("outer.col2")).as("inner"))
    assertSchema(pruned(df), st(
      fld("someArrayOfComplexArrays", arr(st(fld("col2", arr(LongType)))))))
  }

  test("posexplode output lineage maps value column, not position") {
    val df = jsonDF.select(posexplode(col("someComplexArray")).as(Seq("pos", "item")))
      .select(col("pos"), col("item.col2"))
    assertSchema(pruned(df), st(
      fld("someComplexArray", arr(st(fld("col2", LongType))))))
  }

  test("explode over aggregation result") {
    val df = jsonDF.groupBy(col("someStr"))
      .agg(collect_list(col("struct.col1")).as("vals"))
      .select(col("someStr"), explode(col("vals")).as("v"))
    assertSchema(pruned(df), st(
      fld("someStr", StringType),
      fld("struct", st(fld("col1", LongType)))))
  }

  test("deep positional path: repeatedStuff[0].anotherRepeatedStuff[0].innerField2") {
    spark.read.json(crazyPath).createOrReplaceTempView("crazy_json")
    val q = spark.sql(
      "SELECT crazyStruct.repeatedStuff[0].anotherRepeatedStuff[0].innerField2 AS v FROM crazy_json")
    assertSchema(pruned(q), st(
      fld("crazyStruct", st(
        fld("repeatedStuff", arr(st(
          fld("anotherRepeatedStuff", arr(st(fld("innerField2", StringType)))))))))))
  }

  test("explode of a MAP maps key and value outputs to the map column") {
    val mapSchema = st(
      fld("someStr", StringType),
      fld("m", MapType(StringType, st(fld("a", LongType), fld("b", LongType)))))
    val df = spark.read.schema(mapSchema).json(jsonPath)
      .select(explode(col("m")).as(Seq("k", "v")))
      .select(col("k"), col("v.a"))
    assertSchema(pruned(df), st(
      fld("m", MapType(StringType, st(fld("a", LongType))))))
  }

  test("double explode through crazyStruct repetition") {
    spark.read.json(crazyPath).createOrReplaceTempView("crazy_json")
    val q = spark.sql(
      """SELECT stuff.justABool AS bool, inner_item.innerField1 AS f1
        |FROM crazy_json
        |LATERAL VIEW explode(crazyStruct.repeatedStuff) AS stuff
        |LATERAL VIEW explode(stuff.anotherRepeatedStuff) AS inner_item""".stripMargin)
    assertSchema(pruned(q), st(
      fld("crazyStruct", st(
        fld("repeatedStuff", arr(st(
          fld("justABool", BooleanType),
          fld("anotherRepeatedStuff", arr(st(fld("innerField1", StringType)))))))))))
  }

  // ---- map access ----------------------------------------------------

  test("map value struct pruned through key and index access") {
    val mapSchema = st(
      fld("someStr", StringType),
      fld("mapOfArray", MapType(StringType, arr(st(
        fld("val1", StringType), fld("val2", StringType),
        fld("val3", LongType), fld("val4", StringType))))))
    val df = spark.read.schema(mapSchema).json(jsonPath)
      .select(col("mapOfArray")("someKey").getItem(0).getField("val1").as("v"))
    assertSchema(pruned(df), st(
      fld("mapOfArray", MapType(StringType, arr(st(fld("val1", StringType)))))))
  }

  // ---- expressions ---------------------------------------------------

  test("scala UDF arguments are traversed generically") {
    val f = udf((s: String) => if (s == null) 0 else s.length)
    val df = jsonDF.select(f(col("nestedStruct.str")).as("len"))
    assertSchema(pruned(df), st(fld("nestedStruct", st(fld("str", StringType)))))
  }

  test("whole-struct comparison in a filter demands the full subtree") {
    jsonDF.createOrReplaceTempView("sample_json")
    // s = s would be a self-compare; compare against a rebuilt struct to
    // force a whole-value equality on the column
    val q = spark.sql(
      "SELECT someLong FROM sample_json WHERE nestedStruct.childStruct = named_struct('col1', 5L, 'col2', 6L)")
    assertSchema(pruned(q), st(
      fld("someLong", LongType),
      fld("nestedStruct", st(
        fld("childStruct", st(fld("col1", LongType), fld("col2", LongType)))))))
  }

  test("function over a whole struct in a filter demands the full subtree") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      "SELECT someLong FROM sample_json WHERE to_json(struct) != '{}'")
    assertSchema(pruned(q), st(
      fld("someLong", LongType),
      fld("struct", structType)))
  }

  test("COALESCE / IF / IS NULL in filter touch leaf paths") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT someLong FROM sample_json
        |WHERE coalesce(struct.col1, struct.col2) > 0
        |  AND if(nestedStruct.str IS NULL, 0, 1) = 1""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someLong", LongType),
      fld("struct", st(fld("col1", LongType), fld("col2", LongType))),
      fld("nestedStruct", st(fld("str", StringType)))))
  }

  test("alias shadowing a real column over-includes it (accepted imprecision)") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """WITH base AS (SELECT nestedStruct.childStruct AS struct FROM sample_json)
        |SELECT struct.col1 FROM base""".stripMargin)
    val got = pruned(q).get
    // must at least include the real demand
    assert(got.fieldNames.map(_.toLowerCase).contains("nestedstruct"))
  }

  // ---- relation identity / caching ----------------------------------

  test("multi-file and wildcard reads resolve to the same relation key") {
    val wild = spark.read.json(s"$dir/sample*.json").select(col("struct.col1"))
    val r = SchemaOnRead.generate(wild)
    assert(r.schemas.size == 1)
    assertSchema(r.schemaFor(jsonPath, json2Path), st(fld("struct", st(fld("col1", LongType)))))
    assertSchema(r.schemaFor(json2Path, jsonPath, jsonPath), // unordered + duplicated
      st(fld("struct", st(fld("col1", LongType)))))
  }

  test("partitioned parquet dir keeps one relation identity") {
    val df = spark.read.parquet(partitionedPath).select(col("someLong"), col("someDouble"))
    val r = SchemaOnRead.generate(df)
    assert(r.schemas.size == 1)
    val got = r.schemas.headOption.map(_._2).get
    assert(got.fieldNames.map(_.toLowerCase).toSet == Set("somelong", "somedouble"))
  }

  test("cached dataframe still resolves to the file relation") {
    val df = parquetDF.cache()
    try {
      val q = df.select(col("struct.col1"))
      val r = SchemaOnRead.generate(q)
      assert(r.schemas.size == 1)
      assertSchema(r.schemas.headOption.map(_._2), st(fld("struct", st(fld("col1", LongType)))))
    } finally df.unpersist()
  }

  // ---- execution equality (stronger than the reference's count checks) --

  test("pruned schema re-read returns identical results") {
    val query: DataFrame => DataFrame = d =>
      d.filter(col("struct.col3") === 30)
        .select(col("someLong"), col("nestedStruct.str"), col("struct.col1"))
    val full = query(parquetDF)
    val prunedSchema = SchemaOnRead.generate(full).schemas.head._2
    val reread = query(spark.read.schema(prunedSchema).parquet(parquetPath))
    assert(reread.collect().toSeq == full.collect().toSeq)
    assert(prunedSchema.fieldNames.length < parquetDF.schema.fieldNames.length)
  }

  test("pruned schema cuts bytes read") {
    val query: DataFrame => DataFrame = d => d.select(col("struct.col1"))
    val prunedSchema = SchemaOnRead.generate(query(parquetDF)).schemas.head._2
    assert(prunedSchema.toDDL.length < parquetDF.schema.toDDL.length)
  }

  test("generator records duration") {
    val r = SchemaOnRead.generate(jsonDF.select(col("someLong")))
    assert(r.durationNanos > 0)
  }

  // ---- additional reference scenario ports ---------------------------

  test("SQL BROADCAST hint is transparent to analysis") {
    jsonDF.createOrReplaceTempView("sample_json")
    spark.read.json(json2Path).createOrReplaceTempView("sample_json2")
    val q = spark.sql(
      """SELECT /*+ BROADCAST(b) */ a.nestedStruct.str
        |FROM sample_json a JOIN sample_json2 b ON a.someLong = b.someLong""".stripMargin)
    val r = SchemaOnRead.generate(q)
    assertSchema(r.schemaFor(jsonPath), st(
      fld("someLong", LongType), fld("nestedStruct", st(fld("str", StringType)))))
    assertSchema(r.schemaFor(json2Path), st(fld("someLong", LongType)))
  }

  test("named WINDOW clause resolves like inline window spec") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT first(struct.col1) OVER w AS f FROM sample_json
        |WINDOW w AS (PARTITION BY someStr ORDER BY someLong)""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someStr", StringType), fld("someLong", LongType),
      fld("struct", st(fld("col1", LongType)))))
  }

  test("group by ordinal position resolves to the projected path") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      "SELECT struct.col2, count(*) AS n FROM sample_json GROUP BY 1")
    assertSchema(pruned(q), st(fld("struct", st(fld("col2", LongType)))))
  }

  test("count(*) and count(1) do not add spurious demand") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql("SELECT count(*) AS a, count(1) AS b FROM sample_json WHERE someLong > 0")
    assertSchema(pruned(q), st(fld("someLong", LongType)))
  }

  test("explode_outer and posexplode_outer share explode lineage") {
    val df = jsonDF.select(explode_outer(col("someComplexArray")).as("item"))
      .select(col("item.col2"))
    assertSchema(pruned(df), st(
      fld("someComplexArray", arr(st(fld("col2", LongType))))))
  }

  test("inline generator maps outputs to element fields") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      "SELECT t.col1 FROM sample_json LATERAL VIEW inline(someComplexArray) t AS col1, col2")
    assertSchema(pruned(q), st(
      fld("someComplexArray", arr(st(fld("col1", LongType))))))
  }

  test("SQL consecutive LATERAL VIEW explodes") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT someStr, val FROM sample_json
        |LATERAL VIEW explode(someArrayOfComplexArrays) AS complex
        |LATERAL VIEW explode(complex.col2) AS val""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someStr", StringType),
      fld("someArrayOfComplexArrays", arr(st(fld("col2", arr(LongType)))))))
  }

  test("consecutive explodes through CTE and right join (reference stress case)") {
    jsonDF.createOrReplaceTempView("table_one")
    jsonDF.createOrReplaceTempView("table_two")
    val q = spark.sql(
      """WITH base AS (SELECT someStr, val FROM table_one
        |  LATERAL VIEW explode(someArrayOfComplexArrays) AS complex
        |  LATERAL VIEW explode(complex.col2) AS val)
        |SELECT base.someStr, base.val, complex.col1
        |FROM table_two RIGHT JOIN base ON base.someStr = table_two.someStr
        |LATERAL VIEW explode(someArrayOfComplexArrays) AS complex
        |LATERAL VIEW explode(complex.col2) AS val""".stripMargin)
    val got = pruned(q).get
    // someStr + the exploded array with col1 and col2 demanded
    val arrField = got.find(_.name.equalsIgnoreCase("someArrayOfComplexArrays"))
    assert(arrField.isDefined, got.toDDL)
    val elem = arrField.get.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.map(_.toLowerCase).toSet == Set("col1", "col2"), got.toDDL)
  }

  test("array index then struct field: someComplexArray[0].col1") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql("SELECT someComplexArray[0].col1 AS v FROM sample_json")
    assertSchema(pruned(q), st(
      fld("someComplexArray", arr(st(fld("col1", LongType))))))
  }

  test("nested array double index: someArrayOfArrays[0][2]") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql("SELECT someArrayOfArrays[0][2] AS v FROM sample_json")
    assertSchema(pruned(q), st(fld("someArrayOfArrays", arr(arr(LongType)))))
  }

  test("explode with filter on a nested array field of the exploded collection") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT item.col1 AS rst FROM sample_json
        |LATERAL VIEW explode(someArrayOfComplexArrays) AS item
        |WHERE someArrayOfComplexArrays.col2 IS NOT NULL""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someArrayOfComplexArrays", arr(st(
        fld("col1", LongType), fld("col2", arr(LongType)))))))
  }

  test("explode over a filtered CTE accessing a sibling nested field") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """WITH base AS (SELECT someArrayOfComplexArrays FROM sample_json
        |  WHERE someArrayOfComplexArrays.col2 IS NOT NULL)
        |SELECT item.col1 AS str FROM base
        |LATERAL VIEW explode(someArrayOfComplexArrays) AS item""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someArrayOfComplexArrays", arr(st(
        fld("col1", LongType), fld("col2", arr(LongType)))))))
  }

  test("group full struct by struct part keeps full struct") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      "SELECT first(nestedStruct) AS s FROM sample_json GROUP BY nestedStruct.str")
    assertSchema(pruned(q), st(fld("nestedStruct", nestedStructType)))
  }

  test("group struct part by full struct through subquery keeps full struct") {
    jsonDF.createOrReplaceTempView("sample_json")
    spark.sql("SELECT first(nestedStruct.str) AS str FROM sample_json GROUP BY nestedStruct")
      .createOrReplaceTempView("base")
    val q = spark.sql("SELECT str FROM base")
    assertSchema(pruned(q), st(fld("nestedStruct", nestedStructType)))
  }

  test("first(struct) narrows through subquery field access") {
    jsonDF.createOrReplaceTempView("sample_json")
    spark.sql(
      "SELECT first(nestedStruct) AS mystruct FROM sample_json GROUP BY nestedStruct.str")
      .createOrReplaceTempView("base")
    val q = spark.sql("SELECT mystruct.childStruct.col1 FROM base")
    assertSchema(pruned(q), st(
      fld("nestedStruct", st(
        fld("childStruct", st(fld("col1", LongType))),
        fld("str", StringType)))))
  }

  test("union through view plus filter prunes both branches") {
    val a = spark.read.json(jsonPath)
    val b = spark.read.json(json2Path)
    val q = a.select(col("struct.col1").as("v"))
      .union(b.select(col("struct.col1").as("v")))
      .filter(col("v") > 0)
    val r = SchemaOnRead.generate(q)
    assertSchema(r.schemaFor(jsonPath), st(fld("struct", st(fld("col1", LongType)))))
    assertSchema(r.schemaFor(json2Path), st(fld("struct", st(fld("col1", LongType)))))
  }

  // reference test_structAggregationOverWindowSubQuery
  // (SchemaOnReadGeneratorTest.java:339-359)
  test("struct aggregation over window subquery") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """WITH base AS (SELECT someStr, FIRST(someComplexArray) OVER w AS complexArray
        |FROM sample_json WINDOW w AS (PARTITION BY someStr ORDER BY someStr DESC))
        |SELECT FIRST(complexArray) AS myArray FROM base GROUP BY someStr""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someComplexArray", arr(st(fld("col1", LongType), fld("col2", LongType)))),
      fld("someStr", StringType)))
  }

  // reference test_windowWithComplexOrder (SchemaOnReadGeneratorTest.java:384-404)
  test("window with complex order demands full subtree") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """WITH base AS (SELECT FIRST(someStr) OVER w AS str FROM sample_json
        |WINDOW w AS (PARTITION BY someStr ORDER BY someComplexArray DESC))
        |SELECT str FROM base""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someComplexArray", arr(st(fld("col1", LongType), fld("col2", LongType)))),
      fld("someStr", StringType)))
  }

  // reference test_aggregateWithOrderOnComplex (SchemaOnReadGeneratorTest.java:428-447)
  test("aggregate with order on complex alias demands full subtree") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """WITH base AS (SELECT someStr, FIRST(someComplexArray) AS cmplx
        |FROM sample_json GROUP BY 1 ORDER BY cmplx)
        |SELECT someStr FROM base""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someComplexArray", arr(st(fld("col1", LongType), fld("col2", LongType)))),
      fld("someStr", StringType)))
  }

  // reference test_variousExpressions (SchemaOnReadGeneratorTest.java:1278-1297):
  // COALESCE over a nested path in the SELECT list narrows the struct to
  // the referenced leaf (a primitive result demands no subtree)
  test("COALESCE in select with IS NULL / IF in where (expression battery)") {
    jsonDF.createOrReplaceTempView("sample_json")
    val q = spark.sql(
      """SELECT COALESCE(someStr, nestedStruct.str) FROM sample_json
        |WHERE someLong IS NULL OR IF(someDouble < 0, true, false)""".stripMargin)
    assertSchema(pruned(q), st(
      fld("someStr", StringType),
      fld("someLong", LongType),
      fld("someDouble", DoubleType),
      fld("nestedStruct", st(fld("str", StringType)))))
  }

  test("plan captured post-cache-materialization: cache opaque, fresh side prunes") {
    val base = jsonDF.select(col("someLong"), col("struct.col1").as("c1"))
    base.cache()
    try {
      base.count() // materialize
      val fresh = spark.read.json(json2Path)
        .select(col("struct.col2").as("c2"), col("someLong").as("l2"))
      val q = base.join(fresh, base("someLong") === fresh("l2"))
        .select(col("c1"), col("c2"))
      val plan = q.queryExecution.withCachedData // substitutes InMemoryRelation
      assert(plan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]))
      val r = SchemaOnRead.generate(plan, spark)
      // the fresh file side still prunes; the cached side exposes no file
      // relation and contributes no demand (and no fail-open error)
      assertSchema(r.schemaFor(json2Path), st(
        fld("someLong", LongType),
        fld("struct", st(fld("col2", LongType)))))
      assert(r.schemaFor(jsonPath).isEmpty)
    } finally base.unpersist()
  }

  test("catalog table via spark.table prunes and is addressable by identifier") {
    parquetDF.write.mode("overwrite")
      .option("path", s"$dir/cat-table").saveAsTable("graft_cat_t")
    try {
      val q = spark.table("graft_cat_t").select(col("struct.col1"))
      val res = SchemaOnRead.generate(q)
      val byBare = res.schemaForTable("graft_cat_t")
      assert(byBare.isDefined, "catalog table not registered by bare name")
      assertSchema(byBare, st(fld("struct", st(fld("col1", LongType)))))
      assert(res.schemaForTable("default.graft_cat_t") == byBare,
        "qualified identifier must resolve to the same relation")
      // two reads of the same table share one relation identity — demand
      // accumulates, like same-path reads do (reference path-identity
      // semantics, SchemaOnReadGeneratorTest.java:1192-1244)
      val q2 = spark.table("graft_cat_t").select(col("struct.col1").as("v"))
        .union(spark.table("graft_cat_t").select(col("struct.col2").as("v")))
      assertSchema(SchemaOnRead.generate(q2).schemaForTable("graft_cat_t"),
        st(fld("struct", st(fld("col1", LongType), fld("col2", LongType)))))
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_t")
  }

  test("temp view shadowing a catalog table name: each namespace resolves its own") {
    parquetDF.write.mode("overwrite")
      .option("path", s"$dir/cat-shadow").saveAsTable("graft_shadow")
    try {
      // a temp view with the SAME bare name over a DIFFERENT relation
      jsonDF.createOrReplaceTempView("graft_shadow")
      // touch BOTH: the view via its bare name (temp views win resolution),
      // the table via its qualified identifier
      val viewSide = spark.table("graft_shadow").select(col("struct.col1").as("a"))
      val tableSide = spark.table("default.graft_shadow").select(col("someStr").as("b"))
      val res = SchemaOnRead.generate(
        viewSide.crossJoin(tableSide).queryExecution.analyzed, spark)
      // schemaForView → the json view relation; schemaForTable → parquet
      // table — the bindings must not overwrite each other
      assertSchema(res.schemaForView("graft_shadow"),
        st(fld("struct", st(fld("col1", LongType)))))
      assertSchema(res.schemaForTable("graft_shadow"),
        st(fld("someStr", StringType)))
      assertSchema(res.schemaForTable("default.graft_shadow"),
        st(fld("someStr", StringType)))
    } finally {
      spark.catalog.dropTempView("graft_shadow")
      spark.sql("DROP TABLE IF EXISTS graft_shadow")
    }
  }

  test("Limit/Offset/Tail/Sample pass lineage through without widening demand") {
    // these route through the fail-closed catch-all, whose expressions
    // are literals (limit counts, sample fractions) — resolving them
    // must demand NO columns, so the pruned schema equals the plain
    // projection's
    val base = jsonDF.select(col("someLong"), col("struct.col1"))
    val expected = st(
      fld("someLong", LongType),
      fld("struct", st(fld("col1", LongType))))
    assertSchema(pruned(base.limit(5)), expected)
    assertSchema(pruned(base.offset(2)), expected)
    assertSchema(pruned(base.offset(1).limit(3)), expected)
    assertSchema(pruned(base.sample(0.5, seed = 7)), expected)
    // and result-equality: the pruned re-read computes the same rows
    val q = jsonDF.select(col("struct.col1")).limit(1)
    val schema = SchemaOnRead.generate(q).schemaFor(jsonPath).get
    val narrow = spark.read.schema(schema).json(jsonPath)
      .select(col("struct.col1")).limit(1).collect()
    assert(narrow.map(_.getLong(0)).toSeq === q.collect().map(_.getLong(0)).toSeq)
  }
}
