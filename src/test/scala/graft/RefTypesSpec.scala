package graft

import graft.core._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-dialect type mapping (SURVEY §1.2 matrix; reference
  * SparkTypeUtils.java) — in particular the two spellings Spark DDL lacks:
  * TIME(p) → millis-of-day int and MULTISET<e> → MAP<e, INT NOT NULL>. */
class RefTypesSpec extends SparkTestBase {

  test("the §1.2 matrix maps, including reference-only spellings") {
    val cases = Seq(
      "TIME(3)" -> IntegerType,
      "TIME" -> IntegerType,
      "MULTISET<STRING>" -> MapType(StringType, IntegerType, valueContainsNull = false),
      "MULTISET<INT>" -> MapType(IntegerType, IntegerType, valueContainsNull = false),
      "VECTOR<FLOAT, 128>" -> ArrayType(FloatType, containsNull = false),
      "BLOB" -> BinaryType,
      "TIMESTAMP(6)" -> TimestampNTZType,
      "TIMESTAMP_LTZ" -> TimestampType,
      "TIMESTAMP WITH LOCAL TIME ZONE" -> TimestampType,
      "VARCHAR(10)" -> StringType,
      "CHAR(2)" -> StringType,
      "DECIMAL(20, 4)" -> DecimalType(20, 4),
      "TINYINT" -> ByteType,
      "SMALLINT" -> ShortType,
      "VARBINARY(64)" -> BinaryType,
      "VARIANT" -> VariantType,
      // nesting recurses through the reference-only spellings
      "ARRAY<MULTISET<INT>>" ->
        ArrayType(MapType(IntegerType, IntegerType, valueContainsNull = false)),
      "MAP<STRING, TIME(3)>" -> MapType(StringType, IntegerType),
      "ROW<a INT, b MULTISET<STRING>>" -> StructType(Seq(
        StructField("a", IntegerType),
        StructField("b", MapType(StringType, IntegerType, valueContainsNull = false)))),
      // plain Spark DDL passes through
      "STRUCT<x: BIGINT, y: STRING>" ->
        StructType(Seq(StructField("x", LongType), StructField("y", StringType))))
    cases.foreach { case (ref, want) =>
      assert(RefTypes.toSpark(ref) == want, s"$ref mapped wrong")
    }
    assert(RefTypes.fieldToSpark("t", "TIME(0) NOT NULL") ==
      StructField("t", IntegerType, nullable = false))
  }

  test("VECTOR<t, n>: dimension extraction, implied options, nested parse, " +
      "DDL-armed write enforcement") {
    // the declared dimension surfaces (incl. NOT NULL suffix); non-vector
    // types carry none
    assert(RefTypes.vectorDim("VECTOR<FLOAT, 768>").contains(768))
    assert(RefTypes.vectorDim("vector<double,4> NOT NULL").contains(4))
    assert(RefTypes.vectorDim("ARRAY<FLOAT>").isEmpty)
    // nested vectors parse (type mapping recurses) but imply no per-column
    // dimension option — enforcement is a column-level contract
    assert(RefTypes.toSpark("ARRAY<VECTOR<FLOAT, 4>>") ==
      ArrayType(ArrayType(FloatType, containsNull = false)))
    assert(RefTypes.vectorDim("ARRAY<VECTOR<FLOAT, 4>>").isEmpty)
    // malformed dimensions fail loudly
    intercept[Exception](RefTypes.toSpark("VECTOR<FLOAT>"))
    intercept[Exception](RefTypes.toSpark("VECTOR<FLOAT, 0>"))
    intercept[Exception](RefTypes.toSpark("VECTOR<FLOAT, x>"))
    // impliedOptions: one fields.<col>.dimension entry per vector column
    val fields = Seq("id" -> "BIGINT", "emb" -> "VECTOR<FLOAT, 3>",
      "img" -> "VECTOR<FLOAT, 2>", "tags" -> "ARRAY<STRING>")
    assert(RefTypes.impliedOptions(fields) == Map(
      "fields.emb.dimension" -> "3", "fields.img.dimension" -> "2"))
    // declaring the type ARMS the write-time enforcement: a conforming
    // write lands, a wrong-dimension write fails with the column's contract
    val loc = tmpLoc("vector-ddl")
    val t = GraftTable.createOrReplace(spark, loc,
      RefTypes.schemaToSpark(fields.take(2)),
      TableConfig(options = RefTypes.impliedOptions(fields.take(2))))
    import spark.implicits._
    t.write(Seq((1L, Seq(1f, 2f, 3f))).toDF("id", "emb"))
    assert(t.read().count() == 1)
    val ex = intercept[Exception] {
      t.write(Seq((2L, Seq(1f, 2f))).toDF("id", "emb"))
    }
    assert(ex.getMessage.contains("fixed vector dimension") ||
      Option(ex.getCause).exists(_.getMessage.contains("fixed vector dimension")),
      s"wrong-dimension write must name the contract: ${ex.getMessage}")
  }

  test("TIME + MULTISET columns round-trip through a table and schema-evolve") {
    val loc = tmpLoc("reftypes-rt")
    val schema = RefTypes.schemaToSpark(Seq(
      "id" -> "BIGINT NOT NULL", "t" -> "TIME(3)", "bag" -> "MULTISET<STRING>"))
    val t = GraftTable.create(spark, loc, schema, TableConfig())
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 34200000, Map("a" -> 2, "b" -> 1)), // 09:30:00 as millis-of-day
        Row(2L, 0, Map("x" -> 3))),
      schema)
    t.write(rows)
    val back = GraftTable.load(spark, loc).read().orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(back(0).getInt(1) == 34200000 && back(1).getInt(1) == 0)
    assert(back(0).getMap[String, Int](2).toMap == Map("a" -> 2, "b" -> 1))
    // millis-of-day int is directly usable as a time in queries
    val asTime = GraftTable.load(spark, loc).read()
      .select(date_format(timestamp_millis(col("t")), "HH:mm:ss").as("hms"))
      .orderBy("hms").collect().map(_.getString(0)).toSeq
    assert(asTime == Seq("00:00:00", "09:30:00"))

    // schema evolution: ADD a reference-typed column, old files read null
    t.addColumns(RefTypes.fieldToSpark("counts", "MULTISET<INT>"))
    val t2 = GraftTable.load(spark, loc)
    t2.write(spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, 60000, Map("c" -> 1), Map(7 -> 2))),
      schema.add(RefTypes.fieldToSpark("counts", "MULTISET<INT>"))))
    val evolved = GraftTable.load(spark, loc).read().orderBy("id").collect()
    assert(evolved.length == 3)
    assert(evolved(0).isNullAt(3), "pre-evolution rows read null for the added multiset")
    assert(evolved(2).getMap[Int, Int](3).toMap == Map(7 -> 2))

    // ADD a TIME(3) column WITH a default: pre-evolution rows surface the
    // default millis-of-day instead of null (fields.<name>.default-value,
    // the reference's column-default mechanism)
    val t3 = GraftTable.load(spark, loc)
    t3.addColumns(RefTypes.fieldToSpark("opens_at", "TIME(3)"))
    t3.setOption("fields.opens_at.default-value", "32400000") // 09:00:00
    val withDefault = GraftTable.load(spark, loc).read()
      .select(col("id"), col("opens_at")).orderBy("id").collect()
    assert(withDefault.forall(_.getInt(1) == 32400000),
      withDefault.mkString("; "))
    val asOpens = GraftTable.load(spark, loc).read()
      .select(date_format(timestamp_millis(col("opens_at")), "HH:mm:ss"))
      .distinct().collect().map(_.getString(0)).toSeq
    assert(asOpens == Seq("09:00:00"), asOpens.toString)
  }
}
