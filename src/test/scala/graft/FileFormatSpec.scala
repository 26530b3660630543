package graft

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-file formats beyond parquet (paimon `file.format`, SURVEY §2.1
  * "File formats (data)"): orc / csv / json data files flow through the
  * same LSM write/merge/compact/stats machinery; manifests and index files
  * stay parquet (internal metadata). */
class FileFormatSpec extends SparkTestBase {
  import spark.implicits._

  private def mkOrders = Seq(
    (1L, "A", 10.0, "2024-01-01"),
    (2L, "B", 20.0, "2024-01-01"),
    (3L, "A", 30.0, "2024-01-02"),
    (4L, "C", 40.0, "2024-01-02")
  ).toDF("k", "status", "price", "dt")

  test("orc PK table: MOR, stats prune, compaction, update, delete") {
    val loc = tmpLoc("orc-pk")
    val t = GraftTable.create(spark, loc, mkOrders.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        options = Map("file.format" -> "orc")))
    t.write(mkOrders)
    t.write(Seq((2L, "B2", 25.0, "2024-01-01")).toDF("k", "status", "price", "dt"))
    // data files really are ORC
    val files = t.planFiles(None, None)
    assert(files.nonEmpty && files.forall(_.path.endsWith(".orc")),
      s"expected .orc data files, got ${files.map(_.path)}")
    assertSameRows(t.read(),
      Seq((1L, "A", 10.0, "2024-01-01"), (2L, "B2", 25.0, "2024-01-01"),
        (3L, "A", 30.0, "2024-01-02"), (4L, "C", 40.0, "2024-01-02"))
        .toDF("k", "status", "price", "dt"))
    // manifest stats collected from orc files prune as usual
    assert(t.planFiles(None, Some(col("k") === 1L)).size <
      t.planFiles(None, None).size)
    t.compact()
    assert(t.read().count() == 4)
    t.update(Map("price" -> lit(99.0)), col("k") === 3L)
    t.delete(col("k") === 4L)
    assertSameRows(t.read().select("k", "price"),
      Seq((1L, 10.0), (2L, 25.0), (3L, 99.0)).toDF("k", "price"))
    // SQL catalog read of an orc-format graft table goes through the V1 plan
    val plan = t.read().queryExecution.executedPlan.toString
    assert(!plan.contains("GraftBatchScan"))
  }

  test("csv append table: null vs empty string round-trip, stats, filters") {
    val loc = tmpLoc("csv-app")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("v", DoubleType)))
    val t = GraftTable.create(spark, loc, schema,
      TableConfig(options = Map("file.format" -> "csv")))
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "x", 1.5), (2L, null, 2.5), (3L, "", 3.5), (4L, "a,b\"q", null)
    ).toDF("id", "s", "v")
    t.write(df)
    val files = t.planFiles(None, None)
    assert(files.forall(_.path.endsWith(".csv")))
    assertSameRows(t.read(), df)
    // null count stats distinguish null from empty string
    val sStat = files.map(_.stats("s").nullCount).sum
    assert(sStat == 1, s"expected 1 null in s, got $sStat")
    assert(t.read(Some(col("v") > 3.0)).count() == 1)
  }

  test("json append table keeps nested struct/array columns") {
    val loc = tmpLoc("json-app")
    val df = Seq((1L, ("a", 10), Seq(1, 2)), (2L, ("b", 20), Seq(3)))
      .toDF("id", "info", "xs")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(options = Map("file.format" -> "json")))
    t.write(df)
    assert(t.planFiles(None, None).forall(_.path.endsWith(".json")))
    assertSameRows(t.read(), df)
    assertSameRows(t.read().select(col("info._1").as("n")),
      Seq("a", "b").toDF("n"))
  }

  test("format validation: csv rejects nested schemas, DVs require parquet") {
    val nested = Seq((1L, ("a", 1))).toDF("id", "info")
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpLoc("csv-bad"), nested.schema,
        TableConfig(options = Map("file.format" -> "csv")))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpLoc("orc-dv"), mkOrders.schema,
        TableConfig(primaryKeys = Seq("k"),
          options = Map("file.format" -> "orc",
            "deletion-vectors.enabled" -> "true")))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpLoc("fmt-bad"), mkOrders.schema,
        TableConfig(options = Map("file.format" -> "lance")))
    }
  }

  test("text append table: one line per row, stats, filters, validation") {
    val loc = tmpLoc("text-app")
    val df = Seq("alpha one", "bravo two", "charlie three", "alpha four")
      .toDF("line")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(options = Map("file.format" -> "text")))
    t.write(df)
    assert(t.planFiles(None, None).forall(_.path.endsWith(".txt")))
    assertSameRows(t.read(), df)
    // min/max stats collected from text files prune as usual
    assert(t.read(Some(col("line").startsWith("alpha"))).count() == 2)
    // multi-column and PK schemas are rejected up front
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpLoc("text-bad"),
        Seq((1L, "x")).toDF("k", "s").schema,
        TableConfig(options = Map("file.format" -> "text")))
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpLoc("text-pk"), df.schema,
        TableConfig(primaryKeys = Seq("line"),
          options = Map("file.format" -> "text")))
    }
  }

  test("avro PK table: MOR, stats prune, compaction, update, delete") {
    val loc = tmpLoc("avro-pk")
    val t = GraftTable.create(spark, loc, mkOrders.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        options = Map("file.format" -> "avro")))
    t.write(mkOrders)
    t.write(Seq((2L, "B2", 25.0, "2024-01-01")).toDF("k", "status", "price", "dt"))
    val files = t.planFiles(None, None)
    assert(files.nonEmpty && files.forall(_.path.endsWith(".avro")),
      s"expected .avro data files, got ${files.map(_.path)}")
    assertSameRows(t.read(),
      Seq((1L, "A", 10.0, "2024-01-01"), (2L, "B2", 25.0, "2024-01-01"),
        (3L, "A", 30.0, "2024-01-02"), (4L, "C", 40.0, "2024-01-02"))
        .toDF("k", "status", "price", "dt"))
    // manifest stats collected from avro files prune as usual
    assert(t.planFiles(None, Some(col("k") === 1L)).size <
      t.planFiles(None, None).size)
    t.compact()
    assert(t.read().count() == 4)
    t.update(Map("price" -> lit(99.0)), col("k") === 3L)
    t.delete(col("k") === 4L)
    assertSameRows(t.read().select("k", "price"),
      Seq((1L, 10.0), (2L, 25.0), (3L, 99.0)).toDF("k", "price"))
  }

  test("row PK table: binary UnsafeRow files through MOR and compaction") {
    val loc = tmpLoc("row-pk")
    val t = GraftTable.create(spark, loc, mkOrders.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2,
        options = Map("file.format" -> "row")))
    t.write(mkOrders)
    t.write(Seq((2L, "B2", 25.0, "2024-01-01")).toDF("k", "status", "price", "dt"))
    val files = t.planFiles(None, None)
    assert(files.nonEmpty && files.forall(_.path.endsWith(".row")),
      s"expected .row data files, got ${files.map(_.path)}")
    assertSameRows(t.read(),
      Seq((1L, "A", 10.0, "2024-01-01"), (2L, "B2", 25.0, "2024-01-01"),
        (3L, "A", 30.0, "2024-01-02"), (4L, "C", 40.0, "2024-01-02"))
        .toDF("k", "status", "price", "dt"))
    assert(t.planFiles(None, Some(col("k") === 1L)).size <
      t.planFiles(None, None).size)
    t.compact()
    t.delete(col("k") === 4L)
    assert(t.read().count() == 3)
    // schema evolution: a new column null-fills from pre-evolution files
    t.addColumns(StructField("extra", IntegerType))
    val t2 = GraftTable.load(spark, loc)
    t2.write(Seq((9L, "Z", 1.0, "2024-05-01", 5))
      .toDF("k", "status", "price", "dt", "extra"))
    val got = t2.read().select("k", "extra").orderBy("k")
      .as[(Long, Option[Int])].collect().toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, None), (9L, Some(5))), s"$got")
  }

  test("avro round-trips rich types and evolves schema by field id") {
    val loc = tmpLoc("avro-types")
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 'a', CAST(1.25 AS DECIMAL(10,2)), DATE'2024-03-01',
        |   TIMESTAMP'2024-03-01 10:30:00', X'0102', array(1, 2),
        |   map('x', 1.5D), named_struct('n', 'p', 'v', 7), CAST(NULL AS STRING)),
        |  (2L, NULL, CAST(-3.50 AS DECIMAL(10,2)), NULL,
        |   NULL, NULL, array(3), map('y', CAST(NULL AS DOUBLE)),
        |   NULL, 'z')
        |AS t(id, s, dec, d, ts, bin, xs, m, st, opt)""".stripMargin)
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(options = Map("file.format" -> "avro")))
    t.write(df)
    assert(t.planFiles(None, None).forall(_.path.endsWith(".avro")))
    // hex the binary column: Array[Byte] compares by reference in row sets
    assertSameRows(t.read().withColumn("bin", hex(col("bin"))),
      df.withColumn("bin", hex(col("bin"))))
    // evolution: new column reads as null from pre-evolution avro files
    t.addColumns(StructField("extra", IntegerType))
    val t2 = GraftTable.load(spark, loc)
    t2.write(spark.sql(
      """SELECT 3L id, 'c' s, CAST(9.99 AS DECIMAL(10,2)) dec,
        |DATE'2024-04-01' d, TIMESTAMP'2024-04-01 00:00:00' ts, X'03' bin,
        |array(9) xs, map('z', 0.5D) m, named_struct('n', 'q', 'v', 8) st,
        |'w' opt, 42 extra""".stripMargin))
    val got = t2.read().select("id", "extra").orderBy("id")
      .as[(Long, Option[Int])].collect().toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, Some(42))), s"got $got")
  }
}
