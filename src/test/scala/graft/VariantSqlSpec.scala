package graft

import graft.core._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transparent SQL `variant_get` pushdown (§2.2): a plain SQL query over the
  * DSv2 table reads the SHREDDED physical columns — the plan carries no
  * VariantGet and the scan's readSchema shows the extraction struct
  * (capability of paimon PaimonSupportsPushDownVariantExtractions /
  * VariantPushDownUtils.scala:36; here via Spark 4.1's native
  * SupportsPushDownVariantExtractions protocol). */
class VariantSqlSpec extends SparkTestBase {
  import spark.implicits._

  spark.conf.set("spark.sql.variant.pushVariantIntoScan", "true")

  private lazy val wh = {
    val w = java.nio.file.Files.createTempDirectory("graft-vsql-wh").toString
    spark.conf.set("spark.sql.catalog.vsql", "graft.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.vsql.warehouse", w)
    w
  }

  /** Create a graft table under the catalog warehouse and return its SQL
    * identifier. */
  private def catTable(name: String, cfg: TableConfig): String = {
    val loc = s"$wh/db.db/$name"
    val t = GraftTable.create(spark, loc, mkDocs.schema, cfg)
    t.write(mkDocs)
    s"vsql.db.$name"
  }

  private def mkDocs: DataFrame =
    Seq((0L, "en", 11), (1L, "de", 22), (2L, "en", 33), (3L, "fr", 44))
      .toDF("doc_id", "lang", "text_len")
      .select(col("doc_id"),
        parse_json(to_json(struct(col("lang"), col("text_len")))).as("meta"))

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("append table: SQL variant_get reads shreds, no decode in the plan") {
    val tbl = catTable("t_append", TableConfig(
      options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
    val df = spark.sql(
      s"""SELECT doc_id, variant_get(meta, '$$.lang', 'string') AS lang,
         |  variant_get(meta, '$$.text_len', 'int') AS tl
         |FROM $tbl ORDER BY doc_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((0L, "en", 11), (1L, "de", 22), (2L, "en", 33), (3L, "fr", 44)))
    val plan = planOf(df)
    assert(!plan.contains("variant_get"), s"extraction must be pushed:\n$plan")
    // append table is raw-convertible -> NATIVE COLUMNAR variant scan
    assert(plan.contains("GraftVariantBatchScan"), plan)
    assert(plan.contains("ColumnarToRow"), s"native path must stay columnar:\n$plan")
  }

  test("PK table: SQL variant_get serves the merged winner's shreds") {
    val tbl = catTable("t_pk", TableConfig(
      primaryKeys = Seq("doc_id"), numBuckets = 2,
      options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
    // upsert doc 1 with new text_len; winner's extraction must serve 99
    GraftTable.load(spark, s"$wh/db.db/t_pk")
      .write(Seq((1L, "de", 99)).toDF("doc_id", "lang", "text_len")
        .select(col("doc_id"),
          parse_json(to_json(struct(col("lang"), col("text_len")))).as("meta")))
    val df = spark.sql(
      s"""SELECT doc_id, variant_get(meta, '$$.text_len', 'int') AS tl
         |FROM $tbl ORDER BY doc_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((0L, 11), (1L, 99), (2L, 33), (3L, 44)))
    val plan = planOf(df)
    assert(!plan.contains("variant_get"), s"extraction must be pushed:\n$plan")
    // merge-needing PK table serves the merged view through the V1 scan
    assert(plan.contains("GraftVariantScan"), plan)
  }

  test("unshredded path falls back to decode with correct results") {
    val tbl = catTable("t_miss", TableConfig(
      options = Map("fields.meta.shred" -> "$.lang:string")))
    // $.text_len is NOT shredded -> all-or-nothing acceptance rejects the
    // column; the query still answers correctly via decode
    val df = spark.sql(
      s"""SELECT doc_id, variant_get(meta, '$$.text_len', 'int') AS tl,
         |  variant_get(meta, '$$.lang', 'string') AS lang
         |FROM $tbl ORDER BY doc_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((0L, 11, "en"), (1L, 22, "de"), (2L, 33, "en"), (3L, 44, "fr")))
    assert(planOf(df).contains("variant_get"))
  }

  test("try_variant_get and filters push through the variant scan") {
    val tbl = catTable("t_try", TableConfig(
      options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
    val df = spark.sql(
      s"""SELECT doc_id, try_variant_get(meta, '$$.lang', 'string') AS lang
         |FROM $tbl
         |WHERE variant_get(meta, '$$.text_len', 'int') > 20
         |ORDER BY doc_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "de"), (2L, "en"), (3L, "fr")))
    val plan = planOf(df)
    assert(!plan.contains("variant_get"), s"both forms must push:\n$plan")
    assert(plan.contains("GraftVariant"), plan)
  }

  test("two variant columns, only one shredded: query still answers") {
    // partial acceptance ACROSS columns — Spark's rewrite must tolerate one
    // accepted column and one rejected column in the same query
    val docs2 = Seq((0L, "en", 11), (1L, "de", 22))
      .toDF("doc_id", "lang", "text_len")
      .select(col("doc_id"),
        parse_json(to_json(struct(col("lang")))).as("meta"),
        parse_json(to_json(struct(col("text_len")))).as("extra"))
    val loc = s"$wh/db.db/t_two"
    val t = GraftTable.create(spark, loc, docs2.schema, TableConfig(
      options = Map("fields.meta.shred" -> "$.lang:string")))
    t.write(docs2)
    val df = spark.sql(
      s"""SELECT doc_id, variant_get(meta, '$$.lang', 'string') AS lang,
         |  variant_get(extra, '$$.text_len', 'int') AS tl
         |FROM vsql.db.t_two ORDER BY doc_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((0L, "en", 11), (1L, "de", 22)))
  }

  test("native variant scan applies deletion vectors inside the batch") {
    import graft.core.RowOps._
    val loc = s"$wh/db.db/t_dv"
    val t = GraftTable.create(spark, loc, mkDocs.schema, TableConfig(
      primaryKeys = Seq("doc_id"), numBuckets = 1,
      options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
    t.write(mkDocs)
    t.compact() // raw-convertible: the native columnar path serves the scan
    t.deleteDv(col("doc_id") === 2L)
    val df = spark.sql(
      s"""SELECT doc_id, variant_get(meta, '$$.text_len', 'int') AS tl
         |FROM vsql.db.t_dv ORDER BY doc_id""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((0L, 11), (1L, 22), (3L, 44)))
    val plan = planOf(df)
    assert(!plan.contains("variant_get"), plan)
    assert(plan.contains("GraftVariantBatchScan"), plan)
  }
}
