package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe of Spark 4.1's DSv2 variant-extraction pushdown protocol
  * (SupportsPushDownVariantExtractions) against a shredded graft table. */
object ProbeVariant {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.variant.pushVariantIntoScan", "true")
      .config("spark.sql.planChangeLog.level", "error")
      .config("spark.sql.planChangeLog.rules", "org.apache.spark.sql.execution.datasources.v2.V2ScanRelationPushDown")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val loc = "/tmp/graft-probe-variant/tbl"
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        parse_json(to_json(struct(col("lang"),
          length(col("text")).as("text_len")))).as("meta"))
    val t = GraftTable.create(spark, loc, docs.schema, TableConfig(
      options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
    t.write(docs)

    spark.read.format("graft").load(loc).schema.foreach(f =>
      println(s"[probe] relfield ${f.name} ${f.dataType} nullable=${f.nullable} meta=${f.metadata.json}"))
    val df = spark.read.format("graft").load(loc)
      .selectExpr("doc_id", "variant_get(meta, '$.lang', 'string') AS lang")
    try { df.explain("formatted") }
    catch { case e: Throwable => println("== explain FAILED: " + e) }
    try { println("== head: " + df.orderBy("doc_id").head()) }
    catch { case e: Throwable => println("== exec FAILED: " + e) }

    // filter-skipping probe: 4 files with disjoint text_len ranges; does a
    // SQL filter on the shredded path reach pushFilters (dotted struct name)
    // and skip files?
    val loc2 = "/tmp/graft-probe-variant/tbl2"
    val p2 = new org.apache.hadoop.fs.Path(loc2)
    if (fs.exists(p2)) fs.delete(p2, true)
    val t2 = GraftTable.create(spark, loc2, docs.schema, TableConfig(
      options = Map("fields.meta.shred" -> "$.lang:string,$.text_len:int")))
    (0 until 4).foreach { i =>
      t2.write(spark.range(i * 100, i * 100 + 100)
        .select(col("id").as("doc_id"),
          parse_json(to_json(struct(lit("en").as("lang"),
            (col("id") * 10).cast("int").as("text_len")))).as("meta")))
    }
    val fdf = spark.read.format("graft").load(loc2)
      .selectExpr("doc_id", "variant_get(meta, '$.text_len', 'int') AS tl")
      .filter(col("tl") > 3500)
    fdf.explain("formatted")
    println("== filtered count: " + fdf.count() + " (expect 49)")

    // control: Spark's OWN DSv2 parquet (ParquetScanBuilder implements
    // SupportsPushDownVariantExtractions) on the same data
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    docs.write.mode("overwrite").parquet("/tmp/graft-probe-variant/plain")
    val pdf = spark.read.parquet("/tmp/graft-probe-variant/plain")
      .selectExpr("doc_id", "variant_get(meta, '$.lang', 'string') AS lang")
    try { pdf.explain("formatted") }
    catch { case e: Throwable => println("== v2 parquet explain FAILED: " + e) }
    try { println("== v2 parquet head: " + pdf.orderBy("doc_id").head()) }
    catch { case e: Throwable => println("== v2 parquet exec FAILED: " + e) }
    spark.stop()
  }
}
