package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan probe: does a window over a bucket-keyed graft CATALOG table
  * (DSv2 scan, KeyGroupedPartitioning via the FunctionCatalog bucket
  * transform) skip the exchange? */
object ProbeWindow {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wh = java.nio.file.Files.createTempDirectory("probe-win-wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .config("spark.sql.catalog.gpw", "graft.dsv2.GraftCatalog")
      .config("spark.sql.catalog.gpw.warehouse", wh)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("src")
    spark.sql("CREATE NAMESPACE gpw.db")
    spark.sql("""CREATE TABLE gpw.db.ob (o_orderkey BIGINT, o_custkey BIGINT,
      o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ,
      o_orderpriority STRING) TBLPROPERTIES ('bucket-key'='o_custkey','bucket'='8')""")
    spark.sql("INSERT INTO gpw.db.ob SELECT * FROM src")
    val df = spark.sql("""
      SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM gpw.db.ob) WHERE rn <= 3""")
    df.collect()
    println("== PLAN ==")
    println(df.queryExecution.executedPlan.toString.take(2500))
    println("== rows: " + df.count())
    spark.stop()
  }
}
