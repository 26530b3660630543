package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-JVM probe of the DSv2 catalog surface against the fixture warehouse. */
object ProbeSql {
  def main(args: Array[String]): Unit = {
    val wh = "/tmp/graft-fixtures/_root_testdata_sf0.01/sql-warehouse"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.g", "graft.dsv2.GraftCatalog")
      .config("spark.sql.catalog.g.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("== tables: " + spark.sql("SHOW TABLES IN g.db").collect().mkString(","))
    println("== count: " + spark.sql("SELECT count(*) FROM g.db.orders_sql").head().getLong(0))
    println("== filtered: " + spark.sql(
      "SELECT count(*) FROM g.db.orders_sql WHERE o_orderstatus = 'O'").head().getLong(0))
    try { spark.sql("SELECT * FROM g.db.nope").collect() }
    catch { case e: Exception => println("== probe missing table: " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
