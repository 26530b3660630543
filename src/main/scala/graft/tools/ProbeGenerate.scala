package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe: does an agg-over-explode plan on a bucketed table stay
  * exchange-free (clustering flows through GenerateExec), i.e. is the
  * Dsv2Spec "keeps the layout through Generate" test exercising the
  * elided-exchange path rather than passing vacuously? */
object ProbeGenerate {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe-gen").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.dsv2.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    spark.sql("""CREATE TABLE graft.db.buckgen (k BIGINT, arr ARRAY<DOUBLE>)
                 TBLPROPERTIES ('primary-key'='k', 'bucket'='4')""")
    spark.sql("INSERT INTO graft.db.buckgen SELECT id, array(id*1.0, id*2.0) FROM range(100)")
    import graft.core.RowOps._
    graft.core.GraftTable.load(spark, s"$wh/db.db/buckgen").compact()
    val df = spark.sql(
      """SELECT k, sum(x) AS s FROM
           (SELECT k, explode(arr) AS x FROM graft.db.buckgen) GROUP BY k""")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("== hasExchange: " + plan.contains("Exchange"))
    println(plan)
    spark.stop()
  }
}
