package graft.tools

import org.apache.spark.sql.SparkSession

/** Print one SparkEntry query's result rows (ad-hoc oracle eyeballing).
  * Usage: runMain graft.tools.ShowQ q_name [sfDir] */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.show(50, truncate = false)
    if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
    spark.stop()
  }
}
