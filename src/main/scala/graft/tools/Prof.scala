package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: run one SparkEntry query N times and print
  * per-run wall times (steady state vs first run), plus the formatted plan
  * when PROF_EXPLAIN=1. Usage: runMain graft.tools.Prof q_name [n] */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_minhash")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val cnt = q(spark, sfDir).collect().length
      println(f"[prof] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$cnt")
    }
    if (sys.env.get("PROF_EXPLAIN").contains("1"))
      q(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
