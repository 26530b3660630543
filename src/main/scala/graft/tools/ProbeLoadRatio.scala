package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-split probe for the pruned-family bench ratio creep under host
  * load: per iteration, times DataFrame BUILD (fixture resolution + plan
  * construction incl. planFiles) separately from EXECUTION (collect), for
  * the graft query and its direct-Spark baseline. Run it while `sbt test`
  * saturates the host to see which phase inflates. */
object ProbeLoadRatio {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-probe-load")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q_time_travel", "q_partition_prune", "q_zorder_scan")
    val queries = graft.SparkEntry.queries
    val baselines = graft.Bench.baselineSql
    // warm fixtures + JIT
    qs.foreach(q => queries(q)(spark, sfDir).collect())
    val baseTables = Map(
      "q_time_travel" -> "orders", "q_partition_prune" -> "events",
      "q_zorder_scan" -> "lineitem")
    def baseBuild(q: String): org.apache.spark.sql.DataFrame = {
      // bench shape: read.parquet + view registration inside the timed region
      spark.read.parquet(s"$sfDir/${baseTables(q)}.parquet")
        .createOrReplaceTempView(baseTables(q))
      spark.sql(baselines(q))
    }
    qs.foreach(q => baseBuild(q).collect())
    (1 to 5).foreach { it =>
      qs.foreach { q =>
        val t0 = System.nanoTime()
        val df = queries(q)(spark, sfDir)
        df.queryExecution.executedPlan // force planning
        val t1 = System.nanoTime()
        df.collect()
        val t2 = System.nanoTime()
        val b0 = System.nanoTime()
        val bdf = baseBuild(q)
        bdf.queryExecution.executedPlan
        val b1 = System.nanoTime()
        bdf.collect()
        val b2 = System.nanoTime()
        println(f"[$it] $q%-18s build=${(t1 - t0) / 1e6}%8.1f ms exec=${(t2 - t1) / 1e6}%8.1f ms | base build=${(b1 - b0) / 1e6}%8.1f exec=${(b2 - b1) / 1e6}%8.1f")
      }
    }
    spark.stop()
  }
}
