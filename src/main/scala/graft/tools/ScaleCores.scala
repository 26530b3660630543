package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Core-count scaling probe at a SF where parallelism is measurable (r13
 * verdict "make the scaling contract informative"): at sf0.1 every headline
 * query sits at the per-job dispatch floor (0.03-0.7 s), so 8 cores tie 32
 * and the driver's low-vs-high-core ratios are ≈1 regardless of engine
 * parallelism. This tool times the heavy engine queries over an sf1-scale
 * dataset (generate with [[GenSf1]]) under the SAME env contract as Bench
 * (`SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_CPUS`, master local[$cpus], shuffle
 * partitions = cpus) and prints ONE JSON line; run it once per core count
 * and compare:
 *
 *   runMain graft.tools.GenSf1 /tmp/graft-sf1
 *   SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_CPUS=32 runMain graft.tools.ScaleCores
 *   SPARK_GRAFT_SF_DIR=/tmp/graft-sf1 SPARK_GRAFT_CPUS=8  runMain graft.tools.ScaleCores
 *
 * Methodology matches Bench: untimed fixture prebuild, two untimed warm
 * passes, then best-of-N timed runs (N = SPARK_GRAFT_BENCH_RUNS, default 3).
 */
object ScaleCores {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_SCALE_QUERIES",
      "q_dedup_minhash,q_fulltext_bm25,q_embed_neardup").split(',').toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach { n => // untimed prebuild (fixtures) + 2 warm passes
      val t0 = System.nanoTime()
      try { (1 to 3).foreach(_ => qs(n)(spark, sfDir).collect()) }
      catch { case e: Throwable =>
        System.err.println(s"[scalecores] prebuild $n failed: ${e.getMessage}") }
      System.err.println(
        f"[scalecores] prebuild+warm $n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val times = names.map { n =>
      val (ts, errs) = graft.Bench.timedRuns(nRuns) { qs(n)(spark, sfDir).collect() }
      (n, ts, errs)
    }
    def f3(v: Double) = f"$v%.3f"
    val qj = times.map { case (n, ts, _) =>
      s""""$n":${if (ts.isEmpty) "null" else f3(ts.min)}""" }.mkString(",")
    val rj = times.map { case (n, ts, _) =>
      s""""$n":[${ts.map(f3).mkString(",")}]""" }.mkString(",")
    println(s"""{"metric":"scale_cores","cpus":$cpus,"sf":"$sfDir"""" +
      s""","best":{$qj},"runs":{$rj},"errors":{${
        times.collect { case (n, _, e) if e > 0 => s""""$n":$e""" }.mkString(",")
      }}}""")
    spark.stop()
  }
}
