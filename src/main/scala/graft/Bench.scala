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
  private[graft] val headline = Seq(
    "q1_agg", "q_join_broadcast", "q_window", "q_rollup",
    "q_pk_dedup", "q_mor_read", "q_filter_pushdown", "q_time_travel",
    "q_partition_prune", "q_zorder_scan", "q_topn", "q_agg_pushdown",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_minhash_idx",
    "q_text_tokens", "q_lang_id",
    "q_fulltext_bm25", "q_ann_cosine", "q_embed_neardup", "q_blob_bench")

  /** Direct-Spark baselines for the engine-backed headline queries: what a
    * Spark user WITHOUT the engine runs over plain parquet for the same
    * answer. Scan-family queries reuse the oracle SQL (it is already the
    * direct plan). Merge-family queries (PK upsert semantics) must NOT use
    * the oracle's CASE shortcut — that exploits the fixture's deterministic
    * update wave, which no real pipeline has. The honest equivalent keeps
    * the base dump and the update wave as separate relations and computes
    * latest-per-key with a window, which is exactly the work the engine's
    * LSM replaces. Bench times these in the same JVM against the same data
    * and emits per-query baseline + ratio, so the graft-vs-direct-Spark
    * comparison ships inside the artifact instead of a one-off judge
    * measurement. */
  private val mergedState =
    """(SELECT * FROM (
      |   SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
      |     row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
      |   FROM (
      |     SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate, 1 AS seq
      |     FROM orders
      |     UNION ALL
      |     SELECT o_orderkey, o_orderstatus, o_totalprice * 2, o_orderdate, 2
      |     FROM orders WHERE o_orderkey % 10 = 0))
      | WHERE rn = 1)""".stripMargin

  private[graft] lazy val baselineSql: Map[String, String] = Map(
    "q_pk_dedup" ->
      s"""SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
         |FROM $mergedState m GROUP BY o_orderstatus""".stripMargin,
    "q_mor_read" ->
      s"""SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
         |FROM $mergedState m GROUP BY o_orderstatus""".stripMargin,
    "q_filter_pushdown" ->
      s"""SELECT count(*) AS cnt, round(sum(o_totalprice), 2) AS total
         |FROM $mergedState m
         |WHERE o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,
    // state at snapshot 1 = the base dump: a direct user reads their parquet
    "q_time_travel" -> SparkEntry.oracleSql("q_time_travel"),
    "q_partition_prune" -> SparkEntry.oracleSql("q_partition_prune"),
    "q_zorder_scan" -> SparkEntry.oracleSql("q_zorder_scan"),
    "q_topn" -> SparkEntry.oracleSql("q_topn"),
    "q_agg_pushdown" -> SparkEntry.oracleSql("q_agg_pushdown"))

  private val baselined = baselineSql.keys.toSeq.sorted

  /** Time `body` n times, recording per-run seconds of the SUCCESSFUL runs
    * plus how many runs threw. A failed run's time-to-throw never enters the
    * returned samples — min/median/total are computed only over runs that
    * returned, so a query failing on every run emits null, not a bogus-fast
    * number; the `errors` map carries the failure count either way. */
  private[graft] def timedRuns(n: Int)(body: => Unit): (Seq[Double], Int) = {
    var errs = 0
    val times = (1 to n).flatMap { _ =>
      val t0 = System.nanoTime()
      val ok =
        try { body; true }
        catch { case e: Throwable =>
          errs += 1
          System.err.println(s"[bench] timed run failed: ${e.getMessage}")
          false
        }
      if (ok) Some((System.nanoTime() - t0) / 1e9) else None
    }
    (times, errs)
  }

  /** The `errors` JSON object: every query with AT LEAST one failed timed
    * run, mapped to its failure count. Empty object = all runs returned. */
  private[graft] def errorsJson(results: Seq[(String, (Seq[Double], Int))]): String =
    results.collect { case (k, (_, e)) if e > 0 => s""""$k":$e""" }
      .mkString("{", ",", "}")

  /** Host-noise normalization: a per-query median divided by the mean of the
    * two calibration medians that bracket the timed phase. The calibration
    * workload is FIXED pure Spark-parquet (no graft code), so its drift
    * between rounds measures the HOST, not the engine — if background load
    * doubles every wall-clock sample, it also doubles the calibration, and
    * the normalized value (in "calibration units") is unchanged. This is the
    * round-over-round signal; raw seconds stay in the artifact for absolute
    * comparisons. */
  private[graft] def normalized(median: Double, calStart: Double,
                                calEnd: Double): Double =
    median / ((calStart + calEnd) / 2.0)

  /** The fixed calibration workload: a parquet scan + aggregation over the
    * source lineitem table — the same shape as the phase-4 direct-Spark
    * baselines, touching no graft code path, so its runtime is a pure
    * host-speed probe. */
  private[graft] def calibrationOnce(spark: SparkSession, sfDir: String): Unit = {
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .createOrReplaceTempView("__cal_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  sum(l_extendedprice) AS s, avg(l_discount) AS a
        |FROM __cal_lineitem GROUP BY 1, 2""".stripMargin).collect()
  }

  /** Median of `n` timed calibration runs (assumes a prior warm run). */
  private[graft] def calibrate(spark: SparkSession, sfDir: String,
                               n: Int = 3): Double = {
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      calibrationOnce(spark, sfDir)
      (System.nanoTime() - t0) / 1e9
    }
    ts.sorted.apply(n / 2)
  }

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
    // phase 2 — untimed warm passes: classloading + whole-stage-codegen JIT
    // (single cold runs are 2-4x steady state and dominated by noise; the
    // codegen-heaviest queries still JIT through their SECOND run, so warm
    // twice — warm-up belongs outside the timed region, not in its median)
    (1 to 2).foreach { _ =>
      headline.foreach { name =>
        try { qs(name)(spark, sfDir).collect() } catch { case _: Throwable => }
      }
    }

    // phase 3 — timed: N runs per query; `value` is the best (steady-state
    // throughput) and EVERY successful run is emitted, so host noise during
    // the driver's snapshot is visible in the artifact instead of silently
    // inflating a single number. A run that THROWS is counted in the
    // `errors` map and its time-to-throw is DISCARDED — a query that starts
    // failing after its prebuild can never post a bogus-fast sample. The
    // timed phase is BRACKETED by a fixed pure-Spark calibration workload
    // (start + end): `normalized_medians` divides each median by the mean
    // calibration, turning wall-clock seconds into host-speed-invariant
    // "calibration units" — the round-over-round signal that survives a
    // noisy driver host.
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt
    calibrationOnce(spark, sfDir) // warm the calibration plan once
    val calStart = calibrate(spark, sfDir)
    val results = headline.map { name =>
      name -> timedRuns(nRuns) { qs(name)(spark, sfDir).collect() }
    }
    // phase 4 — direct-Spark baselines over the SOURCE parquet (same JVM,
    // same data). The timed region includes spark.read.parquet + view
    // registration, matching the graft side, whose timed region includes
    // table load + manifest planning — both sides pay their full
    // query-to-result path. Warm once, then time nRuns.
    val baselineTables = Map(
      "q_pk_dedup" -> Seq("orders"), "q_mor_read" -> Seq("orders"),
      "q_filter_pushdown" -> Seq("orders"), "q_time_travel" -> Seq("orders"),
      "q_partition_prune" -> Seq("events"), "q_agg_pushdown" -> Seq("events"),
      "q_zorder_scan" -> Seq("lineitem"), "q_topn" -> Seq("lineitem"))
    val baseResults = baselined.flatMap { name =>
      def run(): Unit = {
        baselineTables(name).foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
        }
        spark.sql(baselineSql(name)).collect()
      }
      try {
        run() // warm
        val times = (1 to nRuns).map { _ =>
          val t0 = System.nanoTime()
          run()
          (System.nanoTime() - t0) / 1e9
        }
        Some(name -> times)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] baseline $name failed: ${e.getMessage}")
        None
      }
    }

    val calEnd = calibrate(spark, sfDir)

    val artifactPath = writeArtifact(
      renderJson(results, baseResults, calStart, calEnd, sfDir, compact = false))
    // the driver keeps only the LAST ~2000 chars of stdout: the final line
    // must be the COMPACT form (no per-run samples — those live in the file
    // artifact) or its head gets clipped and the driver's parse fails
    // (BENCH_r08/r09 both shipped parsed:null that way)
    println(renderJson(results, baseResults, calStart, calEnd, sfDir,
      compact = true, artifact = Some(artifactPath)))
    spark.stop()
  }

  /** Render the result JSON. `compact=false` is the FULL artifact (per-run
    * samples, baselines, ratios) written to [[writeArtifact]]'s file;
    * `compact=true` is the one-line stdout form sized to survive a
    * 2000-char log-tail window — medians/calibration/normalized medians
    * stay, the bulky `runs` object moves to the file (pointed to by
    * `artifact`). */
  private[graft] def renderJson(results: Seq[(String, (Seq[Double], Int))],
                                baseResults: Seq[(String, Seq[Double])],
                                calStart: Double, calEnd: Double,
                                sfDir: String, compact: Boolean,
                                artifact: Option[String] = None): String = {
    def f3(v: Double) = f"$v%.3f"
    def med(ts: Seq[Double]) = ts.sorted.apply(ts.length / 2)
    // a query whose runs ALL failed has no samples: null, never a number
    def j(ts: Seq[Double], f: Seq[Double] => Double): String =
      if (ts.isEmpty) "null" else f3(f(ts))
    val qJson = results.map { case (k, (ts, _)) => s""""$k":${j(ts, _.min)}""" }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, (ts, _)) =>
      s""""$k":[${ts.map(f3).mkString(",")}]""" }.mkString("{", ",", "}")
    val medJson = results.map { case (k, (ts, _)) =>
      s""""$k":${j(ts, med)}""" }.mkString("{", ",", "}")
    val normJson = results.map { case (k, (ts, _)) =>
      s""""$k":${j(ts, t => normalized(med(t), calStart, calEnd))}""" }
      .mkString("{", ",", "}")
    val baseJson = baseResults.map { case (k, ts) =>
      s""""$k":${f3(med(ts))}""" }.mkString("{", ",", "}")
    val graftMed = results.map { case (k, (ts, _)) => k -> ts }.toMap
    val ratioJson = baseResults.collect { case (k, ts) if graftMed(k).nonEmpty =>
      s""""$k":${f3(med(graftMed(k)) / med(ts))}""" }.mkString("{", ",", "}")
    val errJson = errorsJson(results)
    val ok = results.map(_._2._1).filter(_.nonEmpty)
    val total = ok.map(_.min).sum
    val totalMed = ok.map(med).sum
    val totalNorm = normalized(totalMed, calStart, calEnd)
    val common =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
        s""","queries":$qJson,"median_total":${f3(totalMed)}""" +
        s""","medians":$medJson,"calibration":{"start":${f3(calStart)}""" +
        s""","end":${f3(calEnd)}},"normalized_medians":$normJson""" +
        s""","median_total_normalized":${f3(totalNorm)},"errors":$errJson"""
    if (compact)
      common + s""","sf":"$sfDir"""" +
        artifact.map(p => s""","artifact":"$p"""").getOrElse("") + "}"
    else
      common + s""","baselines":$baseJson,"ratios":$ratioJson""" +
        s""","runs":$runsJson,"sf":"$sfDir"}"""
  }

  /** Atomically write the full artifact to target/bench.json (tmp +
    * ATOMIC_MOVE so a concurrent reader never sees a half-written file);
    * returns the absolute path. */
  private[graft] def writeArtifact(
      json: String, path: String = "target/bench.json"): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val target = Paths.get(path).toAbsolutePath
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, (json + "\n").getBytes("UTF-8"))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    System.err.println(s"[bench] full artifact: $target")
    target.toString
  }
}
