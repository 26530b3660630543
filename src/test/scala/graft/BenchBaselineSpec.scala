package graft

import org.apache.spark.sql.functions._

/** The bench artifact's direct-Spark baselines must stay ANSWER-EQUIVALENT
  * to the graft queries they are compared against — a baseline that drifts
  * (or stops parsing) would silently skew the published ratios. Runs every
  * baselined query at sf0.001 and checks row equality. */
class BenchBaselineSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("every bench baseline computes the same answer as its graft query") {
    Seq("orders", "events", "lineitem", "customer", "nation", "documents")
      .foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
      }
    Bench.baselineSql.foreach { case (name, sql) =>
      val base = spark.sql(sql)
      val graft = SparkEntry.queries(name)(spark, sfDir)
      // align by position: baselines use the same column order as the query
      val renamed = base.toDF(graft.columns: _*)
      assertSameRows(graft, renamed)
    }
    // DataFrame-shaped baselines (the LLM-pipeline headline queries) hold
    // the same contract: answer-equivalent to the graft query they gate
    Bench.baselineFns.foreach { case (name, fn) =>
      val base = fn(spark, sfDir)
      val graft = SparkEntry.queries(name)(spark, sfDir)
      assertSameRows(graft, base.toDF(graft.columns: _*))
    }
  }

  test("a poisoned timed run is flagged in the errors map, never a silent fast sample") {
    // a query that starts failing AFTER its prebuild must not post its
    // time-to-throw: failed runs are EXCLUDED from the samples (min/median
    // can never carry one) and counted in the per-query error map
    var n = 0
    val (times, errs) = Bench.timedRuns(4) {
      n += 1
      if (n >= 3) throw new RuntimeException("poisoned")
    }
    assert(times.length == 2 && errs == 2)
    val json = Bench.errorsJson(Seq(
      "q_ok" -> ((Seq(0.1, 0.1), 0)), "q_poisoned" -> ((times, errs))))
    assert(json == """{"q_poisoned":2}""", json)
    assert(Bench.errorsJson(Seq("q_ok" -> ((Seq(0.1), 0)))) == "{}")
    // all-runs-failed → zero samples, so every aggregate of it must go null
    val (none, allErrs) = Bench.timedRuns(3) { throw new RuntimeException("x") }
    assert(none.isEmpty && allErrs == 3)
  }

  test("normalized medians cancel uniform host slowdown (calibration units)") {
    // the artifact's round-over-round signal: medians divided by the mean of
    // the bracketing calibration medians. A synthetic 2x host slowdown —
    // every wall-clock sample doubles, INCLUDING the calibration — leaves
    // the normalized value unchanged; a 2x calibration-only change (host got
    // slower but the query didn't) halves it.
    val m = 1.2; val cal = 0.3
    val base = Bench.normalized(m, cal, cal)
    assert(math.abs(Bench.normalized(2 * m, 2 * cal, 2 * cal) - base) < 1e-12)
    assert(math.abs(Bench.normalized(m, 2 * cal, 2 * cal) - base / 2) < 1e-12)
    // asymmetric bracketing uses the mean of start/end
    assert(math.abs(Bench.normalized(m, 0.2, 0.4) - m / 0.3) < 1e-12)
  }

  test("the calibration workload is pure Spark-parquet and runs") {
    Bench.calibrationOnce(spark, sfDir) // warm
    val c = Bench.calibrate(spark, sfDir, n = 3)
    assert(c > 0.0)
  }

  test("no benched query definition runs a Spark action at construction " +
      "(prepare/measure separation: fixtures + query vectors are memoized)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.graft.SparkShims
    val qs = SparkEntry.queries
    // warm: builds every fixture and memoizes every query vector
    Bench.headline.foreach(n => qs(n)(spark, sfDir).collect())
    // a Dataset ACTION (first/collect/count — the r8/r9 pattern was a
    // .first() query-vector fetch) always runs under a SQL execution id;
    // parquet footer schema-inference jobs (metadata reads every
    // direct-Spark plan pays too) carry none — count executions, not jobs
    val execs = java.util.Collections.synchronizedSet(
      new java.util.HashSet[String]())
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        Option(j.properties.getProperty("spark.sql.execution.root.id"))
          .foreach(execs.add)
    }
    // construction-time point reads that ARE the measured search:
    // q_fulltext_bm25 builds its (term, df) broadcast relation from a
    // term-pruned point read — bounded by #query terms, part of every BM25
    // search by design
    val constructionIsSearch = Set("q_fulltext_bm25")
    // r14: the dedup pair pipelines MATERIALIZE at construction (eager
    // localCheckpoint — the boundary that releases their internal persists
    // so no plan-keyed cache outlives a call). Bench times construction +
    // collect together, so prepare/measure separation holds; the INVERTED
    // assertion below is the cache-hygiene guard — a fresh construction
    // must run its computation EVERY time (the r13 leak showed up as
    // timed runs reusing warm-phase caches and running ~no jobs).
    val constructionMaterializes =
      Set("q_dedup_minhash", "q_dedup_minhash_idx", "q_embed_neardup")
    spark.sparkContext.addSparkListener(l)
    try {
      val offenders = Bench.headline
        .filterNot(constructionIsSearch ++ constructionMaterializes)
        .flatMap { n =>
          SparkShims.waitListenerBus(spark)
          execs.clear()
          qs(n)(spark, sfDir) // construct the DataFrame, run NO action
          SparkShims.waitListenerBus(spark)
          if (!execs.isEmpty)
            Some(s"$n ran ${execs.size} action(s) at construction")
          else None
        }
      assert(offenders.isEmpty, offenders.mkString("; "))
      val lazyOffenders = constructionMaterializes.toSeq.flatMap { n =>
        SparkShims.waitListenerBus(spark)
        execs.clear()
        qs(n)(spark, sfDir) // construction IS the (timed) computation
        SparkShims.waitListenerBus(spark)
        if (execs.isEmpty)
          Some(s"$n ran NO action on a fresh construction — cached state " +
            "leaked across calls (r13 verdict What's-wrong #2)")
        else None
      }
      assert(lazyOffenders.isEmpty, lazyOffenders.mkString("; "))
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("pruned-family timed runs stay metadata-bounded (no plan-time job creep)") {
    // r10 watch item: the in-JVM ratios of the metadata-bound queries crept
    // up; re-measurement showed host noise, but this pins the invariant the
    // creep WOULD have signaled — a warmed pruned-family query executes in
    // a small fixed number of Spark jobs (the scan itself + a possible AQE
    // stage), with no per-run filesystem-probe or planning jobs sneaking in
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.graft.SparkShims
    val qs = SparkEntry.queries
    val pruned = Seq("q_topn", "q_partition_prune", "q_zorder_scan", "q_time_travel")
    pruned.foreach(n => qs(n)(spark, sfDir).collect()) // warm fixtures + plans
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val counts = pruned.map { n =>
        SparkShims.waitListenerBus(spark)
        jobs.set(0)
        qs(n)(spark, sfDir).collect()
        SparkShims.waitListenerBus(spark)
        n -> jobs.get()
      }
      val offenders = counts.filter(_._2 > 4)
      assert(offenders.isEmpty,
        s"metadata-bound queries ran too many jobs: $counts")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("bench output: compact stdout line fits the driver's 2000-char tail; " +
      "full artifact carries runs/baselines/ratios and round-trips a file") {
    // realistic shape: 19 headline queries with real-length names, 5 runs
    val names = Seq("q1_agg", "q_join_broadcast", "q_window", "q_rollup",
      "q_pk_dedup", "q_mor_read", "q_filter_pushdown", "q_time_travel",
      "q_partition_prune", "q_zorder_scan", "q_topn", "q_agg_pushdown",
      "q_dedup_exact", "q_dedup_minhash", "q_text_tokens", "q_lang_id",
      "q_fulltext_bm25", "q_ann_cosine", "q_embed_neardup")
    val results = names.map(n =>
      n -> ((Seq(1.234, 1.111, 0.987, 1.045, 1.2), 0)))
    val bases = names.take(8).map(n => n -> Seq(2.345, 2.1, 2.2, 2.4, 2.3))
    val tasks = names.map(n => n -> 32).toMap
    val compact = Bench.renderJson(results, bases, 0.233, 0.217,
      "/root/testdata/sf0.1", compact = true,
      artifact = Some("/root/repo/target/bench.json"), cpus = 32)
    val full = Bench.renderJson(results, bases, 0.233, 0.217,
      "/root/testdata/sf0.1", compact = false, cpus = 32, tasks = tasks)
    // the driver keeps the last 2000 stdout chars INCLUDING sbt's ~80-char
    // success trailer — leave real headroom
    assert(compact.length < 1800,
      s"compact stdout line too long for the tail window: ${compact.length}")
    assert(!compact.contains("\"runs\""))
    // both forms are valid JSON with the parse-critical keys
    val om = graft.core.Json.mapper
    val cj = om.readValue(compact, classOf[java.util.Map[String, Any]])
    Seq("metric", "value", "queries", "medians", "calibration",
      "normalized_medians", "median_total", "errors", "sf", "artifact", "cpus")
      .foreach(k => assert(cj.containsKey(k), s"compact missing $k"))
    val fj = om.readValue(full, classOf[java.util.Map[String, Any]])
    Seq("runs", "baselines", "ratios", "calibration", "normalized_medians",
      "cpus", "tasks")
      .foreach(k => assert(fj.containsKey(k), s"full missing $k"))
    // the scaling-contract evidence: honored cpu count + widest-stage tasks
    assert(cj.get("cpus") == 32)
    val tj = om.readTree(full).get("tasks")
    assert(tj != null && tj.get("q_dedup_minhash").asInt() == 32,
      s"full artifact tasks: $tj")
    // atomic artifact write round-trips
    val p = java.nio.file.Files.createTempDirectory("graft-bench-art")
      .resolve("bench.json").toString
    val written = Bench.writeArtifact(full, p)
    val back = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(written)),
      "UTF-8")
    assert(back.trim == full)
  }
}
