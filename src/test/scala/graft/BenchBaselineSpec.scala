package graft

import org.apache.spark.sql.functions._

/** The bench artifact's direct-Spark baselines must stay ANSWER-EQUIVALENT
  * to the graft queries they are compared against — a baseline that drifts
  * (or stops parsing) would silently skew the published ratios. Runs every
  * baselined query at sf0.001 and checks row equality. */
class BenchBaselineSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("every bench baseline computes the same answer as its graft query") {
    Seq("orders", "events", "lineitem").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    Bench.baselineSql.foreach { case (name, sql) =>
      val base = spark.sql(sql)
      val graft = SparkEntry.queries(name)(spark, sfDir)
      // align by position: baselines use the same column order as the query
      val renamed = base.toDF(graft.columns: _*)
      assertSameRows(graft, renamed)
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
}
