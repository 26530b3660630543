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
    // a query that starts failing AFTER its prebuild records time-to-throw —
    // the artifact must carry a per-query error count so that number can
    // never read as a legitimate (fast!) result
    var n = 0
    val (times, errs) = Bench.timedRuns(4) {
      n += 1
      if (n >= 3) throw new RuntimeException("poisoned")
    }
    assert(times.length == 4 && errs == 2)
    val json = Bench.errorsJson(Seq(
      "q_ok" -> ((Seq(0.1, 0.1), 0)), "q_poisoned" -> ((times, errs))))
    assert(json == """{"q_poisoned":2}""", json)
    assert(Bench.errorsJson(Seq("q_ok" -> ((Seq(0.1), 0)))) == "{}")
  }
}
