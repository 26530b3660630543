package graft

/** One-off deep sweep of the randomized LSM model (more seeds/ops than the
  * CI-bounded tests). Tagged by name so it can run selectively. */
class FuzzSweepSpec extends SparkTestBase {
  test("deep randomized sweep: 8 seeds x 14 ops across bucket modes") {
    val r = new RandomizedLsmSpec { }
    Seq(3L, 11L, 77L, 123L, 500L, 901L).foreach { s =>
      r.runScenarioPublic(seed = s, ops = 14, numBuckets = 1 + (s % 3).toInt)
    }
    r.runScenarioPublic(seed = 2000L, ops = 14, numBuckets = -1)
    r.runScenarioPublic(seed = 3000L, ops = 14, numBuckets = 1,
      extraOpts = Map("write.max-records-per-file" -> "11",
        "num-sorted-run.compaction-trigger" -> "4"))
  }
}
