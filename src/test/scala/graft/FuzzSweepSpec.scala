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

  test("fuzz x feature interactions: degraded stats, orc data files, fc producer") {
    val r = new RandomizedLsmSpec { }
    // degraded manifest stats must never change RESULTS — only pruning
    // opportunity. A stats-driven prune bug (null bounds treated as exact,
    // bad normalization) surfaces here as a model mismatch.
    r.runScenarioPublic(seed = 4100L, ops = 12, numBuckets = 2,
      extraOpts = Map("metadata.stats-mode" -> "none"))
    r.runScenarioPublic(seed = 4200L, ops = 12, numBuckets = 2,
      extraOpts = Map("metadata.stats-mode" -> "counts"))
    // orc/avro/row data files ride the same LSM write/merge/compact path
    // (V1 read; avro and row exercise the engine's own FileFormats)
    r.runScenarioPublic(seed = 4300L, ops = 12, numBuckets = 2,
      extraOpts = Map("file.format" -> "orc"))
    r.runScenarioPublic(seed = 4500L, ops = 12, numBuckets = 2,
      extraOpts = Map("file.format" -> "avro"))
    r.runScenarioPublic(seed = 4600L, ops = 12, numBuckets = 2,
      extraOpts = Map("file.format" -> "row"))
    // full-compaction changelog producer: compactions also cut changelog
    // files; merge/read results must stay identical
    r.runScenarioPublic(seed = 4400L, ops = 12, numBuckets = 2,
      extraOpts = Map("changelog-producer" -> "full-compaction",
        "full-compaction.delta-commits" -> "3"))
  }
}
