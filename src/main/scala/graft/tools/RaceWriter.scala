package graft.tools

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.SparkSession

/**
 * One arm of the cross-process commit-race differential: a standalone JVM
 * that appends `commits` waves of rows to an EXISTING shared table,
 * synchronizing its start with the other arm through sentinel files so the
 * two processes genuinely interleave their optimistic-commit loops (JVM
 * startup skew would otherwise serialize them). Writer "A" additionally
 * runs a full compaction mid-race, so rewrite-DELETE commits race the other
 * writer's appends too. The metadata-only burst phase runs in
 * coordinator-gated rounds (re-barriered each round) until the coordinator
 * has observed cross-JVM CAS contention or gives up — a single burst window
 * can miss under heavy host load, which made the one-shot version flaky.
 *
 * Prints one parseable line:
 * `RACE_RESULT {"writer":...,"commits":N,"retries":R}` where `retries` is
 * this JVM's cumulative CAS losses (GraftMetrics totalCommitRetries).
 * The in-JVM CAS test is CoreTableSpec's; this main exists because the
 * 100-TB posture needs the CROSS-process case — two drivers, one table,
 * no shared memory — which only a spawned-JVM differential can exercise.
 */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(loc, syncDir, writerId, commitsStr) = args.take(4)
    val commits = commitsStr.toInt
    val mode = if (args.length > 4) args(4) else "append"
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName(s"graft-race-$writerId")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = GraftTable.load(spark, loc)
    // start barrier: announce readiness, then wait for the coordinator
    val sync = new java.io.File(syncDir)
    new java.io.File(sync, s"ready-$writerId").createNewFile()
    // waits for `name`; returns false if `alt` appeared first (stop signal)
    def await(name: String, alt: String = ""): Boolean = {
      val f = new java.io.File(sync, name)
      val a = if (alt.isEmpty) null else new java.io.File(sync, alt)
      val deadline = System.currentTimeMillis() + 120000L
      while (!f.exists() && (a == null || !a.exists()) &&
        System.currentTimeMillis() < deadline) Thread.sleep(20L)
      if (a != null && a.exists() && !f.exists()) return false
      require(f.exists(), s"race coordinator never signalled $name")
      true
    }
    def cumulativeRetries(): Long = GraftMetrics.forTable(loc).rows
      .collectFirst { case ("totalCommitRetries", _, v) => v.toLong }
      .getOrElse(0L)
    // ---- postpone fixed-bucket arm: coordinator-gated rounds where writer
    // A's big batch forces a RESCALE (separate overwrite commit) while
    // writer B concurrently appends with the per-partition count it read —
    // the real-interleaving version of PostponeFixedBucketSpec's forged
    // mixed-layout state. Each round targets a fresh partition p<r> with
    // round-scoped keys (partition stays a function of the key); B jitters
    // its start across rounds to sweep the commit-window offsets. The
    // coordinator stops the rounds once it observes a mixed layout.
    if (mode == "postpone") {
      await("go")
      var round = 0
      var waves = 0
      var go2 = true
      while (go2) {
        new java.io.File(sync, s"ready2-$writerId-$round").createNewFile()
        if (!await(s"go2-$round", "stopburst")) go2 = false
        else {
          if (writerId == "B") Thread.sleep((round % 8) * 40L)
          val keyBase = round * 1000L
          val df =
            if (writerId == "A")
              (0 until 300).map(j => (keyBase + j, s"p$round", j.toDouble))
                .toDF("k", "p", "v")
            else
              (0 until 50).map(j => (keyBase + j, s"p$round", j + 0.5))
                .toDF("k", "p", "v")
          t.write(df)
          waves += 1
          val f = new java.io.File(sync, s"done-$writerId-$round")
          val tmp = new java.io.File(sync, s".done-$writerId-$round.tmp")
          java.nio.file.Files.write(tmp.toPath,
            cumulativeRetries().toString.getBytes("UTF-8"))
          tmp.renameTo(f)
          round += 1
        }
      }
      println(s"""RACE_RESULT {"writer":"$writerId","commits":$waves,"burst":0,"retries":${cumulativeRetries()}}""")
      spark.stop()
      return
    }
    await("go")
    (0 until commits).foreach { i =>
      t.write((0 until 10).map(j => (s"$writerId-$i-$j", writerId))
        .toDF("k", "w"))
      if (writerId == "A" && i == commits / 2) t.compact()
    }
    // burst phase, in coordinator-gated ROUNDS: metadata-only commits in a
    // tight loop from BOTH JVMs at once — the pure-CAS duty cycle is ~100%,
    // so a round where the two JVMs actually overlap observably loses CAS
    // races. Under heavy host load (the full test suite) a single window
    // can still miss, so the coordinator re-barriers round after round
    // until cumulative retries > 0 or its round budget runs out, then
    // drops the `stopburst` sentinel. Each round reports this JVM's
    // cumulative retry count via a per-round file.
    val burstPerRound = 30
    var round = 0
    var totalBurst = 0
    var go = true
    while (go) {
      new java.io.File(sync, s"ready2-$writerId-$round").createNewFile()
      if (!await(s"go2-$round", "stopburst")) { go = false }
      else {
        (0 until burstPerRound).foreach { i =>
          t.sm.commit(Nil, "APPEND", s"burst-$writerId-$round-$i", t.schema.id)
        }
        totalBurst += burstPerRound
        val f = new java.io.File(sync, s"done-$writerId-$round")
        val tmp = new java.io.File(sync, s".done-$writerId-$round.tmp")
        java.nio.file.Files.write(tmp.toPath,
          cumulativeRetries().toString.getBytes("UTF-8"))
        tmp.renameTo(f)
        round += 1
      }
    }
    // flush stdout as one line the parent can parse
    println(s"""RACE_RESULT {"writer":"$writerId","commits":$commits,"burst":$totalBurst,"retries":${cumulativeRetries()}}""")
    spark.stop()
  }
}
