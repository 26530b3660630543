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
 * writer's appends too.
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
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t = GraftTable.load(spark, loc)
    // start barrier: announce readiness, then wait for the coordinator
    val sync = new java.io.File(syncDir)
    new java.io.File(sync, s"ready-$writerId").createNewFile()
    def await(name: String): Unit = {
      val f = new java.io.File(sync, name)
      val deadline = System.currentTimeMillis() + 120000L
      while (!f.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(50L)
      require(f.exists(), s"race coordinator never signalled $name")
    }
    await("go")
    (0 until commits).foreach { i =>
      t.write((0 until 10).map(j => (s"$writerId-$i-$j", writerId))
        .toDF("k", "w"))
      if (writerId == "A" && i == commits / 2) t.compact()
    }
    // burst phase: metadata-only commits in a tight loop from BOTH JVMs at
    // once (second barrier) — the pure-CAS duty cycle is ~100%, so at least
    // one side observably loses rounds; the data phase above rarely
    // collides because its per-commit Spark job dwarfs the CAS window
    val burst = 30
    new java.io.File(sync, s"ready2-$writerId").createNewFile()
    await("go2")
    (0 until burst).foreach { i =>
      t.sm.commit(Nil, "APPEND", s"burst-$writerId-$i", t.schema.id)
    }
    val retries = GraftMetrics.forTable(loc).rows
      .collectFirst { case ("totalCommitRetries", _, v) => v.toLong }
      .getOrElse(0L)
    // flush stdout as one line the parent can parse
    println(s"""RACE_RESULT {"writer":"$writerId","commits":$commits,"burst":$burst,"retries":$retries}""")
    spark.stop()
  }
}
