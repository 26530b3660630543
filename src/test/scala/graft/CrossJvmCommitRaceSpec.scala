package graft

import graft.core._
import org.apache.spark.sql.functions._

import java.io.File
import java.util.concurrent.TimeUnit

/**
 * Cross-PROCESS commit-race differential: two freshly spawned JVMs (no
 * shared memory, no shared Spark session) append interleaved commit waves
 * to one table while one of them also compacts. The in-JVM CAS test
 * (CoreTableSpec) proves the retry loop; this proves the 100-TB posture —
 * two independent drivers on one table — because the CAS primitive and the
 * conflict check must hold through the FILESYSTEM alone.
 *
 * Asserts: every row of both writers survives, the snapshot chain is
 * gapless, and at least one CAS race was actually lost-and-retried
 * (start-barrier sentinel files force the loops to overlap).
 */
class CrossJvmCommitRaceSpec extends SparkTestBase {
  import spark.implicits._

  // the test JVM is forked (Test / fork := true), so its java.class.path IS
  // the full test classpath incl. the Spark jars — portable across machines
  // where Spark lives somewhere other than /opt/spark/jars (ADVICE r11)
  private def classpath: String = System.getProperty("java.class.path")

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("two spark drivers race commits on one table: no lost rows, gapless chain, retries observed") {
    val loc = tmpLoc("xrace")
    val syncDir = java.nio.file.Files.createTempDirectory("graft-xrace-sync").toFile
    val t0 = GraftTable.create(spark, loc,
      Seq(("seed", "S")).toDF("k", "w").schema, TableConfig())
    t0.write(Seq(("seed", "S")).toDF("k", "w"))
    val commitsEach = 20
    val javaBin = new File(new File(System.getProperty("java.home"), "bin"), "java").getPath
    def spawn(id: String): (Process, File) = {
      val out = File.createTempFile(s"xrace-$id", ".log")
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx1500m", "-cp", classpath,
        "graft.tools.RaceWriter", loc, syncDir.getPath, id, commitsEach.toString))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(out)
      (pb.start(), out)
    }
    val (pa, oa) = spawn("A")
    val (pb2, ob) = spawn("B")
    try {
      // barrier: wait for both JVMs to be up with the table loaded, then go
      val deadline = System.currentTimeMillis() + 120000L
      def ready(id: String) = new File(syncDir, s"ready-$id").exists()
      while ((!ready("A") || !ready("B")) && System.currentTimeMillis() < deadline)
        Thread.sleep(100L)
      assert(ready("A") && ready("B"), s"writers never became ready:" +
        s"\nA:\n${scala.io.Source.fromFile(oa).mkString.takeRight(2000)}" +
        s"\nB:\n${scala.io.Source.fromFile(ob).mkString.takeRight(2000)}")
      new File(syncDir, "go").createNewFile()
      // burst rounds: re-barrier the two JVMs each round and keep going
      // until cross-JVM CAS contention is actually observed (cumulative
      // retries > 0) or the round budget runs out. One window can miss
      // under full-suite load — that made the one-shot version flaky.
      val maxRounds = 12
      val burstDeadline = deadline + 240000L
      var roundsRun = 0
      var burstRetries = 0L
      def waitFor(f: File): Boolean = {
        while (!f.exists() && System.currentTimeMillis() < burstDeadline)
          Thread.sleep(50L)
        f.exists()
      }
      var continue = true
      while (continue && roundsRun < maxRounds && burstRetries == 0L) {
        val r = roundsRun
        continue = waitFor(new File(syncDir, s"ready2-A-$r")) &&
          waitFor(new File(syncDir, s"ready2-B-$r"))
        if (continue) {
          new File(syncDir, s"go2-$r").createNewFile()
          val da = new File(syncDir, s"done-A-$r")
          val db = new File(syncDir, s"done-B-$r")
          continue = waitFor(da) && waitFor(db)
          if (continue) {
            roundsRun += 1
            def cum(f: File): Long =
              new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
            burstRetries = cum(da) + cum(db)
          }
        }
      }
      new File(syncDir, "stopburst").createNewFile()
      assert(roundsRun > 0, "no burst round completed before the deadline")
      assert(pa.waitFor(180, TimeUnit.SECONDS), "writer A timed out")
      assert(pb2.waitFor(180, TimeUnit.SECONDS), "writer B timed out")
      def result(out: File): (Int, Long) = {
        val line = scala.io.Source.fromFile(out).getLines()
          .find(_.startsWith("RACE_RESULT")).getOrElse(
            fail(s"no RACE_RESULT in ${out.getPath}:\n" +
              scala.io.Source.fromFile(out).mkString.takeRight(2000)))
        val commits = "\"commits\":(\\d+)".r.findFirstMatchIn(line).get.group(1).toInt
        val retries = "\"retries\":(\\d+)".r.findFirstMatchIn(line).get.group(1).toLong
        (commits, retries)
      }
      assert(pa.exitValue() == 0, scala.io.Source.fromFile(oa).mkString.takeRight(2000))
      assert(pb2.exitValue() == 0, scala.io.Source.fromFile(ob).mkString.takeRight(2000))
      val (ca, ra) = result(oa)
      val (cb, rb) = result(ob)
      assert(ca == commitsEach && cb == commitsEach)
      // both writers' rows all survive the race and the mid-race compaction
      val t = GraftTable.load(spark, loc)
      val byWriter = t.read().groupBy("w").count()
        .as[(String, Long)].collect().toMap
      assert(byWriter.get("A").contains(commitsEach * 10L), s"got $byWriter")
      assert(byWriter.get("B").contains(commitsEach * 10L), s"got $byWriter")
      assert(byWriter.get("S").contains(1L), s"got $byWriter")
      // gapless snapshot chain: ids 1..latest all present, exactly one per
      // commit (seed + 2×commits appends + A's compaction + 2×30 per round)
      val ids = t.sm.snapshotIds.sorted
      assert(ids == (1L to ids.max), s"snapshot chain has gaps: $ids")
      assert(ids.max == 1L + 2L * commitsEach + 1L + 60L * roundsRun,
        s"expected ${2 * commitsEach + 2 + 60 * roundsRun} snapshots " +
          s"($roundsRun burst rounds), got ${ids.max}")
      // the race was real: someone lost at least one CAS round across the
      // re-barriered burst rounds (integrity above holds regardless)
      assert(ra + rb > 0L,
        s"no CAS retries observed (A=$ra B=$rb) after $roundsRun burst rounds")
    } finally {
      pa.destroyForcibly(); pb2.destroyForcibly()
    }
  }
}
