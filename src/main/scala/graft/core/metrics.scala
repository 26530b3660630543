package graft.core

import scala.collection.concurrent.TrieMap

/**
 * Table-granularity metrics registry — capability of the reference's metrics
 * system (docs/maintenance/metrics.md; paimon-common metrics/Metrics.java,
 * operation/metrics/ScanMetrics.java / CommitMetrics.java /
 * CompactionMetrics.java): gauges, counters and small histograms updated by
 * the scan/commit/compaction paths and queryable as the `metrics` system
 * table (`SELECT * FROM t$metrics`).
 *
 * JVM-local by design: planning and commits are driver-side work, so each
 * driver measures its own operations — the same per-JVM metric-group posture
 * as the reference (which bridges them into Flink/Spark metric systems).
 * The registry additionally feeds the native scan's DSv2 driver metrics
 * (Spark SQL UI), the idiomatic Spark spelling of a "scan metrics bridge".
 */
object GraftMetrics {

  /** Fixed-capacity ring histogram: mean/min/max/p50/p90 over the last
    * `cap` observations (the reference uses a windowed DescriptiveStatistics
    * histogram of size 100 — same idea, dependency-free). */
  final class Hist(cap: Int = 100) {
    private val buf = new Array[Long](cap)
    private var n = 0L
    def record(v: Long): Unit = synchronized {
      buf((n % cap).toInt) = v; n += 1
    }
    def count: Long = synchronized(n)
    private def window: Seq[Long] = synchronized {
      (if (n >= cap) buf.toSeq else buf.take(n.toInt).toSeq)
    }
    def snapshot: Map[String, Double] = {
      val w = window
      if (w.isEmpty) Map("count" -> 0.0)
      else {
        val s = w.sorted
        def pct(p: Double) = s(math.min(s.size - 1, (p * s.size).toInt)).toDouble
        Map("count" -> n.toDouble, "mean" -> w.sum.toDouble / w.size,
          "min" -> s.head.toDouble, "max" -> s.last.toDouble,
          "p50" -> pct(0.5), "p90" -> pct(0.9))
      }
    }
  }

  final class TableMetrics {
    private[GraftMetrics] val counters = TrieMap.empty[String, Long]
    private[GraftMetrics] val gauges = TrieMap.empty[String, Long]
    private[GraftMetrics] val hists = TrieMap.empty[String, Hist]
    def inc(name: String, by: Long = 1L): Unit =
      counters.updateWith(name)(v => Some(v.getOrElse(0L) + by))
    def gauge(name: String, v: Long): Unit = gauges.update(name, v)
    def observe(name: String, v: Long): Unit =
      hists.getOrElseUpdate(name, new Hist()).record(v)

    /** One row per metric: (metric, type, value). Histograms expand to
      * `<name>_{count,mean,min,max,p50,p90}` gauge-like rows. */
    def rows: Seq[(String, String, Double)] = {
      val c = counters.toSeq.sortBy(_._1).map { case (k, v) => (k, "counter", v.toDouble) }
      val g = gauges.toSeq.sortBy(_._1).map { case (k, v) => (k, "gauge", v.toDouble) }
      val h = hists.toSeq.sortBy(_._1).flatMap { case (k, hist) =>
        hist.snapshot.toSeq.sortBy(_._1).map { case (s, v) => (s"${k}_$s", "histogram", v) }
      }
      c ++ g ++ h
    }
  }

  private val tables = TrieMap.empty[String, TableMetrics]

  def forTable(location: String): TableMetrics =
    tables.getOrElseUpdate(location, new TableMetrics)

  /** Scan metrics (paimon ScanMetrics): one planning pass. */
  def recordScan(location: String, durationMs: Long, snapshotId: Long,
                 manifests: Long, resultedFiles: Long, skippedFiles: Long): Unit = {
    val m = forTable(location)
    m.gauge("lastScanDuration", durationMs)
    m.observe("scanDuration", durationMs)
    m.gauge("lastScannedSnapshotId", snapshotId)
    m.gauge("lastScannedManifests", manifests)
    m.gauge("lastScanResultedTableFiles", resultedFiles)
    m.gauge("lastScanSkippedTableFiles", skippedFiles)
    m.inc("totalScans")
  }

  /** Commit metrics (paimon CommitMetrics): one snapshot commit. */
  def recordCommit(location: String, durationMs: Long, attempts: Long,
                   kind: String, filesAdded: Long, filesDeleted: Long,
                   changelogFiles: Long): Unit = {
    val m = forTable(location)
    m.gauge("lastCommitDuration", durationMs)
    m.observe("commitDuration", durationMs)
    m.gauge("lastCommitAttempts", attempts)
    // cumulative CAS-race losses (attempts beyond the first) — the
    // cross-process commit-race differential asserts this goes positive
    if (attempts > 1L) m.inc("totalCommitRetries", attempts - 1L)
    m.gauge("lastTableFilesAdded", filesAdded)
    m.gauge("lastTableFilesDeleted", filesDeleted)
    m.gauge("lastChangelogFilesAppended", changelogFiles)
    m.inc("totalCommits")
    if (kind == "COMPACT") m.inc("totalCompactCommits")
  }

  /** Compaction metrics (paimon CompactionMetrics): one table compaction. */
  def recordCompaction(location: String, durationMs: Long,
                       filesBefore: Long, filesAfter: Long): Unit = {
    val m = forTable(location)
    m.gauge("lastCompactionDuration", durationMs)
    m.observe("compactionDuration", durationMs)
    m.gauge("lastCompactionInputFiles", filesBefore)
    m.gauge("lastCompactionOutputFiles", filesAfter)
    m.inc("totalCompactions")
  }
}
