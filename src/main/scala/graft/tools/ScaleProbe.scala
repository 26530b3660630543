package graft.tools

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe: engine behavior on a 10x-replicated lineitem (≈6M rows at
 * sf0.1) — write/upsert throughput, merge-on-read vs post-compaction scan,
 * pruned reads (with skipped-file counts from the metrics registry), point
 * lookups and manifest-only aggregates. One JSON line so runs are
 * comparable across sessions. This is evidence, not the bench: the driver's
 * BENCH stays at sf0.1 parquet scale.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ScaleProbe
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val reps = spark.range(replicas).select(col("id").as("__rep"))
    // pk unique per source row (the synthetic lineitem repeats
    // (orderkey, linenumber), so a monotonic id is the only safe key)
    val big = li.withColumn("__src", monotonically_increasing_id())
      .crossJoin(broadcast(reps))
      .withColumn("pk", col("__src") * lit(replicas.toLong) + col("__rep"))
      .drop("__rep", "__src")
    val nRows = li.count() * replicas

    val loc = java.nio.file.Files.createTempDirectory("graft-scale")
      .resolve("t").toString
    val t = GraftTable.create(spark, loc, big.schema,
      TableConfig(primaryKeys = Seq("pk"), numBuckets = 32))

    val (_, wSec) = timed(t.write(big))
    // 5% upsert (new values for pk % 20 == 0)
    val upd = big.filter(col("pk") % 20 === 0)
      .withColumn("l_quantity", col("l_quantity") + 1)
    val (_, uSec) = timed(t.write(upd))
    // merge-on-read with two sorted runs outstanding: relational merge
    // (library plan, shuffle) vs merge-in-scan (GraftMorScan, zero exchange)
    val (morCnt, morSec) = timed(t.read().count())
    val (morScanCnt, morScanSec) = timed(
      spark.read.format("graft").load(loc).count())
    require(morScanCnt == morCnt, s"mor-scan $morScanCnt != $morCnt")
    val (_, cSec) = timed(t.compact())
    // post-compaction: native columnar scan
    val (rawCnt, rawSec) = timed(t.read().count())
    // real keys from the table (the synthetic ids are sparse)
    val Array(loPk, hiPk) = t.read().agg(min("pk"), max("pk")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val somePk = t.read(Some(col("pk") >= (loPk + hiPk) / 2))
      .select("pk").head().getLong(0)
    // range read: hash-bucketed PK layout cannot file-skip on ranges (by
    // design — clustering/z-order is the range path), so this measures the
    // full-scan-with-residual-filter cost
    val (selCnt, pSec) = timed(
      t.read(Some(col("pk").between(loPk, loPk + (hiPk - loPk) / 1000))).count())
    // point lookup: bucket pruning plans exactly the key's bucket
    val (_, lkSec) = timed(t.read(Some(col("pk") === somePk)).count())
    val skipped = GraftMetrics.forTable(loc).rows.collectFirst {
      case ("lastScanSkippedTableFiles", _, v) => v.toLong }.getOrElse(-1L)
    val planned = GraftMetrics.forTable(loc).rows.collectFirst {
      case ("lastScanResultedTableFiles", _, v) => v.toLong }.getOrElse(-1L)
    // manifest-only aggregate
    val (aggRows, aSec) = timed(t.aggFromManifest(
      Seq(("cnt", "count", "*"))).head().getLong(0))
    // direct-Spark comparison: same replicated set as raw parquet
    val pqLoc = java.nio.file.Files.createTempDirectory("graft-scale-pq")
      .resolve("p").toString
    big.write.parquet(pqLoc)
    val (pqCnt, pqSec) = timed(spark.read.parquet(pqLoc).count())

    println(
      f"""{"probe":"scale","rows":$nRows,"write_s":$wSec%.1f,"write_rows_per_s":${(nRows / wSec).toLong},"upsert_s":$uSec%.1f,"mor_read_s":$morSec%.2f,"mor_scan_s":$morScanSec%.2f,"compact_s":$cSec%.1f,"raw_read_s":$rawSec%.2f,"parquet_read_s":$pqSec%.2f,"range_read_s":$pSec%.2f,"lookup_s":$lkSec%.2f,"lookup_planned_files":$planned,"lookup_skipped_files":$skipped,"agg_manifest_s":$aSec%.3f,"checks":{"mor":$morCnt,"raw":$rawCnt,"sel":$selCnt,"agg":$aggRows,"pq":$pqCnt}}""")
    spark.stop()
  }
}
