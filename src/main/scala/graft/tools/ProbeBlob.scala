package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose q_blob_bench's cost: upstream direct payload read vs the
  * view-resolution join, timed separately after a warm run each. */
object ProbeBlob {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-blob")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vt = graft.Fixtures.docsBlobBench(spark, sfDir)
    val upLoc = vt.location.replace("docs_blob_bench_view", "docs_blob_bench_up")
    val up = GraftTable.load(spark, upLoc)
    def time(name: String)(body: => Long): Unit = {
      body // warm
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  (rows=$n)")
    }
    time("up stored (no resolve)") {
      up.readStored().agg(count(lit(1))).head().getLong(0)
    }
    time("up resolve payloads") {
      up.read().agg(sum(length(col("payload")))).head().getLong(0)
    }
    time("up resolve + md5 distinct") {
      up.read().agg(countDistinct(md5(col("payload")))).head().getLong(0)
    }
    time("view stored (no resolve)") {
      vt.read(None, None, GraftTable.STORED_READ_OPTS)
        .agg(count(lit(1))).head().getLong(0)
    }
    time("view resolve (join+pread)") {
      vt.read().agg(sum(length(col("ref")))).head().getLong(0)
    }
    time("view full bench expr") {
      vt.read().agg(count(lit(1)), sum(length(col("ref"))),
        countDistinct(md5(col("ref")))).head().getLong(0)
    }
    spark.stop()
  }
}
