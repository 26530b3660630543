package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the fixed driver latency of one engine read: table load,
  * manifest planning, DataFrame construction, execution — the floor that
  * dominates engine-query bench medians at small SF. */
object ProbeReadPath {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val loc = graft.Fixtures.ordersPk(spark, sfDir).location
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }
    // warm everything once
    GraftTable.load(spark, loc).read().agg(count(lit(1))).collect()
    (1 to 3).foreach { i =>
      println(s"--- iteration $i")
      val t = time("GraftTable.load")(GraftTable.load(spark, loc))
      val entries = time("planFiles")(t.planFiles())
      println(s"[probe]   entries=${entries.size}")
      val df = time("read() construct")(t.read())
      val agg = time("agg plan")(df.agg(count(lit(1)), sum("o_totalprice")))
      time("collect")(agg.collect())
      time("end-to-end")(
        GraftTable.load(spark, loc).read()
          .agg(count(lit(1)), sum("o_totalprice")).collect())
    }
    spark.stop()
  }
}
