package graft.tools

import graft.pipeline.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Head-to-head of LSH candidate-stage spellings (round 13): window-rank
  * cap vs bounded-set aggregate, wide (md5-string) vs narrow (long) bucket
  * keys, ObjectHashAggregate fallback threshold raised vs default. */
object ProbeBanding {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Any): Unit = {
      (1 to 2).foreach(_ => f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"== $name: best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val d2 = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" xq yq zq")).as("text")))
    val perDoc = Dedup.minhashSignatures(d2, "doc_id", "text", 3, 8).persist()
    perDoc.count()
    val reps = perDoc.groupBy("__fp")
      .agg(first(col("__hsd")).as("__hsd"), first(col("__sig")).as("__sig"),
        first(col("__n")).as("__n"))
      .persist()
    reps.count()
    val rpb = 2

    def bandedWide = reps.select(col("__fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), TextOps.bandKey(col("__sig"), b, rpb).as("bk"))): _*)).as("b"))
      .select(col("__fp"), col("b.band").as("band"), col("b.bk").as("bk"))

    // narrow: 64-bit hash of (band, sig slice) as the bucket key
    def bandedNarrow = reps.select(col("__fp"),
      explode(array((0 until 4).map(b =>
        xxhash64(lit(b), slice(col("__sig"), b * rpb + 1, rpb))): _*)).as("bk"))

    def expand(ids: org.apache.spark.sql.DataFrame) = ids
      .filter(size(col("__ids")) > 1)
      .select(explode(expr(
        """flatten(transform(__ids, (x, i) ->
          |  transform(filter(__ids, y -> y > x), y -> struct(x AS f1, y AS f2))))"""
          .stripMargin)).as("p"))
      .select(col("p.f1"), col("p.f2"))
      .distinct()

    def cnt(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1))).collect()(0).getLong(0)

    // (a) window cap + collect_list, wide keys (the r12 shape)
    time("a_window_wide") {
      cnt(expand(bandedWide
        .withColumn("__rn", row_number().over(
          Window.partitionBy("band", "bk").orderBy(col("__fp"))))
        .filter(col("__rn") <= 1024)
        .groupBy("band", "bk")
        .agg(collect_list(col("__fp")).as("__ids"))))
    }
    // (b) capped set agg, wide keys, default fallback threshold
    time("b_cappedagg_wide") {
      cnt(expand(bandedWide.groupBy("band", "bk")
        .agg(graft.functions.GraftAggs.cappedSortedSet(col("__fp"), 1024).as("__ids"))))
    }
    // (c) capped agg, wide keys, raised fallback threshold
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
    time("c_cappedagg_wide_thresh") {
      cnt(expand(bandedWide.groupBy("band", "bk")
        .agg(graft.functions.GraftAggs.cappedSortedSet(col("__fp"), 1024).as("__ids"))))
    }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    // (d) window cap + collect_list, narrow keys
    time("d_window_narrow") {
      cnt(expand(bandedNarrow
        .withColumn("__rn", row_number().over(
          Window.partitionBy("bk").orderBy(col("__fp"))))
        .filter(col("__rn") <= 1024)
        .groupBy("bk")
        .agg(collect_list(col("__fp")).as("__ids"))))
    }
    // (e) capped agg, narrow keys, raised threshold
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
    time("e_cappedagg_narrow_thresh") {
      cnt(expand(bandedNarrow.groupBy("bk")
        .agg(graft.functions.GraftAggs.cappedSortedSet(col("__fp"), 1024).as("__ids"))))
    }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    // (f) capped agg, narrow keys, default threshold
    time("f_cappedagg_narrow") {
      cnt(expand(bandedNarrow.groupBy("bk")
        .agg(graft.functions.GraftAggs.cappedSortedSet(col("__fp"), 1024).as("__ids"))))
    }
    spark.stop()
  }
}
