package graft.tools

import graft.pipeline.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the minhash pipeline cost at a given SF. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach(_ => f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"== $name: best=${ts.min}%.3f")
    }
    time("shingles_only") {
      docs.select(size(TextOps.shingles(col("text"), 3)).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    time("shingle_hashes") {
      docs.select(size(TextOps.shingleHashes(
        TextOps.shingles(col("text"), 3))).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    time("full_signature") {
      docs.select(size(TextOps.minhashSignature(
        TextOps.shingles(col("text"), 3), 8)).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    time("native_hashes") {
      docs.select(size(TextOps.shingleHashesNative(col("text"), 3)).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    time("native_signature") {
      docs.select(col("doc_id"),
          TextOps.shingleHashesNative(col("text"), 3).as("__hs"))
        .select(size(TextOps.minhashFromHashes(col("__hs"), 8)).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    time("native_onepass_signature") {
      docs.select(col("doc_id"),
          TextOps.shingleHashesNative(col("text"), 3).as("__hs"))
        .select(size(TextOps.minhashFromHashesNative(col("__hs"), 8)).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    time("base_stage_full") {
      docs.select(col("doc_id"),
          TextOps.shingleHashesNative(col("text"), 3).as("__hs"))
        .select(col("doc_id"), array_distinct(col("__hs")).as("__hsd"),
          TextOps.minhashFromHashesNative(col("__hs"), 8).as("__sig"))
        .select((size(col("__hsd")) + size(col("__sig"))).as("n"))
        .agg(sum("n")).head().getLong(0)
    }
    spark.stop()
  }
}
