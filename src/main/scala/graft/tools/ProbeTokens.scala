package graft.tools

import graft.pipeline.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of q_text_tokens' native tokenCount vs its direct-Spark baseline
  * (size(split(...))) in ONE JVM, interleaved, to separate plan cost from
  * bench phase noise. */
object ProbeTokens {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def native() = docs.groupBy("lang")
      .agg(sum(TextOps.tokenCount(col("text"))).as("n_tokens"),
        count(lit(1)).as("docs")).collect()
    def baseline() = docs.groupBy("lang")
      .agg(sum(when(length(trim(col("text"))) === 0, 0)
        .otherwise(size(split(trim(col("text")), "\\s+")))).as("n_tokens"),
        count(lit(1)).as("docs")).collect()
    (1 to 3).foreach { _ => native(); baseline() }
    val pairs = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); native(); val tn = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); baseline(); val tb = (System.nanoTime() - t1) / 1e9
      (tn, tb)
    }
    println(f"native  : ${pairs.map(_._1).min}%.3f  runs=${pairs.map(p => f"${p._1}%.3f").mkString(",")}")
    println(f"baseline: ${pairs.map(_._2).min}%.3f  runs=${pairs.map(p => f"${p._2}%.3f").mkString(",")}")
    spark.stop()
  }
}
