package graft.tools

import graft.pipeline.Indexes
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the BM25 df side: driver collect + local-relation broadcast
  * (old) vs broadcast of the term-stats point read (new), one JVM,
  * interleaved. */
object ProbeBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = graft.Fixtures.ftIndex(spark, sfDir)
    val terms = Seq("table", "scan", "fast", "merge")
    def runNew() = Indexes.fullTextSearch(spark, idx.location, terms, 1000000)
      .select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10).collect()
    def runOld() = {
      val rows = Indexes.termDfRows(spark, idx.location, terms)
      Indexes.fullTextScoresFromDf(spark, idx.location, terms, rows)
        .orderBy(col("score").desc, col("doc_id")).limit(1000000)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10).collect()
    }
    (1 to 3).foreach { _ => runNew(); runOld() }
    val pairs = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); runNew(); val tn = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); runOld(); val to = (System.nanoTime() - t1) / 1e9
      (tn, to)
    }
    println(f"new(broadcast read): ${pairs.map(_._1).min}%.3f  runs=${pairs.map(p => f"${p._1}%.3f").mkString(",")}")
    println(f"old(collect rows)  : ${pairs.map(_._2).min}%.3f  runs=${pairs.map(p => f"${p._2}%.3f").mkString(",")}")
    spark.stop()
  }
}
