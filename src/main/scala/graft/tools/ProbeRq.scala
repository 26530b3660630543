package graft.tools

import graft.core._
import graft.pipeline.{Indexes, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe of the IVF-RQ index: full-build vs build+append, ADC candidate
  * quality vs exact brute force. */
object ProbeRq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    println(s"[rq] corpus rows=${emb.count()}")
    val q = emb.filter(col("vec_id") === 1).select("embedding")
      .first().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(emb, "embedding", q, 10, "cosine", "sim")
      .select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    println("[rq] exact top10: " + exact.mkString(" "))

    val base = "/tmp/graft-probe-rq"
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)

    // full single build
    Indexes.buildIvfRq(spark, emb, "embedding", s"$base/full", dim = 64)
    val full = Indexes.rqSearch(spark, s"$base/full", "embedding", q, 10,
      nprobe = 8, rerank = 100, scoreCol = "sim")
      .select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    println("[rq] full  top10: " + full.mkString(" "))

    // build 90% + append 10%
    Indexes.buildIvfRq(spark, emb.filter(col("vec_id") % 10 =!= 0),
      "embedding", s"$base/app", dim = 64)
    Indexes.appendToIvfRq(spark, emb.filter(col("vec_id") % 10 === 0),
      "embedding", s"$base/app")
    val app = Indexes.rqSearch(spark, s"$base/app", "embedding", q, 10,
      nprobe = 8, rerank = 100, scoreCol = "sim")
      .select("vec_id", "sim").collect().map(r => (r.getLong(0), r.getDouble(1)))
    println("[rq] app   top10: " + app.mkString(" "))

    // ADC-rank position of the exact top-10 in the full index
    val model = Indexes.loadRqModel(spark, s"$base/full")
    val t = GraftTable.load(spark, s"$base/full")
    val adc = t.read()
      .withColumn("__adc", model.adcScoreUdf(q)(col("__rq"), col("__ivf_cluster")))
      .orderBy(col("__adc").desc)
      .select("vec_id").as[Long].collect()
    val pos = exact.map { case (id, _) => id -> adc.indexOf(id) }
    println("[rq] ADC positions of exact top10: " + pos.mkString(" "))
    spark.stop()
  }
}
