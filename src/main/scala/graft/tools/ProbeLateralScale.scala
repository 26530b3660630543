package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the SQL LATERAL spelling vs the DataFrame batchTopK API at a
  * corpus large enough that scan I/O dominates — after the r13 single-pass
  * fix the two should track each other (r12's exec paid a second full
  * corpus scan to re-attach hit columns, ~2x scan I/O on the SQL path). */
object ProbeLateralScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val wh = java.nio.file.Files.createTempDirectory("probe-lat-scale").toString
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val big = (0 until copies).map(i =>
      emb.select((col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
        col("embedding"), col("label"))).reduce(_ unionAll _)
    val loc = s"$wh/corpus"
    val t = GraftTable.create(spark, loc, big.schema,
      TableConfig(primaryKeys = Seq("vec_id"), numBuckets = 8))
    t.write(big)
    println(s"corpus rows = ${t.read().count()}")
    val corpus = t.read()
    val qs = emb.filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
    emb.filter(col("vec_id") < 10).select("vec_id", "embedding")
      .createOrReplaceTempView("q")
    val sql =
      s"""SELECT q.vec_id AS qid, r.vec_id, round(r.score, 6) AS s
         |FROM q, LATERAL (SELECT * FROM graft_vector_search('$loc',
         |  'embedding', q.embedding, 5)) r""".stripMargin
    def time(name: String)(body: => Long): Unit = {
      body // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s best=${ts.min}%.3f s  runs=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    time("batchTopK (API)") {
      graft.pipeline.Similarity.batchTopK(corpus, "vec_id", "embedding", qs, 5).count()
    }
    time("LATERAL (SQL)") { spark.sql(sql).count() }
    spark.stop()
  }
}
