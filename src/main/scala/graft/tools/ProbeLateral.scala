package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: SQL LATERAL graft_vector_search end-to-end. */
object ProbeLateral {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe-lat").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.g", "graft.dsv2.GraftCatalog")
      .config("spark.sql.catalog.g.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS g.db")
    val corpus = (0 until 50).map { i =>
      (i.toLong, Array(i.toFloat, (i % 7).toFloat, 1.0f))
    }.toDF("vec_id", "embedding")
    val loc = s"$wh/db.db/corpus"
    val t = GraftTable.create(spark, loc, corpus.schema,
      TableConfig(primaryKeys = Seq("vec_id"), numBuckets = 1))
    t.write(corpus)
    corpus.filter(col("vec_id") < 3).createOrReplaceTempView("queries")
    val df = spark.sql(
      s"""SELECT q.vec_id AS qid, r.vec_id AS hit, round(r.score, 4) AS s
         |FROM queries q,
         |LATERAL (SELECT * FROM graft_vector_search('$loc', 'embedding',
         |                                           q.embedding, 3)) r
         |ORDER BY qid, s DESC, hit""".stripMargin)
    df.explain()
    df.show(20, false)
    // filtered inner WHERE
    val df2 = spark.sql(
      s"""SELECT q.vec_id AS qid, r.vec_id AS hit
         |FROM queries q,
         |LATERAL (SELECT vec_id, score FROM graft_vector_search('$loc',
         |         'embedding', q.embedding, 2) WHERE vec_id >= 10) r
         |ORDER BY qid, hit""".stripMargin)
    df2.show(20, false)
    spark.stop()
  }
}
