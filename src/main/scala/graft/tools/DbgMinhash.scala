package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** Stage decomposition for q_dedup_minhash: times shingle/hash/signature
  * compute, band aggregation, and verify joins separately. */
object DbgMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val d2 = docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" xq yq zq")).as("text")))
    d2.cache().count()

    def time[T](label: String)(f: => T): T = {
      val r1 = f // warm
      val t0 = System.nanoTime(); val r = f
      val t1 = System.nanoTime(); val r3 = f
      val t2 = System.nanoTime()
      println(f"== $label: ${(t1 - t0) / 1e9}%.3f / ${(t2 - t1) / 1e9}%.3f s")
      r
    }

    println("docs rows = " + d2.count())

    time("shingles size only") {
      d2.select(sum(size(TextOps.shingles(col("text"), 3)))).head()
    }
    time("shingle hashes") {
      d2.select(sum(size(TextOps.shingleHashes(TextOps.shingles(col("text"), 3))))).head()
    }
    val sigLen = 8
    time("signatures") {
      d2.withColumn("__sh", TextOps.shingles(col("text"), 3))
        .filter(size(col("__sh")) > 0)
        .select(col("doc_id"), TextOps.shingleHashes(col("__sh")).as("__hs"))
        .select(col("doc_id"), TextOps.minhashFromHashes(col("__hs"), sigLen).as("__sig"))
        .select(sum(element_at(col("__sig"), 1))).head()
    }
    val base = d2
      .withColumn("__sh", TextOps.shingles(col("text"), 3))
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), TextOps.shingleHashes(col("__sh")).as("__hs"))
      .select(col("doc_id"), col("__hs"),
        TextOps.minhashFromHashes(col("__hs"), sigLen).as("__sig"))
      .persist()
    println("base rows = " + base.count())
    val rpb = 2; val nBands = 4
    val banded = base.select(col("doc_id"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"), TextOps.bandKey(col("__sig"), b, rpb).as("bk"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bk").as("bk"))
    val cand = banded.groupBy("band", "bk")
      .agg(collect_list(col("doc_id")).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(expr(
        """flatten(transform(__ids, (x, i) ->
          |  transform(filter(__ids, y -> y > x), y -> struct(x AS v1, y AS v2))))"""
          .stripMargin)).as("p"))
      .select(col("p.v1"), col("p.v2"))
      .distinct()
    time("cand (from persisted base)") { cand.count() }
    val candP = cand.persist(); println("cand rows = " + candP.count())
    val s1 = base.select(col("doc_id").as("v1"), col("__hs").as("sh1"))
    val s2 = base.select(col("doc_id").as("v2"), col("__hs").as("sh2"))
    time("verify joins (from persisted cand)") {
      candP.join(s1, "v1").join(s2, "v2")
        .withColumn("jac", TextOps.jaccard(col("sh1"), col("sh2")))
        .filter(col("jac") >= 0.8).count()
    }
    time("full pipeline (fresh, no persist reuse)") {
      graft.pipeline.Dedup.minhashLshPairs(d2, "doc_id", "text", 3, 8, 4, 0.8).count()
    }
    spark.stop()
  }
}
