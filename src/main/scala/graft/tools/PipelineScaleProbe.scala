package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale probe for the LLM-pipeline operator family: runs the dedup / search
 * stages at 1x and Rx corpus scale and reports wall times + docs/s, so
 * near-linear scaling (the 100-TB posture of SURVEY §2.11) is measured, not
 * asserted. Replicas are text-perturbed with a per-replica letter
 * substitution — every replica keeps the SAME internal duplicate structure
 * (each doc paired with a near-identical twin) while replicas never match
 * each other, so candidate density per doc is constant across scales: the
 * honest way to scale an LSH workload (pure replication would create
 * R-sized duplicate cliques and quadratic pair blowup that no real corpus
 * has).
 *
 * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *        runMain graft.tools.PipelineScaleProbe [R]
 */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val bigR = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val nDocs = docs.count()
    val alpha = "etaoinshrd"

    /** R perturbed replicas, each doubled with a near-identical twin. */
    def corpus(r: Int): DataFrame = (0 until r).map { i =>
      val rot = alpha.drop(i % alpha.length) + alpha.take(i % alpha.length)
      val rep = docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        translate(col("text"), alpha, rot).as("text"))
      rep.unionAll(rep.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" xq yq zq")).as("text")))
    }.reduce(_ unionAll _)

    def emb(r: Int): DataFrame = {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      (0 until r).map { i =>
        e.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          transform(col("embedding"),
            x => x + lit(i.toFloat * 1e-4f)).as("embedding"))
      }.reduce(_ unionAll _)
    }
    val dim = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(size(col("embedding"))).head().getInt(0)

    val out = scala.collection.mutable.LinkedHashMap[String, Double]()
    Seq(1 -> "1x", bigR -> s"${bigR}x").foreach { case (r, tag) =>
      val c = corpus(r)
      val (pairs, tMh) = timed(
        graft.pipeline.Dedup.minhashLshPairs(c, "doc_id", "text",
          shingleN = 3, sigLen = 8, nBands = 4, threshold = 0.8).count())
      val (groups, tEx) = timed(
        graft.pipeline.Dedup.exactGroups(c, "doc_id", "text").count())
      val e = emb(r)
      val (_, tAnn) = timed(
        graft.pipeline.Similarity.bruteForceTopK(e, "embedding",
          Seq.fill(dim)(0.1f), k = 10, metric = "cosine").count())
      val (_, tQs) = timed(
        c.select(sum(graft.pipeline.TextOps.qualityScore(col("text")))).head())
      out(s"minhash_${tag}_s") = tMh
      out(s"minhash_${tag}_pairs") = pairs.toDouble
      out(s"exact_${tag}_s") = tEx
      out(s"exact_${tag}_groups") = groups.toDouble
      out(s"ann_${tag}_s") = tAnn
      out(s"quality_${tag}_s") = tQs
      out(s"docs_${tag}") = (nDocs * 2 * r).toDouble
    }
    out("minhash_scale_ratio") = out(s"minhash_${bigR}x_s") / out("minhash_1x_s")
    out("exact_scale_ratio") = out(s"exact_${bigR}x_s") / out("exact_1x_s")
    out("ann_scale_ratio") = out(s"ann_${bigR}x_s") / out("ann_1x_s")
    out("quality_scale_ratio") = out(s"quality_${bigR}x_s") / out("quality_1x_s")
    val json = out.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
