package graft.tools

import graft.pipeline.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 stage decomposition of the minhash dedup cost: where do the
  * ~1 s of q_dedup_minhash / q_dedup_minhash_idx go — signature compute,
  * the reps collapse (SortAggregate over array rows), banding+candidates,
  * verify joins, or the member re-expansion? */
object ProbeMinhash2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
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

    // 1. signature compute, no cache
    time("sig_compute") {
      Dedup.minhashSignatures(d2, "doc_id", "text", 3, 8)
        .agg(count(lit(1))).collect()
    }

    // cached perDoc for the stage splits
    val perDoc = Dedup.minhashSignatures(d2, "doc_id", "text", 3, 8).persist()
    perDoc.count()

    // 2. reps collapse as written (first() over arrays -> SortAggregate)
    time("reps_first") {
      perDoc.groupBy("__fp")
        .agg(first(col("__hsd")).as("__hsd"), first(col("__sig")).as("__sig"),
          first(col("__n")).as("__n"))
        .agg(count(lit(1))).collect()
    }

    // 2b. reps via min-id + join (no array sort)
    time("reps_minid_join") {
      val ids = perDoc.groupBy("__fp").agg(min(col("doc_id")).as("__rid"))
      perDoc.join(ids.hint("shuffle_hash"), col("doc_id") === col("__rid"))
        .agg(count(lit(1))).collect()
    }

    val reps = perDoc.groupBy("__fp")
      .agg(first(col("__hsd")).as("__hsd"), first(col("__sig")).as("__sig"),
        first(col("__n")).as("__n"))
      .persist()
    reps.count()

    // 3. banding + candidate pairs (window cap + collect_list + expand)
    val rpb = 2
    def banded = reps.select(col("__fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), TextOps.bandKey(col("__sig"), b, rpb).as("bk"))): _*)).as("b"))
      .select(col("__fp"), col("b.band").as("band"), col("b.bk").as("bk"))
    def cand = banded
      .withColumn("__rn", row_number().over(
        Window.partitionBy("band", "bk").orderBy(col("__fp"))))
      .filter(col("__rn") <= 1024)
      .groupBy("band", "bk")
      .agg(collect_list(col("__fp")).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(expr(
        """flatten(transform(__ids, (x, i) ->
          |  transform(filter(__ids, y -> y > x), y -> struct(x AS f1, y AS f2))))"""
          .stripMargin)).as("p"))
      .select(col("p.f1"), col("p.f2"))
      .distinct()
    time("banding_cand") { cand.agg(count(lit(1))).collect() }

    val candP = cand.persist(); candP.count()

    // 4. verify joins over the candidate set
    def verified = {
      val s1 = reps.select(col("__fp").as("f1"), col("__hsd").as("sh1"), col("__n").as("n1"))
      val s2 = reps.select(col("__fp").as("f2"), col("__hsd").as("sh2"), col("__n").as("n2"))
      candP.join(s1, "f1").join(s2, "f2")
        .withColumn("__i", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
        .withColumn("jac", when(col("n1") + col("n2") === col("__i"), lit(1.0))
          .otherwise(col("__i") / (col("n1") + col("n2") - col("__i"))))
        .filter(col("jac") >= 0.8)
        .select(col("f1"), col("f2"), col("jac"))
    }
    time("verify") { verified.agg(count(lit(1))).collect() }

    val repPairs = verified.persist(); repPairs.count()

    // 5. member re-expansion + within-group pairs
    val memb = perDoc.select(col("__fp"), col("doc_id").as("__m"))
    time("expand_union") {
      val crossAll = repPairs
        .join(memb.select(col("__fp").as("f1"), col("__m").as("m1")), "f1")
        .join(memb.select(col("__fp").as("f2"), col("__m").as("m2")), "f2")
        .select(least(col("m1"), col("m2")).as("v1"),
          greatest(col("m1"), col("m2")).as("v2"), col("jac"))
      val within = memb.select(col("__fp"), col("__m").as("v1"))
        .join(memb.select(col("__fp"), col("__m").as("v2")), "__fp")
        .filter(col("v1") < col("v2"))
        .select(col("v1"), col("v2"), lit(1.0).as("jac"))
      crossAll.unionByName(within).agg(count(lit(1))).collect()
    }

    // 6. end-to-end current implementations
    time("full_inline") {
      Dedup.minhashLshPairs(d2, "doc_id", "text", 3, 8, 4, 0.8).collect()
    }
    val idx = graft.Fixtures.minhashIndex(spark, sfDir)
    time("idx_scan_only") {
      idx.read().agg(sum(size(col("hsd"))), sum(size(col("sig")))).collect()
    }
    time("full_idx") {
      Dedup.minhashPairsFromIndex(idx, "doc_id", 4, 0.8).collect()
    }
    spark.stop()
  }
}
