package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of q_dedup_minhash at SPARK_GRAFT_SF_DIR under
  * SPARK_GRAFT_CPUS — which phase stops scaling with cores (r14: the sf1
  * core-ratio probe showed ≈1 ratios even though raw CPU scales 28x on
  * this box; this isolates where the wall-clock goes). Noop-sink timing
  * per guide §1.4. */
object ProbeScaleStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs2 = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      docs.unionAll(docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" xq yq zq")).as("text")))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[stage] $name%-28s best ${ts.min}%.3f s  (cpus=$cpus)")
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    time("scan+count only") { docs2.agg(count(lit(1))).collect() }
    time("signatures (noop)") {
      noop(graft.pipeline.Dedup.minhashSignatures(docs2, "doc_id", "text", 3, 8))
    }
    // phase splits of the pair pipeline (mirrors pairsFromSignatures)
    val perDoc = graft.pipeline.Dedup
      .minhashSignatures(docs2, "doc_id", "text", 3, 8).persist()
    perDoc.count()
    val reps = perDoc.groupBy("__fp")
      .agg(first(col("__hsd")).as("__hsd"), first(col("__sig")).as("__sig"),
        first(col("__n")).as("__n")).persist()
    time("reps collapse (noop)") { noop(reps) }
    val rpb = 2
    val banded = reps.select(col("__fp"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        unhex(graft.pipeline.TextOps.bandKey(col("__sig"), b, rpb)).as("bk"))): _*)).as("b"))
      .select(col("__fp"), col("b.band").as("band"), col("b.bk").as("bk"))
    val cand = banded.groupBy("band", "bk")
      .agg(graft.functions.GraftAggs.cappedSortedSet(col("__fp"), 1024).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(expr(
        """flatten(transform(__ids, (x, i) ->
          |  transform(filter(__ids, y -> y > x), y -> struct(x AS f1, y AS f2))))"""
          .stripMargin)).as("p"))
      .select(col("p.f1"), col("p.f2")).distinct()
    time("banding+cand (noop)") { noop(cand) }
    time("full pairs") {
      graft.pipeline.Dedup.minhashLshPairs(docs2, "doc_id", "text",
        3, 8, 4, 0.8).collect()
      ()
    }
    jobs.set(0)
    graft.pipeline.Dedup.minhashLshPairs(docs2, "doc_id", "text",
      3, 8, 4, 0.8).collect()
    org.apache.spark.sql.graft.SparkShims.waitListenerBus(spark)
    println(s"[stage] full pairs jobs = ${jobs.get()}")
    spark.stop()
  }
}
