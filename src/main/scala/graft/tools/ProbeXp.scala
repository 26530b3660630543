package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal repro of the CrossPartitionSpec chained-moves failure. */
object ProbeXp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("probe-xp").resolve("t").toString
    val df = Seq(
      (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0), (4L, "B", 40.0)
    ).toDF("k", "seg", "v")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(primaryKeys = Seq("k"), partitionKeys = Seq("seg"),
        numBuckets = -1,
        options = Map("dynamic-bucket.target-row-count" -> "2")))
    t.write(df)
    t.write(Seq((1L, "B", 11.0)).toDF("k", "seg", "v")) // A→B
    t.write(Seq((1L, "C", 12.0)).toDF("k", "seg", "v")) // B→C
    t.write(Seq((1L, "A", 13.0)).toDF("k", "seg", "v")) // C→A (back)
    val r = t.read()
    r.explain("formatted")
    try {
      r.collect().foreach(println)
      println("== collect OK")
    } catch { case e: Throwable => println(s"== collect FAILED: ${e.getMessage}") }
    spark.stop()
  }
}
