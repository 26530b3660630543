package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe: runs named SparkEntry queries (or built-in probe
  * stages) several times in one JVM and prints per-run seconds — for
  * separating real plan cost from bench noise. Usage:
  *   runMain graft.tools.BenchOne <sfDir> <name> [<name>...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq match {
      case Nil => Seq("q_lang_id"); case xs => xs
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // probe stages for decomposing document-pipeline queries
    val probes: Map[String, () => Long] = Map(
      "scan_text" -> (() => spark.read.parquet(s"$sfDir/documents.parquet")
        .select(sum(length(col("text")))).head().getLong(0)),
      "split_only" -> (() => spark.read.parquet(s"$sfDir/documents.parquet")
        .select(sum(size(split(lower(trim(col("text"))), "\\s+")))).head().getLong(0))
    )

    names.foreach { name =>
      val run: () => Unit = probes.get(name) match {
        case Some(p) => () => p()
        case None =>
          val q = graft.SparkEntry.queries(name)
          () => q(spark, sfDir).collect()
      }
      (1 to 2).foreach(_ => run()) // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"== $name: best=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
