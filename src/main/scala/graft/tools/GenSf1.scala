package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Generate an sf1-equivalent dataset (10× sf0.1 — 6M-row lineitem) for the
 * scale probe, by tiling the driver's sf0.1 tables with key-shifted
 * replicas. FK relationships hold inside each replica because every key and
 * foreign-key column shifts by the SAME `rep * C` offset; C exceeds every
 * base key, so replicas never collide. Tiny dims (region, nation) stay
 * as-is and FK columns into them are NOT shifted. Document text gets a
 * per-replica prefix so the near-dup landscape is sf0.1's structure scaled
 * 10×, not 10-cliques of exact duplicates (which would measure the
 * dedup guard, not the scaling).
 *
 * Usage: runMain graft.tools.GenSf1 [outDir]   (default /tmp/graft-sf1)
 */
object GenSf1 {
  private val C = 100000000L // > any sf0.1 key
  private val Replicas = 10

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shifts: Map[String, Seq[String]] = Map(
      "region" -> Nil, "nation" -> Nil,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    shifts.foreach { case (name, keys) =>
      val base = spark.read.parquet(s"$src/$name.parquet")
      val tiled =
        if (keys.isEmpty) base
        else {
          val reps = spark.range(Replicas).select(col("id").as("__rep"))
          var df = base.crossJoin(broadcast(reps))
          keys.foreach { k =>
            df = df.withColumn(k, (col(k) + col("__rep") * C).cast("long"))
          }
          if (name == "documents")
            df = df.withColumn("text",
              concat(lit("r"), col("__rep"), lit(" "), col("text")))
          df.drop("__rep").select(base.columns.map(col).toIndexedSeq: _*)
        }
      // 64 output files (not 8): the scaling probe's dominant stages are
      // the SCANS, and at 8 files a 32-core session can never run more
      // than ~8 scan tasks — the r14 first probe measured exactly that
      // (8 cores tying 32 on every query). 64 files ≈ 2 waves at 32 cores.
      tiled.repartition(64).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gensf1] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
