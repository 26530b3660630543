package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 scale probe for the postpone fixed-bucket batch-write flow: the
  * stage→infer→route flow pays one extra write+read of the batch vs a
  * plain HASH_FIXED write — measure that overhead at 1.5M rows, check the
  * inferred layout, and time an update batch + immediate merged read. */
object ProbePostponeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    println(s"[probe] orders rows = ${orders.count()}")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // (a) plain fixed-bucket PK write — the baseline write cost
    val locFixed = java.nio.file.Files.createTempDirectory("pp-scale-f").toString + "/t"
    val tf = GraftTable.create(spark, locFixed, orders.schema,
      TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 16))
    timed("fixed-bucket write (16 buckets)")(tf.write(orders))
    // (b) postpone fixed-bucket flow — stage + infer + route
    val locPp = java.nio.file.Files.createTempDirectory("pp-scale-p").toString + "/t"
    val tp = GraftTable.create(spark, locPp, orders.schema,
      TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = -2,
        options = Map("postpone.target-row-num-per-bucket" -> "100000")))
    timed("postpone fixed write (stage+infer+route)")(tp.write(orders))
    val live = tp.sm.latestSnapshot.map(tp.sm.liveEntries).getOrElse(Nil)
    println(s"[probe] inferred layout: totalBuckets=" +
      s"${live.map(_.totalBuckets).distinct.mkString(",")} " +
      s"buckets=${live.map(_.bucket).distinct.size} files=${live.size}")
    // update batch: 10% of keys, then immediate merged read
    val upd = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    timed("postpone fixed append (10% update)")(tp.write(upd))
    val n = timed("immediate merged read (count)")(tp.read().count())
    println(s"[probe] merged rows = $n")
    val sum = timed("merged read (sum totalprice)")(
      tp.read().agg(sum_distinct(lit(0.0)) + org.apache.spark.sql.functions.sum("o_totalprice")).head().getDouble(0))
    println(f"[probe] sum = $sum%.2f")
    spark.stop()
  }
}
