package graft.tools

import graft.core._
import graft.core.RowOps._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the library surface against real testdata.
  * Run: sbt "runMain graft.tools.Drive" */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.dsv2.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val loc = java.nio.file.Files.createTempDirectory("graft-drive").resolve("orders_pk").toString
    println(s"== table at $loc, source rows=${orders.count()}")

    val t = GraftTable.create(spark, loc, orders.schema,
      TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 4))
    t.write(orders)
    println(s"== snapshot 1 committed, read count=${t.read().count()}")

    // second write: bump totalprice x2 for keys divisible by 10
    val upd = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    t.write(upd)
    val merged = t.read()
    println(s"== snapshot 2 committed, merged count=${merged.count()} (expect same as source)")
    val check = merged.filter(col("o_orderkey") % 10 === 0)
      .join(orders.select(col("o_orderkey"), col("o_totalprice").as("orig")), "o_orderkey")
      .withColumn("ok", abs(col("o_totalprice") - col("orig") * 2) < 1e-9)
    println(s"== updated keys correct: ${check.filter(col("ok")).count()}/${check.count()}")

    println("== time travel to snapshot 1: " +
      t.read(None, Some(1L)).agg(round(sum("o_totalprice"), 2)).collect().head +
      " vs source " + orders.agg(round(sum("o_totalprice"), 2)).collect().head)

    println("== incremental(1,2) rows: " + t.incremental(1, 2).count() +
      " (expect " + upd.count() + ")")

    t.compact()
    println(s"== after compact: count=${t.read().count()}, files=" +
      t.systemTable("files").count())
    t.read(filter = Some(col("o_orderstatus") === "O")).explain("formatted")

    // reload from a fresh handle (cold metadata path)
    val t2 = GraftTable.load(spark, loc)
    println(s"== reloaded: snapshots=${t2.systemTable("snapshots").count()}, " +
      s"count=${t2.read().count()}")

    t2.delete(col("o_orderstatus") === "F")
    println(s"== after delete(F): count=${t2.read().count()}, " +
      s"F-rows=${t2.read().filter(col("o_orderstatus") === "F").count()}")

    // avro-format table: the same LSM paths over the engine's own FileFormat
    val locAvro = java.nio.file.Files.createTempDirectory("graft-drive")
      .resolve("orders_avro").toString
    val ta = GraftTable.create(spark, locAvro, orders.schema,
      TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 2,
        options = Map("file.format" -> "avro")))
    ta.write(orders)
    ta.write(upd)
    println(s"== avro table: merged count=${ta.read().count()} " +
      s"(files: ${ta.planFiles().count(_.path.endsWith(".avro"))} .avro)")

    // binlog stream of the PK table's changelog-producing twin
    val locCl = java.nio.file.Files.createTempDirectory("graft-drive")
      .resolve("orders_cl").toString
    val tc = GraftTable.create(spark, locCl, orders.schema,
      TableConfig(primaryKeys = Seq("o_orderkey"), numBuckets = 2,
        options = Map("changelog-producer" -> "lookup")))
    tc.write(orders)
    tc.write(upd)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drive-ckpt").toString
    val q = spark.readStream.format("graft")
      .option("read-binlog", "true")
      .option("scan.mode", "from-snapshot").option("scan.snapshot-id", "1")
      .load(locCl)
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("drive_binlog").start()
    q.awaitTermination(120000)
    val bl = spark.table("drive_binlog").groupBy("rowkind").count()
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    println(s"== binlog stream rowkinds: $bl (expect +I=rows, +U=rows/10)")

    // probe: double create should fail
    try {
      GraftTable.create(spark, loc, orders.schema, TableConfig())
      println("== PROBE FAIL: double create succeeded")
    } catch {
      case e: IllegalArgumentException => println(s"== probe double-create rejected: ${e.getMessage}")
    }
    // probe: bad merge engine
    try {
      val l2 = java.nio.file.Files.createTempDirectory("graft-bad").resolve("x").toString
      val tb = GraftTable.create(spark, l2, orders.schema,
        TableConfig(primaryKeys = Seq("o_orderkey"), mergeEngine = "nope"))
      tb.write(orders); tb.read().count()
      println("== PROBE FAIL: bad merge engine accepted")
    } catch {
      case e: Exception => println(s"== probe bad-engine rejected: ${e.getMessage.take(80)}")
    }
    spark.stop()
  }
}
