package graft.dsv2

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.functions._
import org.apache.spark.paths.SparkPath

/** Isolate: do two row-based parquet readers from one
  * ParquetPartitionReaderFactory corrupt when their next() calls
  * interleave (the access pattern of a k-way merge)? */
object ProbeMorInterleave {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("mor-il").toString
    val loc = s"$wh/t"
    val t = GraftTable.create(spark, loc, Seq((1L, "x")).toDF("k", "v").schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 1))
    t.write(Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "v"))
    t.write(Seq((1L, "b1"), (2L, "b2"), (3L, "b3")).toDF("k", "v"))
    val entries = t.planFiles()
    println(s"files = ${entries.map(_.path)}")
    val factory = GraftBatchScan.parquetFactory(
      t, t.fileSchema, Array.empty)
    def toFile(path: String, size: Long): PartitionedFile =
      PartitionedFile(InternalRow.empty,
        SparkPath.fromPath(new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(loc), path)),
        0L, size, Array.empty[String], 0L, size, Map.empty)
    val rs = entries.map(e => GraftBatchScan.parquetFactory(t, t.fileSchema, Array.empty).createReader(
      FilePartition(0, Array(toFile(e.path, e.fileSize)))))
    def step(i: Int): Unit = {
      val r = rs(i)
      if (r.next()) {
        val row = r.get()
        println(s"reader$i: k=${row.getLong(0)} v=${row.getUTF8String(1)}")
      } else println(s"reader$i: EOF")
    }
    println("-- sequential reader0 x2, then interleave --")
    step(0); step(1); step(0); step(1); step(0); step(1)
    spark.stop()
  }
}
