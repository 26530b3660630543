package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Is every PK data file written pk-sorted, for both the plain and the
  * preMerged (merge-into / compaction) write paths? The k-way MOR merge
  * depends on it. */
object ProbeWriteSort {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("wsort").toString
    val rnd = new scala.util.Random(7)

    def dump(t: GraftTable, label: String): Unit =
      t.planFiles().sortBy(_.path).foreach { e =>
        val ks = spark.read.schema(t.fileSchema)
          .parquet(s"${t.location}/${e.path}")
          .select("k").collect().map(_.getLong(0)).toList
        val sorted = ks == ks.sorted
        println(s"$label bucket=${e.bucket} level=${e.level} sorted=$sorted " +
          s"rows=${ks.take(12)}${if (ks.size > 12) "..." else ""}")
      }

    // plain write
    val data = rnd.shuffle((0L until 40L).toList).map(k => (k, s"v$k"))
      .toDF("k", "v")
    val t1 = GraftTable.create(spark, s"$wh/plain", data.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2))
    t1.write(data)
    dump(t1, "plain")

    // preMerged write (the merge-into shape): envelope carried by caller
    val t2 = GraftTable.create(spark, s"$wh/premerged", data.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 2))
    val pm = rnd.shuffle((0L until 40L).toList).map(k => (k, s"w$k"))
      .toDF("k", "v")
      .withColumn(GraftTable.SEQ, lit(1L))
      .withColumn(GraftTable.SEQ2, lit(0L))
      .withColumn(GraftTable.COMMIT, lit(1L))
      .withColumn(GraftTable.POS, monotonically_increasing_id())
      .withColumn(GraftTable.KIND, lit(0))
    val adds = t2.writeFiles(pm, preMerged = true)
    t2.sm.commit(adds, "APPEND", "probe", t2.schema.id)
    dump(t2, "premerged")

    // raw variants outside writeFiles: which arrangement keeps files
    // pk-sorted for a DETERMINISTIC frame?
    def variant(label: String)(tx: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val out = s"$wh/$label"
      val base = rnd.shuffle((0L until 40L).toList).map(k => (k, s"z$k"))
        .toDF("k", "v")
        .withColumn("__pt", lit("-"))
        .withColumn("__bucket", pmod(xxhash64(col("k")), lit(2)).cast("int"))
      val w = tx(base).write.partitionBy("__pt", "__bucket")
      (if (label.contains("roll")) w.option("maxRecordsPerFile", 8) else w)
        .parquet(out)
      new java.io.File(out).listFiles().filter(_.isDirectory).foreach { ptd =>
        ptd.listFiles().filter(_.isDirectory).foreach { bd =>
          bd.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
            val ks = spark.read.parquet(f.getPath).select("k")
              .collect().map(_.getLong(0)).toList
            println(s"$label ${bd.getName} sorted=${ks == ks.sorted} rows=${ks.take(8)}...")
          }
        }
      }
    }
    variant("vA_bucket_pt_k")(df => df.repartition(col("__pt"), col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col("__pt"), col("k")))
    variant("vB_pt_bucket_k")(df => df.repartition(col("__pt"), col("__bucket"))
      .sortWithinPartitions(col("__pt"), col("__bucket"), col("k")))
    variant("vBroll_pt_bucket_k")(df => df.repartition(col("__pt"), col("__bucket"))
      .sortWithinPartitions(col("__pt"), col("__bucket"), col("k")))
    variant("vAroll_bucket_pt_k")(df => df.repartition(col("__pt"), col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col("__pt"), col("k")))
    spark.stop()
  }
}
