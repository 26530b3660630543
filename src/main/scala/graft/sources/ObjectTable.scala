package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Object table: a metadata view over a directory of arbitrary files
 * (images, audio, raw blobs) — the capability of paimon's OBJECT TABLE
 * (paimon-core/.../table/object/ObjectTable.java; docs multimodal-table).
 *
 * Spark-first: the listing is Spark's distributed `binaryFile` source, so
 * column pruning drops the content column when only metadata is selected
 * (a `SELECT path, length` never reads file bytes), and `pathGlobFilter`
 * pushes the name filter into the listing.
 */
object ObjectTable {

  /** Metadata scan: path, name, length, modificationTime. */
  def scan(spark: SparkSession, dir: String,
           globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val r = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
    r.load(dir).select(
      col("path"),
      element_at(split(col("path"), "/"), -1).as("name"),
      col("length"),
      col("modificationTime"))
  }

  /** Scan including file contents (binary column). */
  def scanWithContent(spark: SparkSession, dir: String,
                      globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val r = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
    r.load(dir).select(
      col("path"),
      element_at(split(col("path"), "/"), -1).as("name"),
      col("length"),
      col("modificationTime"),
      col("content"))
  }
}
