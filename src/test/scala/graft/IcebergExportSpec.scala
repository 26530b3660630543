package graft

import graft.core._
import graft.core.RowOps._
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** Iceberg-compatible metadata export: structure of vN.metadata.json +
  * manifest-list/manifest avro verified by parsing everything back with the
  * avro + jackson libraries (an Iceberg reader is not available in this
  * environment, so conformance is asserted against the public spec shapes:
  * field ids, record names, version hint, name mapping, partition specs). */
class IcebergExportSpec extends SparkTestBase {
  import spark.implicits._

  private val om = new ObjectMapper()
  private def conf = spark.sessionState.newHadoopConf()

  private def readAvro(p: Path): (Seq[GenericRecord], org.apache.avro.Schema,
      Map[String, String]) = {
    val r = new DataFileReader[GenericRecord](
      new FsInput(p, conf), new GenericDatumReader[GenericRecord]())
    val recs = r.iterator().asScala.toList
    val schema = r.getSchema
    val meta = r.getMetaKeys.asScala
      .filterNot(_.startsWith("avro.")).map(k => k -> r.getMetaString(k)).toMap
    r.close()
    (recs, schema, meta)
  }

  test("append table exports spec-shaped metadata; snapshots accumulate") {
    val loc = tmpLoc("icb")
    val df = Seq((1L, "us", 1.5), (2L, "de", 2.5), (3L, "us", 3.5))
      .toDF("k", "country", "v")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(partitionKeys = Seq("country"), numBuckets = 1,
        options = Map("metadata.iceberg.storage" -> "table-location")))
    t.write(df)

    val metaDir = new Path(loc, "metadata")
    val fs = metaDir.getFileSystem(conf)
    // version hint points at v1
    val hint = scala.io.Source.fromInputStream(
      fs.open(new Path(metaDir, "version-hint.text"))).mkString.trim
    assert(hint == "1")
    val root = om.readTree(fs.open(new Path(metaDir, "v1.metadata.json")))
    assert(root.get("format-version").asInt == 2)
    assert(root.get("current-snapshot-id").asLong == 1L)
    // schema: ids are 1-based, all fields present
    val schemaFields = root.get("schemas").get(0).get("fields")
    assert(schemaFields.size == 3)
    assert(schemaFields.get(0).get("id").asInt == 1 &&
      schemaFields.get(0).get("type").asText == "long")
    // identity partition spec on country with field-id 1000
    val specField = root.get("partition-specs").get(0).get("fields").get(0)
    assert(specField.get("transform").asText == "identity" &&
      specField.get("field-id").asInt == 1000 &&
      specField.get("source-id").asInt == 2)
    // name mapping covers every column
    val nm = om.readTree(
      root.get("properties").get("schema.name-mapping.default").asText)
    assert((0 until nm.size).map(i => nm.get(i).get("names").get(0).asText)
      .toSet == Set("k", "country", "v"))

    // manifest list -> manifest -> data files round trip
    val listPath = new Path(root.get("snapshots").get(0).get("manifest-list").asText)
    val (listRecs, listSchema, listMeta) = readAvro(listPath)
    assert(listSchema.getName == "manifest_file")
    assert(listSchema.getField("manifest_path").getObjectProp("field-id") == 500)
    assert(listMeta.get("format-version").contains("2"))
    assert(listRecs.size == 1)
    val (entries, entrySchema, mMeta) = readAvro(
      new Path(listRecs.head.get("manifest_path").toString))
    assert(entrySchema.getName == "manifest_entry")
    assert(entrySchema.getField("data_file").schema().getName == "r2")
    assert(mMeta.get("content").contains("data") &&
      mMeta.contains("schema") && mMeta.contains("partition-spec"))
    // 2 partitions × 1 bucket = 2 files; counts + typed partition values
    assert(entries.size == t.planFiles().size)
    val byPart = entries.map { e =>
      val d = e.get("data_file").asInstanceOf[GenericRecord]
      val p = d.get("partition").asInstanceOf[GenericRecord]
      (p.get("country").toString,
        d.get("record_count").asInstanceOf[Long],
        d.get("file_path").toString)
    }
    assert(byPart.map(_._2).sum == 3L)
    assert(byPart.map(_._1).toSet == Set("us", "de"))
    byPart.foreach { case (_, _, fp) =>
      assert(fs.exists(new Path(fp)), s"exported data file missing: $fp") }
    // column bounds: single-value binary serialization, keyed by field id
    val usFiles = entries.map(_.get("data_file").asInstanceOf[GenericRecord])
      .filter(_.get("partition").asInstanceOf[GenericRecord]
        .get("country").toString == "us")
    def boundMap(f: GenericRecord, field: String): Map[Int, java.nio.ByteBuffer] =
      f.get(field).asInstanceOf[java.util.List[GenericRecord]].asScala
        .map(r => r.get("key").asInstanceOf[Int] ->
          r.get("value").asInstanceOf[java.nio.ByteBuffer]).toMap
    def leLong(b: java.nio.ByteBuffer): Long =
      b.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    // k (field id 1): the us partition holds k=1 and k=3 across its files
    val kLowers = usFiles.map(f => leLong(boundMap(f, "lower_bounds")(1)))
    val kUppers = usFiles.map(f => leLong(boundMap(f, "upper_bounds")(1)))
    assert(kLowers.min == 1L && kUppers.max == 3L,
      s"k bounds wrong: $kLowers / $kUppers")
    // country (field id 2): utf-8 string bound round-trips
    val cb = boundMap(usFiles.head, "lower_bounds")(2).duplicate()
    val ca = new Array[Byte](cb.remaining()); cb.get(ca)
    assert(new String(ca, "UTF-8") == "us")
    val nullCounts = usFiles.head.get("null_value_counts")
      .asInstanceOf[java.util.List[GenericRecord]].asScala
      .map(r => r.get("key").asInstanceOf[Int] ->
        r.get("value").asInstanceOf[Long]).toMap
    assert(nullCounts.values.forall(_ == 0L) && nullCounts.keySet == Set(1, 2, 3))

    // second commit (pure append): previous manifest REUSED + one delta
    t.write(Seq((4L, "fr", 4.5)).toDF("k", "country", "v"))
    val hint2 = scala.io.Source.fromInputStream(
      fs.open(new Path(metaDir, "version-hint.text"))).mkString.trim
    assert(hint2 == "2")
    val root2 = om.readTree(fs.open(new Path(metaDir, "v2.metadata.json")))
    assert(root2.get("snapshots").size == 2)
    assert(root2.get("snapshots").get(1).get("summary")
      .get("operation").asText == "append")
    val list2 = new Path(root2.get("snapshots").get(1).get("manifest-list").asText)
    val (l2, _, _) = readAvro(list2)
    assert(l2.size == 2, s"expected carried + delta manifest, got ${l2.size}")
    assert(l2.head.get("manifest_path").toString ==
      listRecs.head.get("manifest_path").toString, "first manifest not reused")
    assert(l2.map(_.get("added_files_count").asInstanceOf[Int]).sum ==
      GraftTable.load(spark, loc).planFiles().size)
    // a DELETE removes files → only AFFECTED manifests rewrite; the fr delta
    // manifest (none of its files removed) carries forward untouched
    import graft.core.RowOps._
    GraftTable.load(spark, loc).delete(col("country") === "de")
    val hint3 = scala.io.Source.fromInputStream(
      fs.open(new Path(metaDir, "version-hint.text"))).mkString.trim
    val root3 = om.readTree(fs.open(new Path(metaDir, s"v$hint3.metadata.json")))
    val sn3 = root3.get("snapshots")
    val list3 = new Path(sn3.get(sn3.size - 1).get("manifest-list").asText)
    val (l3, _, _) = readAvro(list3)
    val frManifest = l2.last.get("manifest_path").toString
    assert(l3.exists(_.get("manifest_path").toString == frManifest),
      "untouched delta manifest must carry through the delete")
    assert(l3.map(_.get("added_files_count").asInstanceOf[Int]).sum ==
      GraftTable.load(spark, loc).planFiles().size)
    assert(sn3.get(sn3.size - 1).get("summary").get("operation").asText ==
      "overwrite")
  }

  test("pk table exports only when fully merged; procedure triggers manually") {
    val loc = tmpLoc("icbpk")
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "s", "v")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(primaryKeys = Seq("k"), numBuckets = 1,
        options = Map("metadata.iceberg.storage" -> "table-location")))
    t.write(df) // single level-0 file = raw-convertible → exports v1
    val metaDir = new Path(loc, "metadata")
    val fs = metaDir.getFileSystem(conf)
    def hintV: String = scala.io.Source.fromInputStream(
      fs.open(new Path(metaDir, "version-hint.text"))).mkString.trim
    assert(hintV == "1")
    t.write(df.withColumn("v", col("v") * 2)) // level-0 pileup: unmerged
    // snapshot 2 is a multi-version state → export LAGS at v1
    assert(hintV == "1")
    // compact merges → the compaction commit (snapshot 3) exports
    t.compact()
    val v = hintV
    assert(v == "3", s"expected v3 after compaction, got $v")
    val root = om.readTree(fs.open(new Path(metaDir, s"v$v.metadata.json")))
    val listP = new Path(root.get("snapshots")
      .get(root.get("snapshots").size - 1).get("manifest-list").asText)
    val (lr, _, _) = readAvro(listP)
    assert(lr.head.get("added_rows_count").asInstanceOf[Long] == 2L)
    // manual procedure call also works and reports the version
    val msg = Procedures.call(spark, GraftTable.load(spark, loc),
      "iceberg_export").head().getString(0)
    assert(msg.contains("iceberg metadata v"), msg)
  }

  test("nested types export: unique nested ids + nested name mapping") {
    val loc = tmpLoc("icbnest")
    val df = Seq((1L, Seq(1, 2), Map("a" -> 1L), ("x", 2.5)))
      .toDF("k", "arr", "m", "s")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(numBuckets = 1,
        options = Map("metadata.iceberg.storage" -> "table-location")))
    t.write(df)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = new Path(loc, "metadata")
    val fs = metaDir.getFileSystem(spark.sessionState.newHadoopConf())
    val root = om.readTree(fs.open(new Path(metaDir, "v1.metadata.json")))
    val schema = root.get("schemas").get(0)
    // collect every field id in the schema tree; all must be unique
    val ids = scala.collection.mutable.ArrayBuffer[Int]()
    def walk(tpe: com.fasterxml.jackson.databind.JsonNode): Unit =
      if (tpe.isObject) tpe.get("type").asText match {
        case "struct" => tpe.get("fields").forEach { f =>
          ids += f.get("id").asInt; walk(f.get("type")) }
        case "list" => ids += tpe.get("element-id").asInt; walk(tpe.get("element"))
        case "map" =>
          ids += tpe.get("key-id").asInt; walk(tpe.get("key"))
          ids += tpe.get("value-id").asInt; walk(tpe.get("value"))
        case _ => ()
      }
    walk(schema)
    assert(ids.size == ids.distinct.size, s"duplicate field ids: $ids")
    assert(root.get("last-column-id").asInt == ids.max,
      s"last-column-id ${root.get("last-column-id").asInt} != max id ${ids.max}")
    // nested name mapping: arr has an element entry, m has key/value, s has
    // named children
    val nm = om.readTree(root.get("properties")
      .get("schema.name-mapping.default").asText)
    def byName(n: String) = {
      var found: com.fasterxml.jackson.databind.JsonNode = null
      nm.forEach(e => if (e.get("names").get(0).asText == n) found = e)
      found
    }
    assert(byName("arr").get("fields").get(0).get("names").get(0).asText == "element")
    assert(byName("m").get("fields").size == 2)
    assert(byName("s").get("fields").get(0).get("names").get(0).asText == "_1")
  }

  test("unsupported column types are rejected loudly") {
    val loc = tmpLoc("icbbad")
    val df = spark.sql("SELECT 1L AS k, parse_json('{\"a\":1}') AS v")
    val t = GraftTable.create(spark, loc, df.schema,
      TableConfig(numBuckets = 1))
    t.write(df)
    intercept[IllegalArgumentException](IcebergExport.export(t))
  }
}
