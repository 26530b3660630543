package graft.core

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import java.util.UUID

/**
 * Iceberg-compatible metadata export (reference capability
 * `metadata.iceberg.storage`, paimon-core/.../iceberg/IcebergCommitCallback.java
 * + docs/docs/iceberg/): after a commit, publish the table's CURRENT live
 * parquet files as an Iceberg format-version-2 table — `vN.metadata.json` +
 * `version-hint.text` + a manifest-list/manifest avro pair — so external
 * Iceberg readers (Spark/Trino/Flink iceberg connectors, Hadoop catalog)
 * can query the data files without graft.
 *
 * All shapes follow the public Iceberg table spec
 * (https://iceberg.apache.org/spec): field-id-annotated avro schemas for
 * manifests, identity partition specs with 1000+ field ids, and a
 * `schema.name-mapping.default` property so Iceberg readers can resolve our
 * Spark-written parquet (which carries names, not iceberg field ids).
 *
 * Deliberate simplifications vs the reference (documented, spec-legal):
 *  - pure-append commits REUSE the previous export's manifests and add one
 *    delta manifest (O(new files) metadata per commit — the 100 TB shape);
 *    any commit that removes files (overwrite, compaction, delete) falls
 *    back to one self-contained manifest of all live files;
 *  - per-file column stats (null counts + lower/upper bounds in the spec's
 *    single-value binary serialization) ARE emitted for primitive columns
 *    whose type has a defined encoding, so Iceberg readers min/max-prune
 *    files; columns without a usable stat are simply absent from the maps;
 *  - PK tables export only when fully merged (every bucket raw-convertible,
 *    no outstanding deletion vectors) — the Iceberg view would otherwise
 *    resurrect unmerged row versions. Append tables export on every commit.
 */
object IcebergExport {

  def enabled(t: GraftTable): Boolean =
    t.config.option("metadata.iceberg.storage", "disabled") != "disabled"

  /** Export the current snapshot; Some(metadata version) on success, None
    * when skipped (no snapshot / not yet fully merged). Throws on
    * unsupported schema shapes so misconfiguration is loud. */
  def export(t: GraftTable): Option[Long] = {
    val snap = t.sm.latestSnapshot.getOrElse(return None)
    require(t.fileFormat == "parquet" || t.fileFormat == "orc",
      s"iceberg export supports parquet/orc data files, not ${t.fileFormat}")
    val entries = t.planFiles()
    // current-schema files only: name-mapping resolves CURRENT names
    if (entries.exists(_.schemaId != t.schema.id)) return None
    if (t.isPk) {
      if (snap.dvIndex.nonEmpty) return None
      val merged = entries.groupBy(e => (e.partition, e.bucket))
        .forall { case (_, es) => t.rawBucket(es) }
      if (!merged) return None
    }

    val fields = t.schema.fields
    // validate every column maps to an iceberg type (nested types traverse)
    def validate(dt: DataType): Unit = dt match {
      case st: StructType => st.fields.foreach(f => validate(f.dataType))
      case at: ArrayType => validate(at.elementType)
      case mt: MapType => validate(mt.keyType); validate(mt.valueType)
      case prim => icebergType(prim); ()
    }
    fields.foreach(f => validate(DataType.fromDDL(f.dataType)))
    val partCols = t.config.partitionKeys
    val partFields = partCols.map(c => fields.find(_.name == c).get)

    val metaDir = new Path(t.config.option("metadata.iceberg.storage-location",
      new Path(t.location, "metadata").toString))
    val fs = metaDir.getFileSystem(t.spark.sessionState.newHadoopConf())
    fs.mkdirs(metaDir)

    val sid = snap.id
    val om = new ObjectMapper()

    // ---- manifest reuse (per-manifest granularity): a previous manifest
    //      carries forward iff EVERY file it covers is still live; commits
    //      that removed files rewrite only the affected manifests' survivors
    //      (+ new files) into one delta manifest — O(affected), not O(table).
    //      Pure appends degenerate to carrying everything + one new manifest.
    val currentPaths = entries.map(_.path).toSet
    val prevState = readState(om, fs, metaDir)
    val (toWrite, carried, isAppend) = prevState match {
      case Some(st) if st.manifests.forall(_.filePaths.nonEmpty) =>
        val (keep, dropped) = st.manifests.partition(
          _.filePaths.forall(currentPaths.contains))
        val covered = keep.flatMap(_.filePaths).toSet
        (entries.filterNot(e => covered.contains(e.path)), keep, dropped.isEmpty)
      case Some(st) if st.files.forall(currentPaths.contains) &&
          st.files.size <= currentPaths.size =>
        // legacy state without per-manifest coverage: append-only reuse
        val prevSet = st.files.toSet
        (entries.filterNot(e => prevSet.contains(e.path)), st.manifests, true)
      case _ => (entries, Nil, false)
    }

    val newManifests: Seq[ManifestInfo] =
      if (toWrite.isEmpty) Nil
      else Seq(writeManifestAvro(om, fs, metaDir, t, fields, partFields,
        toWrite, sid))
    val manifests = carried ++ newManifests
    val addedRows = toWrite.map(_.rowCount).sum

    // ---- manifest list avro ----
    val listPath = new Path(metaDir, s"snap-$sid-${UUID.randomUUID()}.avro")
    locally {
      val ls = new Schema.Parser().parse(manifestListSchemaJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](ls))
      w.setMeta("format-version", "2")
      w.setMeta("snapshot-id", sid.toString)
      w.setMeta("sequence-number", sid.toString)
      val out = fs.create(listPath, true)
      w.create(ls, out)
      manifests.foreach { m =>
        val rec = new GenericData.Record(ls)
        rec.put("manifest_path", m.path)
        rec.put("manifest_length", java.lang.Long.valueOf(m.length))
        rec.put("partition_spec_id", 0)
        rec.put("content", 0)
        rec.put("sequence_number", java.lang.Long.valueOf(m.seq))
        rec.put("min_sequence_number", java.lang.Long.valueOf(m.seq))
        rec.put("added_snapshot_id", java.lang.Long.valueOf(m.seq))
        rec.put("added_files_count", m.files)
        rec.put("existing_files_count", 0)
        rec.put("deleted_files_count", 0)
        rec.put("added_rows_count", java.lang.Long.valueOf(m.rows))
        rec.put("existing_rows_count", java.lang.Long.valueOf(0L))
        rec.put("deleted_rows_count", java.lang.Long.valueOf(0L))
        w.append(rec)
      }
      w.close()
    }

    // ---- vN.metadata.json (+ carry forward previous snapshots) ----
    val meta = om.createObjectNode()
    meta.put("format-version", 2)
    meta.put("table-uuid", stableUuid(t.location))
    meta.put("location", t.location)
    meta.put("last-sequence-number", sid)
    meta.put("last-updated-ms", System.currentTimeMillis())
    meta.put("last-column-id", icebergLastColumnId(fields))
    meta.set[ObjectNode]("schemas",
      om.createArrayNode().add(icebergSchemaJson(om, fields)))
    meta.put("current-schema-id", 0)
    val spec = om.createObjectNode()
    spec.put("spec-id", 0)
    spec.set[ObjectNode]("fields", partitionSpecFieldsJson(om, partFields, fields))
    meta.set[ObjectNode]("partition-specs", om.createArrayNode().add(spec))
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", 1000 + math.max(partCols.size - 1, 0))
    val order = om.createObjectNode()
    order.put("order-id", 0)
    order.set[ObjectNode]("fields", om.createArrayNode())
    meta.set[ObjectNode]("sort-orders", om.createArrayNode().add(order))
    meta.put("default-sort-order-id", 0)
    val snapNode = om.createObjectNode()
    snapNode.put("snapshot-id", sid)
    snapNode.put("sequence-number", sid)
    snapNode.put("timestamp-ms", snap.timestampMs)
    val summary = om.createObjectNode()
    summary.put("operation",
      if (isAppend || carried.isEmpty && sid == 1L) "append" else "overwrite")
    summary.put("added-data-files", toWrite.size.toString)
    summary.put("added-records", addedRows.toString)
    snapNode.set[ObjectNode]("summary", summary)
    snapNode.put("manifest-list", listPathStr(listPath))
    snapNode.put("schema-id", 0)
    val snaps = previousSnapshots(om, fs, metaDir)
    snaps.add(snapNode)
    meta.set[ArrayNode]("snapshots", snaps)
    meta.put("current-snapshot-id", sid)
    val props = om.createObjectNode()
    props.put("write.format.default", t.fileFormat)
    props.put("schema.name-mapping.default", nameMappingJson(om, fields).toString)
    meta.set[ObjectNode]("properties", props)

    val mp = new Path(metaDir, s"v$sid.metadata.json")
    writeString(fs, mp, om.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    writeString(fs, new Path(metaDir, "version-hint.text"), sid.toString)
    writeState(om, fs, metaDir,
      ExportState(sid, manifests, entries.map(_.path)))
    Some(sid)
  }

  /** One exported manifest's identity + counters (for manifest reuse). */
  private case class ManifestInfo(path: String, length: Long, files: Int,
                                  rows: Long, seq: Long,
                                  filePaths: Seq[String] = Nil)
  private case class ExportState(snapshotId: Long,
                                 manifests: Seq[ManifestInfo],
                                 files: Seq[String])

  /** Export-state sidecar (NOT part of the iceberg spec — our own ledger of
    * which graft files each exported manifest covers, enabling the
    * append-only delta-manifest path without re-reading avro). */
  private def readState(om: ObjectMapper, fs: org.apache.hadoop.fs.FileSystem,
                        metaDir: Path): Option[ExportState] =
    try {
      val p = new Path(metaDir, "graft-iceberg-state.json")
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val root = om.readTree(in); in.close()
      val ms = root.get("manifests").asInstanceOf[ArrayNode]
      val manifests = (0 until ms.size).map { i =>
        val m = ms.get(i)
        ManifestInfo(m.get("path").asText, m.get("length").asLong,
          m.get("files").asInt, m.get("rows").asLong, m.get("seq").asLong,
          Option(m.get("filePaths")).collect { case a: ArrayNode =>
            (0 until a.size).map(j => a.get(j).asText) }.getOrElse(Nil))
      }
      val fsArr = root.get("files").asInstanceOf[ArrayNode]
      Some(ExportState(root.get("snapshotId").asLong, manifests,
        (0 until fsArr.size).map(i => fsArr.get(i).asText)))
    } catch { case _: Exception => None }

  private def writeState(om: ObjectMapper, fs: org.apache.hadoop.fs.FileSystem,
                         metaDir: Path, st: ExportState): Unit = {
    val root = om.createObjectNode()
    root.put("snapshotId", st.snapshotId)
    val ms = om.createArrayNode()
    st.manifests.foreach { m =>
      val n = om.createObjectNode()
      n.put("path", m.path); n.put("length", m.length)
      n.put("files", m.files); n.put("rows", m.rows); n.put("seq", m.seq)
      val fp = om.createArrayNode()
      m.filePaths.foreach(fp.add)
      n.set[ObjectNode]("filePaths", fp)
      ms.add(n)
    }
    root.set[ObjectNode]("manifests", ms)
    val fsArr = om.createArrayNode()
    st.files.foreach(fsArr.add)
    root.set[ObjectNode]("files", fsArr)
    writeString(fs, new Path(metaDir, "graft-iceberg-state.json"),
      root.toString)
  }

  /** Write one manifest avro for `entries`, all ADDED at sequence `seq`. */
  private def writeManifestAvro(om: ObjectMapper,
                                fs: org.apache.hadoop.fs.FileSystem,
                                metaDir: Path, t: GraftTable,
                                fields: Seq[FieldDef], partFields: Seq[FieldDef],
                                entries: Seq[ManifestEntry],
                                seq: Long): ManifestInfo = {
    val manifestPath = new Path(metaDir, s"graft-m-${UUID.randomUUID()}.avro")
    val entrySchema = new Schema.Parser().parse(
      manifestEntrySchemaJson(om, partFields))
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    var rows = 0L
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.setMeta("schema", icebergSchemaJson(om, fields).toString)
    w.setMeta("partition-spec",
      partitionSpecFieldsJson(om, partFields, fields).toString)
    w.setMeta("partition-spec-id", "0")
    w.setMeta("format-version", "2")
    w.setMeta("content", "data")
    val out = fs.create(manifestPath, true)
    w.create(entrySchema, out)
    entries.foreach { e =>
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", 1) // ADDED
      rec.put("snapshot_id", java.lang.Long.valueOf(seq))
      rec.put("sequence_number", java.lang.Long.valueOf(seq))
      rec.put("file_sequence_number", java.lang.Long.valueOf(seq))
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", 0) // DATA
      df.put("file_path", new Path(t.location, e.path).toString)
      df.put("file_format", t.fileFormat.toUpperCase)
      val part = new GenericData.Record(partSchema)
      partFields.foreach { f =>
        part.put(f.name, partitionValue(DataType.fromDDL(f.dataType),
          e.partition.get(f.name).orNull))
      }
      df.put("partition", part)
      df.put("record_count", java.lang.Long.valueOf(e.rowCount))
      df.put("file_size_in_bytes", java.lang.Long.valueOf(e.fileSize))
      // column stats (iceberg single-value binary serialization) so
      // external readers min/max-prune files like our own manifest pruner
      val nulls = new java.util.ArrayList[GenericRecord]()
      val lowers = new java.util.ArrayList[GenericRecord]()
      val uppers = new java.util.ArrayList[GenericRecord]()
      def kv(schemaField: String, key: Int, v: AnyRef): GenericRecord = {
        val s = dataFileSchema.getField(schemaField).schema()
          .getTypes.get(1).getElementType
        val r = new GenericData.Record(s)
        r.put("key", Integer.valueOf(key)); r.put("value", v); r
      }
      fields.foreach { f =>
        val dt = DataType.fromDDL(f.dataType)
        e.stats.get(f.name).foreach { st =>
          // nullCount -1 = not collected (metadata.stats-mode none) → omit;
          // truncated bounds are still valid iceberg lower/upper bounds
          // (iceberg itself truncates with write.metadata.metrics defaults)
          if (st.nullCount >= 0)
            nulls.add(kv("null_value_counts", f.id + 1,
              java.lang.Long.valueOf(st.nullCount)))
          for (b <- boundBytes(dt, st.min))
            lowers.add(kv("lower_bounds", f.id + 1, b))
          for (b <- boundBytes(dt, st.max))
            uppers.add(kv("upper_bounds", f.id + 1, b))
        }
      }
      df.put("null_value_counts", nulls)
      df.put("lower_bounds", lowers)
      df.put("upper_bounds", uppers)
      rec.put("data_file", df)
      rows += e.rowCount
      w.append(rec)
    }
    w.close()
    ManifestInfo(manifestPath.toString, fs.getFileStatus(manifestPath).getLen,
      entries.size, rows, seq, entries.map(_.path))
  }

  private def listPathStr(p: Path): String = p.toString

  private def writeString(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                          s: String): Unit = {
    val out = fs.create(p, true)
    out.write(s.getBytes("UTF-8")); out.close()
  }

  /** Deterministic per-table uuid (location-derived, stable across exports). */
  private def stableUuid(location: String): String =
    UUID.nameUUIDFromBytes(location.getBytes("UTF-8")).toString

  /** Carry forward prior snapshots (last 9) from the previous metadata so
    * Iceberg time travel spans exports; missing/corrupt previous = start
    * fresh. */
  private def previousSnapshots(om: ObjectMapper,
                                fs: org.apache.hadoop.fs.FileSystem,
                                metaDir: Path): ArrayNode = {
    val fresh = om.createArrayNode()
    try {
      val hint = new Path(metaDir, "version-hint.text")
      if (!fs.exists(hint)) return fresh
      val in = fs.open(hint)
      val v = scala.io.Source.fromInputStream(in).mkString.trim
      in.close()
      val prev = new Path(metaDir, s"v$v.metadata.json")
      if (!fs.exists(prev)) return fresh
      val pin = fs.open(prev)
      val root = om.readTree(pin); pin.close()
      val arr = root.get("snapshots").asInstanceOf[ArrayNode]
      val keep = math.max(arr.size() - 9, 0)
      (keep until arr.size()).foreach(i => fresh.add(arr.get(i)))
      fresh
    } catch { case _: Exception => om.createArrayNode() }
  }

  // ------------------------------------------------------------ type maps

  /** Iceberg type name for a Spark type (public spec, Schemas section). */
  private[core] def icebergType(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case _: TimestampType => "timestamptz"
    case _: TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(
      s"iceberg export does not support type $other (primitive columns only)")
  }

  /** Avro schema node for a partition field (nullable union). */
  private def avroType(om: ObjectMapper, dt: DataType): com.fasterxml.jackson.databind.JsonNode = {
    def prim(s: String) = om.getNodeFactory.textNode(s)
    dt match {
      case BooleanType => prim("boolean")
      case ByteType | ShortType | IntegerType => prim("int")
      case LongType => prim("long")
      case FloatType => prim("float")
      case DoubleType => prim("double")
      case StringType => prim("string")
      case BinaryType => prim("bytes")
      case DateType =>
        val n = om.createObjectNode()
        n.put("type", "int"); n.put("logicalType", "date"); n
      case _: TimestampType =>
        val n = om.createObjectNode()
        n.put("type", "long"); n.put("logicalType", "timestamp-micros")
        n.put("adjust-to-utc", true); n
      case _: TimestampNTZType =>
        val n = om.createObjectNode()
        n.put("type", "long"); n.put("logicalType", "timestamp-micros")
        n.put("adjust-to-utc", false); n
      case other => throw new IllegalArgumentException(
        s"unsupported iceberg partition type $other")
    }
  }

  /** Typed partition value from the manifest's string stat. */
  private def partitionValue(dt: DataType, s: String): AnyRef = {
    if (s == null) return null
    dt match {
      case BooleanType => java.lang.Boolean.valueOf(s.toBoolean)
      case ByteType | ShortType | IntegerType => Integer.valueOf(s.toInt)
      case LongType => java.lang.Long.valueOf(s.toLong)
      case FloatType => java.lang.Float.valueOf(s.toFloat)
      case DoubleType => java.lang.Double.valueOf(s.toDouble)
      case StringType => s
      case DateType =>
        Integer.valueOf(java.time.LocalDate.parse(s).toEpochDay.toInt)
      case _: TimestampType | _: TimestampNTZType =>
        java.lang.Long.valueOf(s.toLong) // stats store epoch-micros
      case other => throw new IllegalArgumentException(
        s"unsupported iceberg partition type $other")
    }
  }

  /** Iceberg single-value binary serialization of a bound (spec Appendix D):
    * little-endian fixed width for numerics, UTF-8 for strings. None when
    * the stat is absent or the type/value has no sound encoding (NaN). */
  private def boundBytes(dt: DataType, s: String): Option[java.nio.ByteBuffer] = {
    if (s == null) return None
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    dt match {
      case BooleanType =>
        Some(ByteBuffer.wrap(Array[Byte](if (s.toBoolean) 1 else 0)))
      case ByteType | ShortType | IntegerType =>
        Some(le(4).putInt(s.toInt).flip().asInstanceOf[ByteBuffer])
      case LongType =>
        Some(le(8).putLong(s.toLong).flip().asInstanceOf[ByteBuffer])
      case FloatType =>
        val f = s.toFloat
        if (f.isNaN) None
        else Some(le(4).putFloat(f).flip().asInstanceOf[ByteBuffer])
      case DoubleType =>
        val d = s.toDouble
        if (d.isNaN) None
        else Some(le(8).putDouble(d).flip().asInstanceOf[ByteBuffer])
      case StringType => Some(ByteBuffer.wrap(s.getBytes("UTF-8")))
      case DateType =>
        Some(le(4).putInt(java.time.LocalDate.parse(s).toEpochDay.toInt)
          .flip().asInstanceOf[ByteBuffer])
      case _: TimestampType | _: TimestampNTZType =>
        Some(le(8).putLong(s.toLong).flip().asInstanceOf[ByteBuffer])
      case _ => None
    }
  }

  // ------------------------------------------------------ json/avro shapes

  /** Iceberg schema json: {"type":"struct","schema-id":0,"fields":[...]} with
    * our field ids shifted +1 (iceberg ids are 1-based). Nested fields
    * (struct members, list elements, map keys/values) get unique ids from a
    * deterministic pre-order allocation starting past the top-level range —
    * stable for a fixed schema (the export already requires all files on the
    * current schema version). */
  private def icebergSchemaJson(om: ObjectMapper, fields: Seq[FieldDef]): ObjectNode = {
    var nextId = fields.map(_.id + 1).max + 1
    def alloc(): Int = { val i = nextId; nextId += 1; i }
    def typeNode(dt: DataType): com.fasterxml.jackson.databind.JsonNode = dt match {
      case st: StructType =>
        val n = om.createObjectNode()
        n.put("type", "struct")
        val arr = om.createArrayNode()
        st.fields.foreach { f =>
          val fn = om.createObjectNode()
          fn.put("id", alloc())
          fn.put("name", f.name)
          fn.put("required", false)
          fn.set[ObjectNode]("type", typeNode(f.dataType))
          arr.add(fn)
        }
        n.set[ObjectNode]("fields", arr)
        n
      case at: ArrayType =>
        val n = om.createObjectNode()
        n.put("type", "list")
        n.put("element-id", alloc())
        n.set[ObjectNode]("element", typeNode(at.elementType))
        n.put("element-required", false)
        n
      case mt: MapType =>
        val n = om.createObjectNode()
        n.put("type", "map")
        n.put("key-id", alloc())
        n.set[ObjectNode]("key", typeNode(mt.keyType))
        n.put("value-id", alloc())
        n.set[ObjectNode]("value", typeNode(mt.valueType))
        n.put("value-required", false)
        n
      case prim => om.getNodeFactory.textNode(icebergType(prim))
    }
    val n = om.createObjectNode()
    n.put("type", "struct")
    n.put("schema-id", 0)
    val arr = om.createArrayNode()
    fields.foreach { f =>
      val fn = om.createObjectNode()
      fn.put("id", f.id + 1)
      fn.put("name", f.name)
      fn.put("required", false)
      fn.set[ObjectNode]("type", typeNode(DataType.fromDDL(f.dataType)))
      arr.add(fn)
    }
    n.set[ObjectNode]("fields", arr)
    n
  }

  /** Highest field id the schema json allocates (nested ids included) —
    * mirrors icebergSchemaJson's deterministic pre-order allocation. */
  private[core] def icebergLastColumnId(fields: Seq[FieldDef]): Int = {
    def nestedIds(dt: DataType): Int = dt match {
      case st: StructType => st.fields.map(f => 1 + nestedIds(f.dataType)).sum
      case at: ArrayType => 1 + nestedIds(at.elementType)
      case mt: MapType => 2 + nestedIds(mt.keyType) + nestedIds(mt.valueType)
      case _ => 0
    }
    fields.map(_.id + 1).max +
      fields.map(f => nestedIds(DataType.fromDDL(f.dataType))).sum
  }

  /** Identity partition-spec fields with iceberg's 1000+ partition ids. */
  private def partitionSpecFieldsJson(om: ObjectMapper, partFields: Seq[FieldDef],
                                      all: Seq[FieldDef]): ArrayNode = {
    val arr = om.createArrayNode()
    partFields.zipWithIndex.foreach { case (f, i) =>
      val n = om.createObjectNode()
      n.put("name", f.name)
      n.put("transform", "identity")
      n.put("source-id", f.id + 1)
      n.put("field-id", 1000 + i)
      arr.add(n)
    }
    arr
  }

  /** `schema.name-mapping.default`: name → field-id mapping so Iceberg can
    * read parquet files that carry column NAMES only (the standard property
    * for imported files, used by iceberg's own add_files/migrate). */
  private def nameMappingJson(om: ObjectMapper, fields: Seq[FieldDef]): ArrayNode = {
    // derived from the schema json so nested ids can never diverge from it
    import com.fasterxml.jackson.databind.JsonNode
    def entry(id: Int, name: String, tpe: JsonNode): ObjectNode = {
      val n = om.createObjectNode()
      n.put("field-id", id)
      n.set[ArrayNode]("names", om.createArrayNode().add(name))
      val nested = children(tpe)
      if (nested.size > 0) n.set[ObjectNode]("fields", nested)
      n
    }
    def children(tpe: JsonNode): ArrayNode = {
      val arr = om.createArrayNode()
      if (tpe.isObject) tpe.get("type").asText match {
        case "struct" =>
          tpe.get("fields").forEach { f =>
            arr.add(entry(f.get("id").asInt, f.get("name").asText, f.get("type")))
          }
        case "list" =>
          arr.add(entry(tpe.get("element-id").asInt, "element", tpe.get("element")))
        case "map" =>
          arr.add(entry(tpe.get("key-id").asInt, "key", tpe.get("key")))
          arr.add(entry(tpe.get("value-id").asInt, "value", tpe.get("value")))
        case _ => ()
      }
      arr
    }
    children(icebergSchemaJson(om, fields))
  }

  /** manifest_entry avro schema (spec "Manifests"): nested data_file record
    * `r2`, partition record `r102`, all fields carrying iceberg field-ids. */
  private def manifestEntrySchemaJson(om: ObjectMapper,
                                      partFields: Seq[FieldDef]): String = {
    def field(name: String, tpe: com.fasterxml.jackson.databind.JsonNode,
              id: Int, optional: Boolean): ObjectNode = {
      val f = om.createObjectNode()
      f.put("name", name)
      if (optional) {
        val u = om.createArrayNode(); u.add("null"); u.add(tpe)
        f.set[ObjectNode]("type", u)
        f.set[ObjectNode]("default", om.getNodeFactory.nullNode())
      } else f.set[ObjectNode]("type", tpe)
      f.put("field-id", id)
      f
    }
    def prim(s: String) = om.getNodeFactory.textNode(s)

    val partRec = om.createObjectNode()
    partRec.put("type", "record"); partRec.put("name", "r102")
    val pf = om.createArrayNode()
    partFields.zipWithIndex.foreach { case (f, i) =>
      pf.add(field(f.name, avroType(om, DataType.fromDDL(f.dataType)),
        1000 + i, optional = true))
    }
    partRec.set[ObjectNode]("fields", pf)

    // iceberg's avro encoding for int-keyed maps: array of key/value records
    // with logicalType "map" and per-map key/value field ids (spec Appendix A)
    def mapField(name: String, fieldId: Int, keyId: Int, valueId: Int,
                 valueType: String): ObjectNode = {
      val rec = om.createObjectNode()
      rec.put("type", "record"); rec.put("name", s"k${keyId}_v$valueId")
      val kf = om.createArrayNode()
      kf.add(field("key", prim("int"), keyId, optional = false))
      kf.add(field("value", prim(valueType), valueId, optional = false))
      rec.set[ObjectNode]("fields", kf)
      val arr = om.createObjectNode()
      arr.put("type", "array"); arr.put("logicalType", "map")
      arr.set[ObjectNode]("items", rec)
      field(name, arr, fieldId, optional = true)
    }

    val dataRec = om.createObjectNode()
    dataRec.put("type", "record"); dataRec.put("name", "r2")
    val df = om.createArrayNode()
    df.add(field("content", prim("int"), 134, optional = false))
    df.add(field("file_path", prim("string"), 100, optional = false))
    df.add(field("file_format", prim("string"), 101, optional = false))
    df.add(field("partition", partRec, 102, optional = false))
    df.add(field("record_count", prim("long"), 103, optional = false))
    df.add(field("file_size_in_bytes", prim("long"), 104, optional = false))
    df.add(mapField("null_value_counts", 110, 121, 122, "long"))
    df.add(mapField("lower_bounds", 125, 126, 127, "bytes"))
    df.add(mapField("upper_bounds", 128, 129, 130, "bytes"))
    dataRec.set[ObjectNode]("fields", df)

    val entry = om.createObjectNode()
    entry.put("type", "record"); entry.put("name", "manifest_entry")
    val ef = om.createArrayNode()
    ef.add(field("status", prim("int"), 0, optional = false))
    ef.add(field("snapshot_id", prim("long"), 1, optional = true))
    ef.add(field("sequence_number", prim("long"), 3, optional = true))
    ef.add(field("file_sequence_number", prim("long"), 4, optional = true))
    ef.add(field("data_file", dataRec, 2, optional = false))
    entry.set[ObjectNode]("fields", ef)
    entry.toString
  }

  /** manifest_file avro schema (spec "Manifest Lists"), v2 field set. */
  private val manifestListSchemaJson: String =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin
}
