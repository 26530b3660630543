package graft.formats

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.TaskContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import java.math.BigInteger
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro data-file format for `file.format=avro` (capability of paimon's
  * AvroFileFormat, paimon-format/.../avro/AvroFileFormat.java:52 — the
  * common row-oriented streaming-ingest write format). Spark ships only the
  * raw avro runtime (no spark-avro module), so this is a minimal Spark
  * `FileFormat` over avro's GenericRecord API:
  *
  *  - write: one `DataFileWriter` per task file (container format, codec
  *    from `file.compression`, snappy default) — integrates with Spark's
  *    `FileFormatWriter`, so partition-dir routing (`partitionBy(__pt,
  *    __bkt)`), `maxRecordsPerFile` rolling and commit protocol all apply
  *    unchanged at any scale;
  *  - read: whole-file `DataFileReader` per split (`isSplitable=false` —
  *    files are size-bounded by the engine's write rolling, so one file ==
  *    one work unit, the same granularity the native scan bin-packs);
  *    projection is by-name against the writer schema with null fill, so
  *    schema-evolution reads (old files missing new columns) work like the
  *    parquet path.
  *
  * Types: all atomic Spark types (timestamps as micros logical types,
  * decimal as bytes+logical), arrays, string-keyed maps, structs; nullable
  * ⇒ union(null, T).
  */
class GraftAvroFileFormat extends FileFormat with DataSourceRegister with Serializable {
  override def shortName(): String = "graft-avro"
  override def toString: String = "GraftAvro"
  override def equals(other: Any): Boolean = other.isInstanceOf[GraftAvroFileFormat]
  override def hashCode(): Int = getClass.hashCode()

  override def isSplitable(sparkSession: SparkSession,
                           options: Map[String, String], path: Path): Boolean = false

  override def inferSchema(sparkSession: SparkSession, options: Map[String, String],
                           files: Seq[FileStatus]): Option[StructType] = {
    val conf = sparkSession.sessionState.newHadoopConf()
    files.find(_.getLen > 0).map { st =>
      val in = new FsInput(st.getPath, conf)
      try {
        val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
        try AvroConv.toSparkType(r.getSchema).asInstanceOf[StructType]
        finally r.close()
      } finally in.close()
    }
  }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory = {
    val codec = options.getOrElse("compression", "snappy")
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".avro"
      override def newInstance(path: String, dataSchema: StructType,
                               context: TaskAttemptContext): OutputWriter =
        new GraftAvroOutputWriter(path, dataSchema, context, codec)
    }
  }

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
                           partitionSchema: StructType, requiredSchema: StructType,
                           filters: Seq[Filter], options: Map[String, String],
                           hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val confBc: Broadcast[SerializableConfiguration] =
      sparkSession.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    (file: PartitionedFile) => {
      val in = new FsInput(file.toPath, confBc.value.value)
      val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        try reader.close() catch { case _: Exception => }
      })
      val writerSchema = reader.getSchema
      // by-name projection with null fill: a field absent from the file
      // (written under an older schema) reads as null
      val getters: Array[GenericRecord => Any] = requiredSchema.fields.map { f =>
        Option(writerSchema.getField(f.name)) match {
          case Some(af) =>
            val conv = AvroConv.avroToCatalyst(af.schema(), f.dataType)
            val pos = af.pos()
            (r: GenericRecord) => conv(r.get(pos))
          case None => (_: GenericRecord) => null
        }
      }
      new Iterator[InternalRow] {
        private var closed = false
        override def hasNext: Boolean = {
          if (closed) return false
          val h = reader.hasNext
          if (!h) { reader.close(); closed = true }
          h
        }
        override def next(): InternalRow = {
          val rec = reader.next()
          val vals = new Array[Any](getters.length)
          var i = 0
          while (i < getters.length) { vals(i) = getters(i)(rec); i += 1 }
          new GenericInternalRow(vals)
        }
      }
    }
  }
}

/** One avro container file per task output (FileFormatWriter contract). */
class GraftAvroOutputWriter(val path: String, dataSchema: StructType,
                            context: TaskAttemptContext, codec: String)
    extends OutputWriter {
  private val avroSchema = AvroConv.toAvroSchema(dataSchema, "graft_record")
  private val setters: Array[InternalRow => Any] =
    dataSchema.fields.zipWithIndex.map { case (f, i) =>
      val conv = AvroConv.catalystToAvro(f.dataType, avroSchema.getFields.get(i).schema())
      (row: InternalRow) => if (row.isNullAt(i)) null else conv(row.get(i, f.dataType))
    }
  private val writer = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(codec match {
      case "none" | "null" | "uncompressed" => CodecFactory.nullCodec()
      case c => CodecFactory.fromString(c)
    })
    val p = new Path(path)
    w.create(avroSchema, p.getFileSystem(context.getConfiguration).create(p, true))
    w
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < setters.length) { rec.put(i, setters(i)(row)); i += 1 }
    writer.append(rec)
  }
  override def close(): Unit = writer.close()
}

/** Spark ↔ avro schema + value conversion (the subset graft tables use). */
object AvroConv {

  def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable, f.name),
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, nullable: Boolean, path: String): Schema = {
    val base = nonNull(dt, path)
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  private def nonNull(dt: DataType, path: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      Schema.createArray(fieldSchema(et, containsNull, path + ".element"))
    case MapType(StringType, vt, valueContainsNull) =>
      Schema.createMap(fieldSchema(vt, valueContainsNull, path + ".value"))
    case st: StructType =>
      toAvroSchema(st, "r_" + path.replaceAll("[^A-Za-z0-9_]", "_"))
    case other =>
      throw new IllegalArgumentException(
        s"file.format=avro does not support type $other (column $path)")
  }

  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis => TimestampType
      case _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => s.getLogicalType match {
      case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name(), toSparkType(f.schema()),
          nullable = isNullableUnion(f.schema()))).toArray)
    case Schema.Type.UNION => toSparkType(unionBranch(s))
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  private def isNullableUnion(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def unionBranch(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toList match {
      case one :: Nil => one
      case _ => throw new IllegalArgumentException(
        s"only [null, T] avro unions are supported, got $s")
    }

  /** Catalyst internal value → avro generic value for `dt` under the
    * EXACT avro schema `as` the writer declares (nested records must carry
    * the declared record instance — avro resolves unions by full name). */
  def catalystToAvro(dt: DataType, as: Schema): Any => Any = {
    val s = unionBranch(as)
    dt match {
      case StringType => v => v.asInstanceOf[UTF8String].toString
      case BinaryType => v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType => v => ByteBuffer.wrap(
        v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue().toByteArray)
      case ByteType => v => v.asInstanceOf[Byte].toInt
      case ShortType => v => v.asInstanceOf[Short].toInt
      case ArrayType(et, _) =>
        val ec = catalystToAvro(et, s.getElementType)
        v => {
          val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          val out = new java.util.ArrayList[Any](a.numElements())
          var i = 0
          while (i < a.numElements()) {
            out.add(if (a.isNullAt(i)) null else ec(a.get(i, et))); i += 1
          }
          out
        }
      case MapType(StringType, vt, _) =>
        val vc = catalystToAvro(vt, s.getValueType)
        v => {
          val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val keys = m.keyArray(); val vals = m.valueArray()
          val out = new java.util.HashMap[String, Any](m.numElements())
          var i = 0
          while (i < m.numElements()) {
            out.put(keys.getUTF8String(i).toString,
              if (vals.isNullAt(i)) null else vc(vals.get(i, vt)))
            i += 1
          }
          out
        }
      case st: StructType =>
        val fcs = st.fields.zipWithIndex.map { case (f, i) =>
          catalystToAvro(f.dataType, s.getFields.get(i).schema())
        }
        v => {
          val row = v.asInstanceOf[InternalRow]
          val rec = new GenericData.Record(s)
          var i = 0
          while (i < st.length) {
            rec.put(i, if (row.isNullAt(i)) null else fcs(i)(row.get(i, st.fields(i).dataType)))
            i += 1
          }
          rec
        }
      case _ => identity // int/long/float/double/boolean/date/timestamp pass through
    }
  }

  /** Avro generic value (under `as`, unions resolved) → catalyst internal
    * value of `dt`. */
  def avroToCatalyst(as: Schema, dt: DataType): Any => Any = {
    val s = unionBranch(as)
    val conv: Any => Any = dt match {
      case StringType => v => UTF8String.fromString(v.toString)
      case BinaryType => {
        case b: ByteBuffer => bytesOf(b)
        case f: GenericData.Fixed => f.bytes().clone()
        case v => v
      }
      case d: DecimalType => v => {
        val bytes = v match {
          case b: ByteBuffer => bytesOf(b)
          case f: GenericData.Fixed => f.bytes()
        }
        Decimal(new java.math.BigDecimal(new BigInteger(bytes), d.scale), d.precision, d.scale)
      }
      case ByteType => v => v.asInstanceOf[Int].toByte
      case ShortType => v => v.asInstanceOf[Int].toShort
      case TimestampType if s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis] =>
        v => v.asInstanceOf[Long] * 1000L
      case ArrayType(et, _) =>
        val ec = avroToCatalyst(s.getElementType, et)
        v => {
          val in = v.asInstanceOf[java.util.Collection[Any]]
          val out = new Array[Any](in.size())
          var i = 0
          val it = in.iterator()
          while (it.hasNext) {
            val e = it.next(); out(i) = if (e == null) null else ec(e); i += 1
          }
          new GenericArrayData(out)
        }
      case MapType(StringType, vt, _) =>
        val vc = avroToCatalyst(s.getValueType, vt)
        v => {
          val in = v.asInstanceOf[java.util.Map[Any, Any]]
          val keys = new Array[Any](in.size())
          val vals = new Array[Any](in.size())
          var i = 0
          val it = in.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            keys(i) = UTF8String.fromString(e.getKey.toString)
            vals(i) = if (e.getValue == null) null else vc(e.getValue)
            i += 1
          }
          ArrayBasedMapData(keys, vals)
        }
      case st: StructType =>
        val getters = st.fields.map { f =>
          Option(s.getField(f.name)) match {
            case Some(af) =>
              val c = avroToCatalyst(af.schema(), f.dataType)
              val pos = af.pos()
              (r: GenericRecord) => { val v = r.get(pos); if (v == null) null else c(v) }
            case None => (_: GenericRecord) => null
          }
        }
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          val out = new Array[Any](getters.length)
          var i = 0
          while (i < getters.length) { out(i) = getters(i)(rec); i += 1 }
          new GenericInternalRow(out)
        }
      case _ => identity
    }
    v => if (v == null) null else conv(v)
  }

  private def bytesOf(b: ByteBuffer): Array[Byte] = {
    val d = b.duplicate()
    val out = new Array[Byte](d.remaining())
    d.get(out)
    out
  }
}
