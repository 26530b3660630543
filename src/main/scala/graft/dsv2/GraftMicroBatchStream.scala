package graft.dsv2

import graft.core._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/**
 * Structured Streaming micro-batch source over the snapshot log — the
 * capability of paimon's PaimonMicroBatchStream
 * (paimon-spark/.../sources/PaimonMicroBatchStream.scala:33; offsets per
 * PaimonSourceOffset.scala:36): offset = snapshot id; a batch is the delta
 * files of snapshots (start, end], skipping compactions (changelog-producer
 * `input` semantics — raw upsert records flow downstream as inserts).
 *
 * Delta files are decoded executor-side by a self-contained parquet Group
 * reader (micro-batches are small; the batch path keeps Spark's vectorized
 * reader). Supported streaming column types: boolean, int, long, float,
 * double, date, timestamp (micros), string, binary.
 */
class GraftMicroBatchStream(t: GraftTable, checkpointLocation: String)
    extends MicroBatchStream {

  private val conf = new SerializableConfiguration(
    t.spark.sessionState.newHadoopConf())
  private val dataSchema = t.schema.sparkSchema

  override def initialOffset(): Offset =
    GraftOffset(t.config.options.get("scan.snapshot-id").map(_.toLong - 1).getOrElse(0L))
  override def latestOffset(): Offset =
    GraftOffset(t.sm.latestSnapshotId.getOrElse(0L))
  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].snapshotId
    val e = end.asInstanceOf[GraftOffset].snapshotId
    val entries = (s + 1 to e).flatMap { id =>
      if (!t.sm.snapshotExists(id)) Nil
      else {
        val snap = t.sm.readSnapshot(id)
        if (snap.kind == "COMPACT") Nil
        else snap.deltaManifests.flatMap(t.sm.readManifest).filter(_.kind == 0)
      }
    }
    entries.map(en => GraftFilePartition(
      new Path(t.location, en.path).toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStreamReaderFactory(dataSchema, conf)
}

case class GraftOffset(snapshotId: Long) extends Offset {
  override def json(): String = snapshotId.toString
}

case class GraftFilePartition(file: String) extends InputPartition

class GraftStreamReaderFactory(schema: StructType, conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftGroupReader(partition.asInstanceOf[GraftFilePartition].file, schema, conf)
}

/** Row-at-a-time parquet reader (Group API) → InternalRow per `schema`;
  * columns missing in the file (schema evolution) read as null. */
class GraftGroupReader(file: String, schema: StructType,
                       conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  @SuppressWarnings(Array("deprecation"))
  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf.value).build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val gt = g.getType
    val values = schema.fields.map { f =>
      if (!gt.containsField(f.name)) null
      else {
        val idx = gt.getFieldIndex(f.name)
        if (g.getFieldRepetitionCount(idx) == 0) null
        else decode(g, idx, f.dataType)
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }

  private def decode(g: Group, idx: Int, dt: DataType): Any = dt match {
    case BooleanType => g.getBoolean(idx, 0)
    case IntegerType | DateType => g.getInteger(idx, 0)
    case LongType => g.getLong(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case DoubleType => g.getDouble(idx, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
    case BinaryType => g.getBinary(idx, 0).getBytes
    case _: TimestampType | _: TimestampNTZType =>
      // files are written by Spark with MICROS annotation; normalize others
      val prim = g.getType.getType(idx).asPrimitiveType()
      val v = prim.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT64 => g.getLong(idx, 0)
        case other => throw new UnsupportedOperationException(s"timestamp as $other")
      }
      prim.getLogicalTypeAnnotation match {
        case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => v
            case LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
            case LogicalTypeAnnotation.TimeUnit.NANOS => v / 1000L
          }
        case _ => v
      }
    case other =>
      throw new UnsupportedOperationException(s"streaming read of type $other")
  }

  override def close(): Unit = reader.close()
}
