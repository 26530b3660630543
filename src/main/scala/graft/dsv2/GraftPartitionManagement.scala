package graft.dsv2

import graft.core.GraftTable
import graft.core.RowOps._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
import org.apache.spark.sql.connector.catalog.SupportsAtomicPartitionManagement
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.util.{Map => JMap, Objects}

/**
 * `SHOW PARTITIONS` / `ALTER TABLE ... DROP PARTITION` surface (capability of
 * paimon's PaimonPartitionManagement.scala:39, re-expressed over graft
 * manifests): partition identifiers come from manifest partition values (a
 * metadata fold, no data read), DROP/TRUNCATE PARTITION routes to the
 * engine's exact metadata-only delete, and partition stats (row/file counts)
 * fold the matching manifest entries. Creating partitions is a no-op —
 * partitions exist implicitly through data (paimon only notifies a
 * metastore there).
 */
trait GraftPartitionManagement extends SupportsAtomicPartitionManagement {

  def t: GraftTable

  override lazy val partitionSchema: StructType =
    StructType(t.config.partitionKeys.flatMap(k =>
      t.schema.sparkSchema.fields.find(_.name == k)))

  /** Manifest partition values are strings; catalyst identifiers are typed. */
  private def toCatalyst(s: String, dt: DataType): Any = {
    if (s == null) return null
    dt match {
      case StringType => UTF8String.fromString(s)
      case IntegerType => s.toInt
      case LongType => s.toLong
      case ShortType => s.toShort
      case ByteType => s.toByte
      case BooleanType => s.toBoolean
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
      case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
      case d: DecimalType => Decimal(new java.math.BigDecimal(s))
      case _ => throw new UnsupportedOperationException(
        s"partition type $dt not supported for partition management")
    }
  }

  private def identCondition(names: Seq[String], row: InternalRow): Option[Column] =
    names.zipWithIndex.map { case (n, i) =>
      val dt = partitionSchema.fields(partitionSchema.fieldIndex(n)).dataType
      val v = row.get(i, dt)
      if (v == null) col(n).isNull
      else col(n) <=> SparkShims.column(Literal(v, dt))
    }.reduceOption(_ && _)

  private def distinctPartitions: Seq[Map[String, String]] =
    t.planFiles(None, None).map(_.partition).distinct

  override def listPartitionIdentifiers(partitionCols: Array[String],
                                        ident: InternalRow): Array[InternalRow] = {
    require(partitionCols.length == ident.numFields,
      "partition names and values must align")
    require(partitionCols.forall(partitionSchema.fieldNames.contains),
      s"unknown partition columns ${partitionCols.mkString(",")}")
    val fields = partitionSchema.fields
    distinctPartitions.map { p =>
      new GenericInternalRow(fields.map(f =>
        toCatalyst(p.getOrElse(f.name, null), f.dataType)).toArray[Any])
    }.filter { r =>
      partitionCols.zipWithIndex.forall { case (n, i) =>
        val idx = partitionSchema.fieldIndex(n)
        val dt = fields(idx).dataType
        Objects.equals(r.get(idx, dt), ident.get(i, dt))
      }
    }.toArray
  }

  override def dropPartitions(idents: Array[InternalRow]): Boolean = {
    idents.foreach { r =>
      identCondition(partitionSchema.fieldNames.toSeq.take(r.numFields), r)
        .foreach(c => t.delete(c))
    }
    true
  }

  override def dropPartition(ident: InternalRow): Boolean =
    dropPartitions(Array(ident))

  override def truncatePartition(ident: InternalRow): Boolean =
    dropPartitions(Array(ident))

  override def createPartitions(idents: Array[InternalRow],
                                props: Array[JMap[String, String]]): Unit = ()

  override def createPartition(ident: InternalRow,
                               props: JMap[String, String]): Unit = ()

  override def replacePartitionMetadata(ident: InternalRow,
                                        props: JMap[String, String]): Unit =
    throw new UnsupportedOperationException("replace partition is not supported")

  override def loadPartitionMetadata(ident: InternalRow): JMap[String, String] = {
    val fields = partitionSchema.fields
    val entries = t.planFiles(None, None).filter { e =>
      fields.zipWithIndex.forall { case (f, i) =>
        Objects.equals(toCatalyst(e.partition.getOrElse(f.name, null), f.dataType),
          ident.get(i, f.dataType))
      }
    }
    val m = new java.util.HashMap[String, String]()
    if (entries.nonEmpty) {
      m.put("recordCount", entries.map(_.rowCount).sum.toString)
      m.put("fileCount", entries.size.toString)
      m.put("fileSizeInBytes", entries.map(_.fileSize).sum.toString)
    }
    m
  }
}
