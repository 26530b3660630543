package graft.formats

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.util.SerializableConfiguration

import java.io.{DataInputStream, EOFException}

/** Binary row data-file format for `file.format=row` (capability of paimon's
  * row format, paimon-format/.../row/RowFileFormatFactory.java:27 — the
  * cheapest write path for row-oriented ingest: no columnar re-encode, no
  * schema-aware encoding pass). Layout:
  *
  * {{{
  *   int32  magic "GROW"      | int32 version
  *   utf    schema DDL        (the WRITE schema — readers project by name)
  *   repeat: int32 rowBytes   | UnsafeRow payload
  * }}}
  *
  * Rows are Tungsten `UnsafeRow` images — writing is a single projection +
  * buffer copy per row; reading points an `UnsafeRow` at each record and
  * extracts only the REQUIRED columns (by-name against the stored write
  * schema, null-filled when absent → schema evolution works like parquet).
  * Whole-file splits (`isSplitable=false`): the engine's write rolling
  * bounds file size, so one file is one work unit, like the native scan's
  * bin-packed splits. */
class GraftRowFileFormat extends FileFormat with DataSourceRegister with Serializable {
  import GraftRowFileFormat._

  override def shortName(): String = "graft-row"
  override def toString: String = "GraftRow"
  override def equals(other: Any): Boolean = other.isInstanceOf[GraftRowFileFormat]
  override def hashCode(): Int = getClass.hashCode()

  override def isSplitable(sparkSession: SparkSession,
                           options: Map[String, String], path: Path): Boolean = false

  override def inferSchema(sparkSession: SparkSession, options: Map[String, String],
                           files: Seq[FileStatus]): Option[StructType] = {
    val conf = sparkSession.sessionState.newHadoopConf()
    files.find(_.getLen > 0).map { st =>
      val in = new DataInputStream(st.getPath.getFileSystem(conf).open(st.getPath))
      try readHeader(in) finally in.close()
    }
  }

  override def prepareWrite(sparkSession: SparkSession, job: Job,
                            options: Map[String, String],
                            dataSchema: StructType): OutputWriterFactory =
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".row"
      override def newInstance(path: String, dataSchema: StructType,
                               context: TaskAttemptContext): OutputWriter =
        new GraftRowOutputWriter(path, dataSchema, context)
    }

  override def buildReader(sparkSession: SparkSession, dataSchema: StructType,
                           partitionSchema: StructType, requiredSchema: StructType,
                           filters: Seq[Filter], options: Map[String, String],
                           hadoopConf: Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val confBc = sparkSession.sparkContext.broadcast(
      new SerializableConfiguration(hadoopConf))
    (file: PartitionedFile) => {
      val p = file.toPath
      val in = new DataInputStream(p.getFileSystem(confBc.value.value).open(p))
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        try in.close() catch { case _: Exception => }
      })
      val writeSchema = readHeader(in)
      val nWrite = writeSchema.length
      // by-name projection with null fill (files written under older
      // schemas predate newer columns)
      val getters: Array[InternalRow => Any] = requiredSchema.fields.map { f =>
        writeSchema.fieldNames.indexOf(f.name) match {
          case -1 => (_: InternalRow) => null
          case i =>
            val dt = writeSchema.fields(i).dataType
            (r: InternalRow) => if (r.isNullAt(i)) null else r.get(i, dt)
        }
      }
      new Iterator[InternalRow] {
        private var nextLen = advance()
        private def advance(): Int =
          try in.readInt() catch { case _: EOFException => in.close(); -1 }
        override def hasNext: Boolean = nextLen >= 0
        override def next(): InternalRow = {
          val bytes = new Array[Byte](nextLen)
          in.readFully(bytes)
          val ur = new UnsafeRow(nWrite)
          ur.pointTo(bytes, nextLen)
          val out = new Array[Any](getters.length)
          var i = 0
          while (i < getters.length) { out(i) = getters(i)(ur); i += 1 }
          nextLen = advance()
          new GenericInternalRow(out)
        }
      }
    }
  }
}

object GraftRowFileFormat {
  val Magic = 0x47524f57 // "GROW"
  val Version = 2

  private[formats] def readHeader(in: DataInputStream): StructType = {
    require(in.readInt() == Magic, "not a graft row file")
    val v = in.readInt()
    val ddl = v match {
      case 1 => in.readUTF() // legacy: 64KB-bounded modified-UTF header
      case 2 =>
        // length-prefixed UTF-8 — wide schemas exceed writeUTF's 64KB cap
        val bytes = new Array[Byte](in.readInt())
        in.readFully(bytes)
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(
        s"unsupported row-file version $other")
    }
    DataType.fromDDL(ddl).asInstanceOf[StructType]
  }
}

class GraftRowOutputWriter(val path: String, dataSchema: StructType,
                           context: TaskAttemptContext) extends OutputWriter {
  private val proj = UnsafeProjection.create(dataSchema)
  private val out = {
    val p = new Path(path)
    val s = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      p.getFileSystem(context.getConfiguration).create(p, true), 1 << 16))
    s.writeInt(GraftRowFileFormat.Magic)
    s.writeInt(GraftRowFileFormat.Version)
    val ddl = dataSchema.toDDL.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    s.writeInt(ddl.length)
    s.write(ddl)
    s
  }
  private val copyBuffer = new Array[Byte](1 << 16)

  override def write(row: InternalRow): Unit = {
    val ur = proj(row)
    out.writeInt(ur.getSizeInBytes)
    ur.writeToStream(out, copyBuffer)
  }
  override def close(): Unit = out.close()
}
