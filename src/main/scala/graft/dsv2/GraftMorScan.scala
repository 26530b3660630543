package graft.dsv2

import graft.core._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.paths.SparkPath

import java.util.OptionalLong

/**
 * Zero-exchange merge-on-read scan — the capability of the reference's
 * per-bucket LSM merge (operation/MergeFileSplitRead.java:236,
 * mergetree/MergeTreeReaders.java:44): every row version of a key lives in
 * that key's (partition, bucket), so the merge can run INSIDE the scan,
 * one task per key group, with NO shuffle. The relational Window/max_by
 * plan (MergeEngines) remains the semantics reference, the path for the
 * other merge engines, and the library fallback.
 *
 * Per key group the reader streams all files and keeps the winning version
 * per primary key by the stored LSM envelope (__seq, __commit, __pos) —
 * latest for `deduplicate`, earliest for `first-row` — then emits winners
 * that are not delete tombstones. Raw-convertible groups (fully-merged
 * compaction output) skip the hash map and stream through. Deletion
 * vectors apply per file BEFORE the merge. Memory is bounded by one
 * bucket's distinct keys (the write-side bucket target), the same bound
 * the reference's per-bucket merge holds.
 *
 * Value filters are NOT pushed into the parquet readers: dropping a newer
 * non-matching version pre-merge would resurrect an older matching one.
 * Merge-safe conjuncts (primary-key / partition columns — constant across
 * a key's versions) do push; Spark re-applies every filter post-scan
 * (GraftScanBuilder.pushFilters keeps all filters residual).
 */
class GraftMorScan(t: GraftTable, entries: Seq[ManifestEntry],
                   pushed: Array[Filter], required: Option[StructType],
                   dv: Map[String, Array[Byte]],
                   readOptions: Map[String, String] = Map.empty)
    extends Scan with Batch with SupportsReportStatistics {

  private val latestFirst = t.config.mergeEngine == "deduplicate"
  private val outSchema = required.getOrElse(t.dataSchema)

  // wide row read from parquet: projected columns ∪ primary key ∪ envelope,
  // in file-schema order (stable indices for the projections below)
  private val wideSchema: StructType = {
    val need = (outSchema.fieldNames ++ t.config.primaryKeys ++
      Seq(GraftTable.SEQ, GraftTable.SEQ2, GraftTable.COMMIT, GraftTable.POS, GraftTable.KIND)).toSet
    StructType(t.fileSchema.fields.filter(f => need.contains(f.name)))
  }
  private def idx(n: String): Int = wideSchema.fieldIndex(n)

  // merge-safe parquet pushdown: filters referencing only pk/partition cols
  private val safePushed: Array[Filter] = {
    val safe = (t.config.primaryKeys ++ t.config.partitionKeys).toSet
    pushed.filter(_.references.forall(safe.contains))
  }

  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(math.max(1L, entries.map(_.fileSize).sum))
    // manifest row counts OVERCOUNT merged rows — leave numRows unknown
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val locRoot = new Path(t.location)
    def toFile(e: ManifestEntry): PartitionedFile = {
      val abs = new Path(locRoot, e.path)
      PartitionedFile(InternalRow.empty, SparkPath.fromPath(abs), 0L,
        e.fileSize, Array.empty[String], 0L, e.fileSize, Map.empty)
    }
    entries.groupBy(e => (e.partition.toSeq.sortBy(_._1), e.bucket)).toSeq
      .sortBy(_._1.toString)
      .map { case (_, group) =>
        val files = group.sortBy(_.path).toArray
        val fps = files.map(e =>
          dv.get(GraftTable.dvKey(e.path))
            .map(b => DvCache.fingerprint(GraftTable.dvKey(e.path), b)).orNull)
        val bytes = files.map(e => dv.get(GraftTable.dvKey(e.path)).orNull)
        // fully-merged groups stream through (tombstone-free by rawBucket)
        val raw = t.rawBucket(group) && fps.forall(_ == null)
        GraftMorInputPartition(files.map(toFile), fps, bytes, raw)
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val wideTypes = wideSchema.fields.map(_.dataType)
    GraftMorReaderFactory(
      GraftBatchScan.parquetFactory(t, wideSchema, safePushed),
      // DV files read WITHOUT pushdown (row index = running count)
      GraftBatchScan.parquetFactory(t, wideSchema, Array.empty),
      pkIdx = t.config.primaryKeys.map(idx).toArray,
      seqIdx = idx(GraftTable.SEQ), seq2Idx = idx(GraftTable.SEQ2),
      commitIdx = idx(GraftTable.COMMIT),
      posIdx = idx(GraftTable.POS), kindIdx = idx(GraftTable.KIND),
      outIdx = outSchema.fieldNames.map(idx),
      wideTypes = wideTypes, latestFirst = latestFirst)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    GraftMicroBatchStream.forTable(t, checkpointLocation, readOptions)

  override def description(): String =
    s"GraftMorScan(${t.location}, files=${entries.size}, engine=${t.config.mergeEngine})"
}

object GraftMorScan {
  /** Entries for a merge-in-scan plan, or None when this table/snapshot
    * needs the V1 DataFrame path — see GraftTable.morPlanEntries. */
  def plan(t: GraftTable, snapshotId: Option[Long],
           filter: Option[org.apache.spark.sql.Column]): Option[Seq[ManifestEntry]] =
    t.morPlanEntries(snapshotId, filter)
}

/** All files of ONE (partition, bucket) key group; `dvFps`/`dvBytes` align
  * with `files` (null = no outstanding vector). `raw` = fully merged, the
  * reader streams rows without the hash map. */
case class GraftMorInputPartition(files: Array[PartitionedFile],
                                  dvFps: Array[String],
                                  dvBytes: Array[Array[Byte]],
                                  raw: Boolean) extends InputPartition {
  override def preferredLocations(): Array[String] = Array.empty
}

case class GraftMorReaderFactory(delegate: ParquetPartitionReaderFactory,
                                 dvDelegate: ParquetPartitionReaderFactory,
                                 pkIdx: Array[Int], seqIdx: Int, seq2Idx: Int, commitIdx: Int,
                                 posIdx: Int, kindIdx: Int, outIdx: Array[Int],
                                 wideTypes: Array[DataType], latestFirst: Boolean)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  private def fileReader(gp: GraftMorInputPartition, i: Int)
      : PartitionReader[InternalRow] = {
    val fp = FilePartition(0, Array(gp.files(i)))
    if (gp.dvBytes(i) == null) delegate.createReader(fp)
    else {
      val bm = DvCache.bitmapFp(gp.dvFps(i), gp.dvBytes(i))
      val inner = dvDelegate.createReader(fp)
      new PartitionReader[InternalRow] {
        private var pos = -1L
        private var cur: InternalRow = _
        override def next(): Boolean = {
          while (inner.next()) {
            pos += 1
            if (!bm.contains(pos.toInt)) { cur = inner.get(); return true }
          }
          false
        }
        override def get(): InternalRow = cur
        override def close(): Unit = inner.close()
      }
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftMorInputPartition]
    val outProj = UnsafeProjection.create(
      outIdx.map(i => BoundReference(i, wideTypes(i), true)
        : org.apache.spark.sql.catalyst.expressions.Expression))

    new PartitionReader[InternalRow] {
      private var it: Iterator[InternalRow] = _
      private var cur: InternalRow = _

      private def merged(): Iterator[InternalRow] = {
        val pkProj = UnsafeProjection.create(
          pkIdx.map(i => BoundReference(i, wideTypes(i), true)
            : org.apache.spark.sql.catalyst.expressions.Expression))
        // pk -> (seq, commit, pos, winning row copy)
        val winners = new java.util.HashMap[UnsafeRow, Array[Any]]()
        var i = 0
        while (i < gp.files.length) {
          val r = fileReader(gp, i)
          try {
            while (r.next()) {
              val row = r.get()
              val seq = row.getLong(seqIdx)
              val seq2 = if (row.isNullAt(seq2Idx)) 0L else row.getLong(seq2Idx)
              val cm = row.getLong(commitIdx)
              val pos = if (row.isNullAt(posIdx)) Long.MinValue
                        else row.getLong(posIdx)
              val key = pkProj(row)
              val prev = winners.get(key)
              val better = prev == null || {
                val c =
                  if (seq != prev(0).asInstanceOf[Long])
                    java.lang.Long.compare(seq, prev(0).asInstanceOf[Long])
                  else if (seq2 != prev(1).asInstanceOf[Long])
                    java.lang.Long.compare(seq2, prev(1).asInstanceOf[Long])
                  else if (cm != prev(2).asInstanceOf[Long])
                    java.lang.Long.compare(cm, prev(2).asInstanceOf[Long])
                  else java.lang.Long.compare(pos, prev(3).asInstanceOf[Long])
                if (latestFirst) c > 0 else c < 0
              }
              if (better)
                winners.put(key.copy(), Array[Any](seq, seq2, cm, pos, row.copy()))
            }
          } finally r.close()
          i += 1
        }
        import scala.jdk.CollectionConverters._
        winners.values().iterator().asScala
          .map(_(4).asInstanceOf[InternalRow])
          .filter(_.getInt(kindIdx) != GraftTable.KIND_DELETE)
          .map(outProj(_))
      }

      /** Raw group: stream files (tombstone-free by rawBucket), project. */
      private def streamed(): Iterator[InternalRow] = new Iterator[InternalRow] {
        private var fi = 0
        private var r: PartitionReader[InternalRow] = _
        private var nxt: InternalRow = _
        private def advance(): Unit = {
          nxt = null
          while (nxt == null) {
            if (r == null) {
              if (fi >= gp.files.length) return
              r = fileReader(gp, fi); fi += 1
            }
            if (r.next()) nxt = r.get()
            else { r.close(); r = null }
          }
        }
        advance()
        override def hasNext: Boolean = nxt != null
        override def next(): InternalRow = {
          val out = outProj(nxt); advance(); out
        }
      }

      override def next(): Boolean = {
        if (it == null) it = if (gp.raw) streamed() else merged()
        if (it.hasNext) { cur = it.next(); true } else false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
