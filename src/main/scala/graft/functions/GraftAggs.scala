package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.RoaringBitmap
import org.roaringbitmap.longlong.Roaring64Bitmap

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/**
 * Re-aggregatable sketch / bitmap aggregate functions, parity with paimon's
 * per-field aggregators `theta_sketch`, `rbm32`, `rbm64`, `hll_sketch`
 * (reference: paimon-core/.../mergetree/compact/aggregate/factory/
 * FieldThetaSketchAggFactory.java:31, FieldRoaringBitmap32AggFactory.java:31,
 * FieldHllSketchAggFactory.java:31).
 *
 * Implemented as `TypedImperativeAggregate`: the per-group buffer is the
 * LIVE bitmap/sketch object, mutated in place per input row; serialization
 * happens only at shuffle/spill boundaries. (Round 1 used `udaf(Aggregator)`
 * with byte-array buffers — O(n·|bitmap|) ser/de churn in the hot path, the
 * advisor's #5 finding. SURVEY §2.4 prescribed exactly this class.)
 *
 * Each output is the *serialized sketch bytes* so downstream jobs can keep
 * merging (unlike approx_count_distinct, which finalizes to a count).
 * `hll_sketch` maps to Spark 4's built-in `hll_sketch_agg` (same
 * DataSketches HLL family).
 */
object GraftAggs {

  private def agg(e: TypedImperativeAggregate[_]): Column =
    SparkShims.column(e.toAggregateExpression())
  private def longChild(c: Column): Expression =
    SparkShims.expression(c.cast("long"))

  def thetaSketch(c: Column): Column = agg(ThetaSketchAgg(longChild(c)))
  /** Bounded sorted set of the `cap` smallest distinct STRING or BINARY
    * values per group — see [[CappedSortedSetAgg]]. */
  def cappedSortedSet(c: Column, cap: Int): Column =
    agg(CappedSortedSetAgg(SparkShims.expression(c), cap))
  def rbm32(c: Column): Column = agg(Rbm32Agg(longChild(c)))
  def rbm64(c: Column): Column = agg(Rbm64Agg(longChild(c)))
  def hllSketch(c: Column): Column = hll_sketch_agg(c)

  /** Estimate readers for the sketches (useful in tests / system queries). */
  def thetaEstimate(bytes: Array[Byte]): Double =
    if (bytes == null || bytes.isEmpty) 0.0
    else Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate
  def rbm32Cardinality(bytes: Array[Byte]): Long = {
    val r = new RoaringBitmap
    if (bytes != null && bytes.nonEmpty) r.deserialize(ByteBuffer.wrap(bytes))
    r.getLongCardinality
  }
  def rbm64Cardinality(bytes: Array[Byte]): Long = {
    val r = new Roaring64Bitmap
    if (bytes != null && bytes.nonEmpty) r.deserialize(ByteBuffer.wrap(bytes))
    r.getLongCardinality
  }
}

/** Common shape: long input → mutable buffer → binary output. */
abstract class BytesAggBase[B] extends TypedImperativeAggregate[B]
    with UnaryLike[Expression] {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  protected def updateLong(buffer: B, v: Long): Unit
  override def update(buffer: B, input: InternalRow): B = {
    val v = child.eval(input)
    if (v != null) updateLong(buffer, v.asInstanceOf[Long])
    buffer
  }
}

case class Rbm32Agg(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends BytesAggBase[RoaringBitmap] {
  override def createAggregationBuffer(): RoaringBitmap = new RoaringBitmap
  override protected def updateLong(b: RoaringBitmap, v: Long): Unit = b.add(v.toInt)
  override def merge(b: RoaringBitmap, o: RoaringBitmap): RoaringBitmap = { b.or(o); b }
  override def eval(b: RoaringBitmap): Any = serialize(b)
  override def serialize(b: RoaringBitmap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream()
    b.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val r = new RoaringBitmap
    if (bytes.nonEmpty) r.deserialize(ByteBuffer.wrap(bytes))
    r
  }
  override protected def withNewChildInternal(newChild: Expression): Rbm32Agg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): Rbm32Agg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): Rbm32Agg =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "rbm32"
}

case class Rbm64Agg(child: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends BytesAggBase[Roaring64Bitmap] {
  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap
  override protected def updateLong(b: Roaring64Bitmap, v: Long): Unit = b.addLong(v)
  override def merge(b: Roaring64Bitmap, o: Roaring64Bitmap): Roaring64Bitmap = { b.or(o); b }
  override def eval(b: Roaring64Bitmap): Any = serialize(b)
  override def serialize(b: Roaring64Bitmap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream()
    b.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val r = new Roaring64Bitmap
    if (bytes.nonEmpty) r.deserialize(ByteBuffer.wrap(bytes))
    r
  }
  override protected def withNewChildInternal(newChild: Expression): Rbm64Agg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): Rbm64Agg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): Rbm64Agg =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "rbm64"
}

case class ThetaSketchAgg(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends BytesAggBase[Union] {
  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()
  override protected def updateLong(b: Union, v: Long): Unit = b.update(v)
  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult)
    b
  }
  override def eval(b: Union): Any = b.getResult.toByteArrayCompressed
  override def serialize(b: Union): Array[Byte] = b.getResult.toByteArrayCompressed
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    if (bytes.nonEmpty) u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "theta_sketch"
}

/** Bounded sorted-set aggregate over a STRING or BINARY key: keeps the
  * `cap` SMALLEST distinct values per group (unsigned byte-lexicographic
  * order for both types — UTF8String.compareTo IS unsigned byte order, so
  * a hex fingerprint and its unhexed binary form rank isomorphically),
  * emitted as a sorted array. Replaces the window-rank + collect_list
  * spelling of LSH candidate buckets (Dedup.pairsFromSignatures): a
  * `row_number() OVER (PARTITION BY bucket ORDER BY key) <= cap` filter
  * forces a FULL SORT of every banded row in a SEPARATE window stage
  * before the aggregation even starts, while this
  * TypedImperativeAggregate is the aggregation itself — one stage fewer,
  * and map-side partial buffers already capped (guide §2.3/§2.4: fewer
  * bytes into the exchange). ObjectHashAggregate may still fall back to
  * sort-based aggregation past its in-memory group threshold
  * (spark.sql.objectHashAggregate.sortBased.fallbackThreshold) — that sort
  * is by the grouping key only and replaces the window's, never adds to
  * it. Semantics are identical by construction: the "cap smallest distinct
  * per group, sorted" set is exactly what the rank filter + post-hoc sort
  * produced. Input assumption of the DISTINCT semantics (vs the replaced
  * row_number cap, which counted duplicates): callers feed one row per
  * distinct key per group — Dedup bands reps-collapsed fingerprints, which
  * are unique per (band, bucket) by construction. */
case class CappedSortedSetAgg(child: Expression, cap: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[AnyRef]]
    with UnaryLike[Expression] {
  require(cap > 0, "cap must be positive")
  private def binary: Boolean = child.dataType == BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING or BINARY child, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  // unsigned byte-lexicographic for both element kinds. LAZY: reads
  // child.dataType, which is only legal once the child is resolved (the
  // analyzer copies this node via withNewChildInternal while unresolved).
  private lazy val ord: java.util.Comparator[AnyRef] =
    if (binary)
      (a: AnyRef, b: AnyRef) => java.util.Arrays.compareUnsigned(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    else
      (a: AnyRef, b: AnyRef) =>
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
  override def createAggregationBuffer(): java.util.TreeSet[AnyRef] =
    new java.util.TreeSet[AnyRef](ord)
  override def update(b: java.util.TreeSet[AnyRef],
                      input: InternalRow): java.util.TreeSet[AnyRef] = {
    val v = child.eval(input)
    if (v != null) {
      // copy on admit: a UTF8String from the input row points into a reused
      // scan buffer (getBinary copies already; cloning 16 B is noise)
      def owned: AnyRef = v match {
        case s: UTF8String => s.clone()
        case a: Array[Byte] => a.clone()
      }
      if (b.size < cap) b.add(owned)
      else if (ord.compare(v.asInstanceOf[AnyRef], b.last()) < 0) {
        if (b.add(owned)) b.pollLast()
      }
    }
    b
  }
  override def merge(b: java.util.TreeSet[AnyRef],
                     o: java.util.TreeSet[AnyRef]): java.util.TreeSet[AnyRef] = {
    val it = o.iterator()
    var continue = true
    while (continue && it.hasNext) {
      val s = it.next() // already copied at update
      if (b.size < cap) b.add(s)
      else if (ord.compare(s, b.last()) < 0) { if (b.add(s)) b.pollLast() }
      else continue = false // o is sorted: the rest can only be larger
    }
    b
  }
  override def eval(b: java.util.TreeSet[AnyRef]): Any = {
    val arr = new Array[AnyRef](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
  override def serialize(b: java.util.TreeSet[AnyRef]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) {
      val bytes = it.next() match {
        case s: UTF8String => s.getBytes
        case a: Array[Byte] => a
      }
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[AnyRef] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new java.util.TreeSet[AnyRef](ord)
    var i = 0
    while (i < n) {
      val len = in.readInt(); val sb = new Array[Byte](len)
      in.readFully(sb)
      b.add(if (binary) sb else UTF8String.fromBytes(sb)); i += 1
    }
    b
  }
  override protected def withNewChildInternal(newChild: Expression): CappedSortedSetAgg =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(n: Int): CappedSortedSetAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CappedSortedSetAgg =
    copy(inputAggBufferOffset = n)
  override def prettyName: String = "capped_sorted_set"
}
