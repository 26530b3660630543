package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
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
 * Each stores the *serialized sketch bytes* so downstream jobs can keep
 * merging (unlike approx_count_distinct, which finalizes to a count).
 * `hll_sketch` maps to Spark 4's built-in `hll_sketch_agg` (same
 * DataSketches HLL family).
 */
object GraftAggs {

  private implicit val bytesEnc: Encoder[Array[Byte]] = Encoders.BINARY
  private implicit val longEnc: Encoder[java.lang.Long] = Encoders.LONG.asInstanceOf[Encoder[java.lang.Long]]

  /** Theta sketch over long inputs; output = compact sketch bytes. */
  private class ThetaAgg extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    private def toSketch(b: Array[Byte]): CompactSketch =
      if (b.isEmpty) UpdateSketch.builder().build().compact()
      else Sketches.wrapCompactSketch(Memory.wrap(b))
    def reduce(buf: Array[Byte], in: java.lang.Long): Array[Byte] = {
      if (in == null) return buf
      val s = UpdateSketch.builder().build()
      s.update(in.longValue())
      merge(buf, s.compact().toByteArrayCompressed)
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val u = SetOperation.builder().buildUnion()
      u.union(toSketch(a)); u.union(toSketch(b))
      u.getResult.toByteArrayCompressed
    }
    def finish(b: Array[Byte]): Array[Byte] = toSketch(b).toByteArrayCompressed
    def bufferEncoder: Encoder[Array[Byte]] = bytesEnc
    def outputEncoder: Encoder[Array[Byte]] = bytesEnc
  }

  /** 32-bit roaring bitmap over int inputs; output = portable RBM bytes. */
  private class Rbm32Agg extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = ser(new RoaringBitmap)
    private def ser(r: RoaringBitmap): Array[Byte] = {
      r.runOptimize()
      val bos = new ByteArrayOutputStream()
      r.serialize(new DataOutputStream(bos))
      bos.toByteArray
    }
    private def de(b: Array[Byte]): RoaringBitmap = {
      val r = new RoaringBitmap
      if (b.nonEmpty) r.deserialize(ByteBuffer.wrap(b))
      r
    }
    def reduce(buf: Array[Byte], in: java.lang.Long): Array[Byte] = {
      if (in == null) return buf
      val r = de(buf); r.add(in.intValue()); ser(r)
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      ser(RoaringBitmap.or(de(a), de(b)))
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = bytesEnc
    def outputEncoder: Encoder[Array[Byte]] = bytesEnc
  }

  /** 64-bit roaring bitmap over long inputs. */
  private class Rbm64Agg extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = ser(new Roaring64Bitmap)
    private def ser(r: Roaring64Bitmap): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      r.serialize(new DataOutputStream(bos))
      bos.toByteArray
    }
    private def de(b: Array[Byte]): Roaring64Bitmap = {
      val r = new Roaring64Bitmap
      if (b.nonEmpty) r.deserialize(ByteBuffer.wrap(b))
      r
    }
    def reduce(buf: Array[Byte], in: java.lang.Long): Array[Byte] = {
      if (in == null) return buf
      val r = de(buf); r.addLong(in.longValue()); ser(r)
    }
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val ra = de(a); ra.or(de(b)); ser(ra)
    }
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: Encoder[Array[Byte]] = bytesEnc
    def outputEncoder: Encoder[Array[Byte]] = bytesEnc
  }

  private lazy val thetaUdaf = udaf(new ThetaAgg)
  private lazy val rbm32Udaf = udaf(new Rbm32Agg)
  private lazy val rbm64Udaf = udaf(new Rbm64Agg)

  def thetaSketch(c: Column): Column = thetaUdaf(c.cast("long"))
  def rbm32(c: Column): Column = rbm32Udaf(c.cast("long"))
  def rbm64(c: Column): Column = rbm64Udaf(c.cast("long"))
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
