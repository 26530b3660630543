package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Z-order (Morton) clustering key over N columns (capability of paimon's
 * sort compaction, reference paimon-spark/.../sort/SparkZOrderUDF.java and
 * paimon-common/.../sort/zorder/ — our construction is quantile-bucketed
 * rather than byte-mapped).
 *
 * Scale design: each column is reduced to an 8-bit quantile bucket using
 * `approxQuantile` boundaries computed in ONE distributed pass and broadcast
 * inside the closure; the per-row work is a binary search + bit interleave
 * (no global sort, no window). The resulting long key is then used with
 * `repartitionByRange` so output files carry non-overlapping z-ranges.
 */
object ZOrder {

  private val BITS = 8 // bucket bits per column (max 8 cols in a 64-bit key)

  /** Numeric projection of a column for quantile bucketing. */
  private def numericProj(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast(DoubleType)
      case _: DateType => col(c).cast(IntegerType).cast(DoubleType)
      case _: TimestampType | _: TimestampNTZType =>
        col(c).cast(TimestampType).cast(DoubleType)
      case _: BooleanType => col(c).cast(IntegerType).cast(DoubleType)
      case _: StringType =>
        // order-preserving prefix: first 4 bytes, big-endian
        val b = unhex(rpad(hex(substring(col(c), 0, 4)), 8, "0"))
        conv(hex(b), 16, 10).cast(DoubleType)
      case other => throw new IllegalArgumentException(s"z-order unsupported type $other")
    }
  }

  private def interleave(buckets: Array[Int], nCols: Int): Long = {
    var z = 0L
    var bit = 0
    while (bit < BITS) {
      var c = 0
      while (c < nCols) {
        val b = (buckets(c) >> (BITS - 1 - bit)) & 1
        z = (z << 1) | b
        c += 1
      }
      bit += 1
    }
    z
  }

  /** Hilbert transform of N bucket coordinates (Skilling's transpose
    * construction, "Programming the Hilbert curve", AIP CP 707, 2004 —
    * the same public algorithm behind paimon's HilbertIndexer /
    * SparkHilbertUDF capability). Mutates `x` into transposed Hilbert
    * coordinates whose bit-interleave is the curve index. */
  private def axesToTranspose(x: Array[Int], nCols: Int): Array[Int] = {
    val m = 1 << (BITS - 1)
    // inverse undo
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < nCols) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < nCols) { x(i) ^= x(i - 1); i += 1 }
    var t = 0
    q = m
    while (q > 1) {
      if ((x(nCols - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < nCols) { x(i) ^= t; i += 1 }
    x
  }

  /** Shared scaffold: quantile-bucket each column (one distributed
    * approxQuantile pass, boundaries broadcast in the closure), then fold
    * the bucket coordinates into a space-filling-curve key. */
  private def curveValue(df: DataFrame, cols: Seq[String],
                         fold: (Array[Int], Int) => Long): Column = {
    require(cols.nonEmpty && cols.size <= 8, "curve supports 1..8 columns")
    val projected = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__zp_$i", numericProj(df, c))
    }
    val probs = (1 until (1 << BITS)).map(_.toDouble / (1 << BITS)).toArray
    val cuts: Array[Array[Double]] = cols.indices.map { i =>
      val q = projected.stat.approxQuantile(s"__zp_$i", probs, 0.001)
      q
    }.toArray
    val n = cols.size
    val zUdf = udf { (vals: Seq[java.lang.Double]) =>
      val buckets = new Array[Int](n)
      var i = 0
      while (i < n) {
        val v = vals(i)
        buckets(i) =
          if (v == null) 0
          else {
            val arr = cuts(i)
            var lo = 0; var hi = arr.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (arr(mid) <= v) lo = mid + 1 else hi = mid
            }
            lo // 0..255
          }
        i += 1
      }
      fold(buckets, n)
    }
    zUdf(array(cols.indices.map(i => numericProj(df, cols(i))): _*))
  }

  /** Build the z-value column for `df` over `cols`. Triggers one
    * approxQuantile job per column (sampled, cheap relative to a rewrite). */
  def zvalue(df: DataFrame, cols: Seq[String]): Column =
    curveValue(df, cols, interleave)

  /** Hilbert curve key — better locality than Morton for range queries on
    * any dimension subset (no long diagonal jumps). */
  def hilbertValue(df: DataFrame, cols: Seq[String]): Column =
    curveValue(df, cols, (b, n) => interleave(axesToTranspose(b, n), n))
}
