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

  /** Build the z-value column for `df` over `cols`. Triggers one
    * approxQuantile job per column (sampled, cheap relative to a rewrite). */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 8, "z-order supports 1..8 columns")
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
      interleave(buckets, n)
    }
    zUdf(array(cols.indices.map(i => numericProj(df, cols(i))): _*))
  }
}
