package graft.dsv2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Literal, Pmod, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/**
 * The `bucket` V2 function: how graft routes primary keys to buckets,
 * exposed through the catalog so Spark can plan storage-partitioned joins
 * over co-bucketed tables (the FunctionCatalog side of
 * KeyGroupedPartitioning — reference capability: paimon's bucket transform
 * reported by PaimonScan.scala:115).
 *
 * Semantics are EXACTLY the write path's `bucketExpr`
 * (pmod(xxhash64(pks), n), core/table.scala): the bound function evaluates
 * the same Catalyst expressions, so a shuffled SPJ side lands on identical
 * bucket ids.
 */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): graft hash bucket = pmod(xxhash64(cols), numBuckets)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2, "bucket(numBuckets, col, ...)")
    require(inputType.fields.head.dataType == IntegerType,
      "first bucket() argument must be the integer bucket count")
    new GraftBucketBound(inputType)
  }
}

class GraftBucketBound(inputType: StructType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = inputType.fields.map(_.dataType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  @transient private lazy val expr = {
    val keyRefs = inputType.fields.zipWithIndex.drop(1).map { case (f, i) =>
      BoundReference(i, f.dataType, f.nullable)
    }
    Pmod(new XxHash64(keyRefs.toIndexedSeq),
      Cast(BoundReference(0, IntegerType, nullable = false), LongType))
  }

  override def produceResult(input: InternalRow): Integer =
    expr.eval(input).asInstanceOf[Long].toInt
}
