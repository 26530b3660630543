package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native one-pass vector expressions (round 13, guide §4: eliminate
 * non-codegen expressions in hot paths). The relational forms they replace
 * — `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` and friends
 * (Similarity.dot/cosine/l2sq) — are higher-order functions: Catalyst
 * evaluates them INTERPRETED (HOFs are CodegenFallback), materializing a
 * boxed intermediate array per row per call; `cosine` paid that three
 * times (dot + both norms). These run per corpus row in every ANN scan
 * (bruteForceTopK, ivf assign/probe, kmeans) and per candidate pair in the
 * near-dup verify, so the interpreter overhead IS the operator cost at
 * scale.
 *
 * Bit-exact contract with the replaced forms, scoped to EQUAL-LENGTH
 * inputs (every in-repo caller; oracle hashes depend on it): accumulation
 * runs in index order over doubles (floats widen exactly); any null
 * element yields NULL; cosine returns 0.0 when either norm is zero,
 * computed as `sqrt(sum a²) * sqrt(sum b²)` exactly like
 * `norm(a) * norm(b)`. Length-MISMATCHED inputs return NULL here, which
 * differs from the old HOF cosine in one corner: the old
 * `when(norm == 0, 0.0)` guard fired before the null dot propagated, so a
 * mismatched pair whose shorter-prefix norm was zero returned 0.0 (r13
 * ADVICE). No caller compares mismatched vectors — fixed-dimension
 * embedding columns — so NULL-on-mismatch is kept as the saner contract.
 */
abstract class VecBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  protected def leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
  /** graft.functions.GraftVec method name to invoke. */
  protected def fn: String
  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = evalVec(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r == null) null else r
  }
  protected def evalVec(a: ArrayData, b: ArrayData): java.lang.Double
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecr")
      s"""
         |java.lang.Double $tmp =
         |  graft.functions.GraftVec.$fn($a, $leftFloat, $b, $rightFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ in one pass — replaces aggregate(zip_with(a,b,*), 0.0, +). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpr {
  override protected def fn: String = "dot"
  override protected def evalVec(a: ArrayData, b: ArrayData): java.lang.Double =
    GraftVec.dot(a, leftFloat, b, rightFloat)
  override def prettyName: String = "graft_vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Cosine similarity in ONE pass (dot and both norms share the loop);
  * 0.0 when either norm is zero. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpr {
  override protected def fn: String = "cosine"
  override protected def evalVec(a: ArrayData, b: ArrayData): java.lang.Double =
    GraftVec.cosine(a, leftFloat, b, rightFloat)
  override def prettyName: String = "graft_vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
}

/** Σ (aᵢ-bᵢ)² in one pass. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpr {
  override protected def fn: String = "l2sq"
  override protected def evalVec(a: ArrayData, b: ArrayData): java.lang.Double =
    GraftVec.l2sq(a, leftFloat, b, rightFloat)
  override def prettyName: String = "graft_vec_l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
    copy(left = l, right = r)
}

/** |A ∩ B| of two SORTED ascending ARRAY<BIGINT> sets by two-pointer merge
  * — replaces `size(array_intersect(a, b))`, which builds a hash set per
  * PAIR (the minhash verify evaluates it per candidate pair; the set build
  * dominates). Inputs must be sorted sets (distinct, ascending) — the
  * signature pipeline sorts them once per document at build time. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> inputs, got ${l.sql}, ${r.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftVec.sortedIntersectCount($a, $b)")
  override def prettyName: String = "graft_sorted_intersect_count"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** |A ∩ B| of two SORTED ascending ARRAY<STRING> sets by two-pointer merge
  * — the string-set twin of [[SortedIntersectCount]] (r14 verdict item 7:
  * `array_intersect`/`array_union` hash-build a set per candidate PAIR in
  * the n-gram jaccard verify; with per-row pre-sorted distinct shingle
  * sets, one zero-allocation merge per pair replaces both). Inputs must be
  * distinct + ascending in UTF8String (unsigned byte) order —
  * [[SortedDistinctStrings]] produces exactly that. */
case class SortedIntersectCountStrings(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING> inputs, got ${l.sql}, ${r.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.sortedIntersectCountStrings(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftVec.sortedIntersectCountStrings($a, $b)")
  override def prettyName: String = "graft_sorted_intersect_count_strings"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCountStrings =
    copy(left = l, right = r)
}

object GraftVec {
  // All loops replicate the folds they replace element-for-element:
  // accumulate in index order, bail to null on a null element or a length
  // mismatch (zip_with's null padding propagates through the sum).

  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var d = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y; sa += x * x; sb += y * y
      i += 1
    }
    val nn = math.sqrt(sa) * math.sqrt(sb)
    if (nn == 0.0) 0.0 else d / nn
  }

  def l2sq(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val diff = x - y
      acc += diff * diff
      i += 1
    }
    acc
  }

  /** Sort + adjacent-dedup in one pass (vs array_distinct's per-row hash
    * set); ascending output, the form [[sortedIntersectCount]] needs. */
  def sortedDistinct(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val arr = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { arr(m) = a.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(arr, 0, m)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(arr, w))
  }

  /** Sort + adjacent-dedup of a string array in one pass (the UTF8String
    * twin of [[sortedDistinct]]); ascending unsigned-byte order, null
    * elements dropped. Output elements reference the input's UTF8Strings
    * (no byte copies) — valid under the standard expression contract (the
    * consumer copies into its own row before the next input row). */
  def sortedDistinctStrings(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val arr = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { arr(m) = a.getUTF8String(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]], 0, m)
    val out = new Array[AnyRef](m)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || !arr(i).equals(out(w - 1))) { out(w) = arr(i); w += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }

  /** Two-pointer |A ∩ B| over sorted ascending distinct string sets. */
  def sortedIntersectCountStrings(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Two-pointer |A ∩ B| over sorted ascending long sets. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Sorted distinct ARRAY<BIGINT> in one sort+dedup pass — replaces
  * `array_distinct` (hash-set build per row) where downstream consumers
  * want the SET form anyway and benefit from sorted order
  * ([[SortedIntersectCount]]). Ascending order; null input → null; null
  * ELEMENTS are dropped (every caller's sets are null-free — the nullable
  * element type only appears in stored-table schemas). */
case class SortedDistinctLongs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    GraftVec.sortedDistinct(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.sortedDistinct($c)")
  override def prettyName: String = "graft_sorted_distinct"
  override protected def withNewChildInternal(newChild: Expression): SortedDistinctLongs =
    copy(child = newChild)
}

/** Sorted distinct ARRAY<STRING> in one sort+dedup pass — the set form
  * [[SortedIntersectCountStrings]] consumes (ascending unsigned-byte
  * order). Replaces `array_distinct` (per-row hash-set build) where the
  * consumer wants sorted sets anyway. Null input → null; null elements
  * dropped (shingle arrays are null-free). */
case class SortedDistinctStrings(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any =
    GraftVec.sortedDistinctStrings(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.sortedDistinctStrings($c)")
  override def prettyName: String = "graft_sorted_distinct_strings"
  override protected def withNewChildInternal(newChild: Expression): SortedDistinctStrings =
    copy(child = newChild)
}
