package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-n-gram shingle hashes as ONE pass per row — a native Catalyst
  * expression replacing `shingleHashes(shingles(text, n))`, which
  * materializes a token array, then a shingle STRING per window
  * (array_join), then md5-hex + conv per shingle. Byte-identical
  * semantics: tokens are the non-empty `\s+`-splits of `lower(trim(text))`
  * (= maximal runs between ASCII regex-`\s` bytes of the lowercased
  * string); each hash is the first 8 md5-hex chars of the
  * space-joined n-token window, as an unsigned 32-bit value in a long —
  * the same `('0x'||substr(md5(s),1,8))::UBIGINT` contract the DuckDB
  * oracles use. Fewer than n tokens → empty array; null → null. The md5
  * still runs per shingle (that IS the contract); what this removes is
  * the per-shingle string/array materialization around it. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    GraftShingleHash.hashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftShingleHash.hashes($c, $n)")
}

/** SimHash-32 as one native pass (same sign-sum definition as the
  * relational [[graft.pipeline.TextOps.simhash32Relational]], which
  * re-evaluates the md5 token hashes under each of its 32 per-bit
  * aggregate passes). NULL text → 0, exactly like the relational form
  * (its when(null > 0).otherwise(0) folds null to the empty fingerprint) —
  * a null-fingerprint doc must still band-join with empty-text docs. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash32"
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else GraftShingleHash.simhash32(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = ${c.isNull} ? 0L :
        graft.functions.GraftShingleHash.simhash32(${c.value});""",
      isNull = FalseLiteral)
  }
}

/** MinHash signature from a staged hash array in ONE array pass — replaces
  * `minhashFromHashes(hashCol, k)`, whose k `array_min(transform(...))`
  * elements each re-walk the array (k O(n) passes + k transformed-array
  * materializations; Catalyst does no CSE across array() elements). Same
  * contract: element j = min over h of (mhA(j)·h + mhB(j)) mod 2^32
  * ([[graft.pipeline.TextOps.mhA]] seeds); empty array → k nulls. */
case class MinhashFromHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "signature length must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"
  override protected def withNewChildInternal(newChild: Expression): MinhashFromHashes =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    GraftShingleHash.minhash(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftShingleHash.minhash($c, $k)")
}

object GraftShingleHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // per-k affine seed tables (identical to TextOps.mhA/mhB), cached — the
  // expression evaluates per ROW; rebuilding k-length arrays there would
  // dominate for short docs
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def seeds(k: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(k, k => (
      Array.tabulate(k)(j => ((2654435761L * (j + 1)) % 2147483647L) | 1L),
      Array.tabulate(k)(j => (40503L * (2L * j + 1L)) % 4294967296L)))

  /** One pass over the staged hash array, k running minima. a·h+b stays
    * below 2^63 (a < 2^31, h < 2^32), so plain % is the pmod. */
  def minhash(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // k nulls
    val (as, bs) = seeds(k)
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % 4294967296L
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sign-sum SimHash over per-token md5-prefix hashes: bit i of the
    * result is set iff more token hashes have bit i set than clear. */
  def simhash32(s: UTF8String): Long = {
    val ls = s.toLowerCase
    val bytes = ls.getBytes
    val nb = bytes.length
    val counts = new Array[Int](32)
    val md = digest.get()
    var i = 0
    var tokStart = -1
    while (i <= nb) {
      val b: Byte = if (i == nb) ' ' else bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
      if (ws) {
        if (tokStart >= 0) {
          md.reset()
          md.update(bytes, tokStart, i - tokStart)
          val d = md.digest()
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var bit = 0
          while (bit < 32) {
            if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 32) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Called from generated code: one scan for token boundaries over the
    * LOWERCASED bytes, then one md5 per n-token window over a single
    * reused buffer. */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    // Unicode lowercase exactly as Spark's lower() (UTF8String.toLowerCase);
    // whitespace bytes (ASCII \s set) never occur inside multi-byte UTF-8
    // sequences, so byte-run tokenization is unicode-safe
    val ls = s.toLowerCase
    val bytes = ls.getBytes
    val nb = bytes.length
    // token boundaries
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    var tokStart = -1
    while (i <= nb) {
      val b: Byte = if (i == nb) ' ' else bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
      if (ws) {
        if (tokStart >= 0) {
          if (nTok == starts.length) {
            starts = java.util.Arrays.copyOf(starts, nTok * 2)
            ends = java.util.Arrays.copyOf(ends, nTok * 2)
          }
          starts(nTok) = tokStart; ends(nTok) = i; nTok += 1
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (nTok < n) return new GenericArrayData(Array.empty[Long])
    val md = digest.get()
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(bytes, starts(w + j), ends(w + j) - starts(w + j))
        j += 1
      }
      val d = md.digest()
      // first 8 hex chars == top 4 digest bytes, unsigned
      out(w) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      w += 1
    }
    new GenericArrayData(out)
  }
}
