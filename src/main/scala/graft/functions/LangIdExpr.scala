package graft.functions

import graft.pipeline.TextOps
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-token language scores as ONE byte-scan per row — a native
  * Catalyst expression replacing the relational form (lower → trim → split
  * → filter → 4 × size(filter)), which materializes a token ARRAY per row
  * and walks it five times. Semantics are byte-identical to the relational
  * form (and the DuckDB oracle): tokens are maximal runs between ASCII
  * regex-`\s` bytes of the lowercased text; a token counts for a language
  * when it equals one of its marker words ([[TextOps.langMarkers]]).
  * Markers are ≤3 ASCII letters, so each candidate token packs into one
  * int compared against a sorted key table — zero allocation per token,
  * no regex, no array. Stays inside whole-stage codegen via a static
  * helper call. */
case class LangMarkerScores(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    TextOps.langOrder.map(l => StructField(s"s_$l", LongType, nullable = false)))
  override def prettyName: String = "graft_lang_scores"
  override protected def withNewChildInternal(newChild: Expression): LangMarkerScores =
    copy(child = newChild)
  override def nullSafeEval(input: Any): Any =
    GraftLangId.scores(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftLangId.scores($c)")
}

object GraftLangId {
  private val nLangs = TextOps.langOrder.length
  // marker word (≤3 ASCII bytes) → packed int key, parallel-sorted with its
  // language index — lookup is an allocation-free binary search
  private val (sortedKeys: Array[Int], keyLang: Array[Int]) = {
    val pairs = TextOps.langOrder.zipWithIndex.flatMap { case (l, li) =>
      TextOps.langMarkers(l).map { m =>
        require(m.length <= 3 && m.forall(c => c >= 'a' && c <= 'z'),
          s"marker $m not a short ASCII word")
        val key = m.getBytes("US-ASCII").foldLeft(0)((k, b) => (k << 8) | (b & 0xff))
        (key, li)
      }
    }.sortBy(_._1)
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }
  private val maxMarkerLen = 3

  /** One pass over the string's bytes; called from generated code. */
  def scores(s: UTF8String): InternalRow = {
    val counts = new Array[Long](nLangs)
    val n = s.numBytes()
    var i = 0
    var tokLen = 0
    var key = 0
    while (i <= n) {
      val b: Byte = if (i == n) ' ' else s.getByte(i)
      // ASCII regex-\s set: space \t \n \x0B \f \r
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
      if (ws) {
        if (tokLen > 0 && tokLen <= maxMarkerLen) {
          val at = java.util.Arrays.binarySearch(sortedKeys, key)
          if (at >= 0) counts(keyLang(at)) += 1L
        }
        tokLen = 0
        key = 0
      } else {
        if (tokLen < maxMarkerLen) {
          // ASCII lowercase; non-letter bytes simply never match a marker key
          val lb = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          key = (key << 8) | (lb & 0xff)
        } else key = -1 // longer than any marker: poison the key
        tokLen += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](counts(0), counts(1), counts(2), counts(3)))
  }
}
