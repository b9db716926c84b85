package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native sorted-set intersection cardinality:
  * `graft_inter_sorted(a, b)` over two ASCENDING-sorted (binary/UTF8
  * order, i.e. `sort_array` order) `array<string>` with distinct
  * elements → `bigint` |a ∩ b|.
  *
  * Semantics equal `size(array_intersect(a, b))` for distinct-element
  * inputs — intersection cardinality does not depend on element order —
  * so swapping it under a verify stage changes no oracle. The SORTED
  * precondition is the caller's contract (the set-similarity verify sorts
  * each document's distinct tokens once at build time); unsorted input
  * undercounts, it never crashes. Null elements never match (skipped).
  *
  * Why native: `array_intersect` builds a hash set of one side PER ROW
  * (allocation + hashing of every element), and the PPJoin verify runs it
  * once per surviving candidate pair — the hot loop of the exact
  * set-similarity join. A merge walk over the two sorted `ArrayData`
  * backings does the same count with zero allocation and pure
  * `UTF8String.compareTo` (byte-wise) compares, and `doGenCode` keeps it
  * inside the surrounding WholeStageCodegen span (same extension-ladder
  * placement as [[ArrayDot]]).
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_inter_sorted"

  private def isStringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isStringArray(left.dataType) || !isStringArray(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_inter_sorted expects two ARRAY<STRING>, got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.interSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (l, r) => s"${ev.value} = graft.functions.SortedIntersectCount.interSorted($l, $r);"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Merge-walk intersection count over two ascending-sorted string
    * arrays. Null elements are skipped (never equal to anything) — they
    * cannot occur under the engine's tokenizers, but the kernel must be
    * total.
    */
  def interSorted(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }
}
