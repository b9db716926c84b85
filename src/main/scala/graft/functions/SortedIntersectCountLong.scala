package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_inter_sorted_l(array<bigint>, array<bigint>)` → intersection
  * cardinality of two ascending-sorted long arrays — the integer-key twin
  * of [[SortedIntersectCount]] (see its scaladoc for the merge-walk
  * rationale and the SORTED caller contract).
  *
  * A separate expression (and a separate static method) on purpose, not a
  * type dispatch inside the string kernel:
  *
  *   - integer keys (vertex ids, doc ids) compare with one `<` instead of
  *     a byte-wise UTF8 walk, and skip the id→string cast entirely;
  *   - the JVM profiles each static method independently. The string
  *     kernel's hot-loop profile comes from the set-similarity verify
  *     (long gram arrays); sharing one method made the triangle count's
  *     id-array walk run under that polluted profile — measured 2.9 s →
  *     5.2 s whenever dedup_containment shared the JVM. Distinct methods
  *     keep the profiles clean by construction.
  */
case class SortedIntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_inter_sorted_l"

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArray(left.dataType) || !isLongArray(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_inter_sorted_l expects two ARRAY<BIGINT>, got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountLong.interSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (l, r) => s"${ev.value} = graft.functions.SortedIntersectCountLong.interSorted($l, $r);"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object SortedIntersectCountLong {

  /** Merge-walk intersection count over two ascending-sorted long arrays.
    * Null elements are skipped (never equal to anything) — the callers'
    * builders never produce them, but the kernel must be total.
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
        val a = x.getLong(i)
        val b = y.getLong(j)
        if (a < b) i += 1
        else if (a > b) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    c
  }
}
