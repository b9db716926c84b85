package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native dot product: `graft_dot(a, b)` over two numeric arrays
  * (`array<int|bigint|float|double>`, element types may differ per side)
  * → `double`, accumulated left-to-right in double precision.
  *
  * Semantics are BIT-IDENTICAL to the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, +)`):
  * each product is one correctly-rounded double multiply of cast elements
  * (float→double exact widening, int/bigint→double the same IEEE rounding
  * as Spark's `Cast`), folded strictly left to right from 0.0 — so every
  * oracle and every recorded hash is unchanged (parity asserted in
  * ArrayDotSpec). A length mismatch or a null element yields NULL, exactly
  * as zip_with's null padding poisons the HOF fold.
  *
  * Why native: Spark's higher-order array functions are CodegenFallback —
  * every similarity evaluation allocates a zipped intermediate array and
  * walks it through interpreted lambdas. The pair-join hot paths
  * (brute-force/LSH/IVF ranking, semantic dedup) evaluate the dot once per
  * CANDIDATE PAIR, so the per-call allocation multiplies by Σ bucket².
  * This expression is a straight primitive loop over the two `ArrayData`
  * backings with zero allocation, and `doGenCode` keeps it inside the
  * surrounding WholeStageCodegen span (same extension-ladder placement as
  * [[OccurrenceCounts]]: built-ins first, native Expression where the
  * built-in form measurably wastes, a UDF never).
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Can return NULL from non-null inputs (length mismatch / null element),
  // so the default `left.nullable || right.nullable` is a contract violation:
  // with non-nullable children codegen would emit a constant-false isNull
  // slot that `${ev.isNull} = true` then can't assign (silent interpreted
  // fallback), and NullPropagation could fold IsNull(graft_dot(..)) to false.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (ArrayDot.elemType(left.dataType).isEmpty || ArrayDot.elemType(right.dataType).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        "graft_dot expects two ARRAY<numeric> (int, bigint, float or double), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val getL = ArrayDot.getter(left.dataType)
  @transient private lazy val getR = ArrayDot.getter(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (!ArrayDot.aligned(x, y)) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += getL(x, i) * getR(y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ltpe = ArrayDot.elemType(left.dataType).get
    val rtpe = ArrayDot.elemType(right.dataType).get
    nullSafeCodeGen(
      ctx,
      ev,
      (l, r) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
        if (graft.functions.ArrayDot.aligned($l, $r)) {
          int $n = $l.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += (double) ${CodeGenerator.getValue(l, ltpe, i)}
                  * (double) ${CodeGenerator.getValue(r, rtpe, i)};
          }
          ${ev.value} = $acc;
        } else {
          ${ev.isNull} = true;
        }"""
      }
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Integer twin of [[ArrayDot]]: `graft_dotl(a, b)` → `bigint`, the exact
  * long fold `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, +)` over two
  * `array<bigint>` — the int8-code ranking loop
  * ([[graft.ext.Similarity.int8TopK]]), where all arithmetic stays in
  * (wrapping) long exactly like the built-in fold.
  */
case class ArrayDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  // NULL on misaligned inputs regardless of child nullability — see ArrayDot.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dotl"

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArray(left.dataType) || !isLongArray(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_dotl expects two ARRAY<BIGINT>, got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (ArrayDot.aligned(x, y)) ArrayDot.dotl(x, y) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (l, r) => s"""
        if (graft.functions.ArrayDot.aligned($l, $r)) {
          ${ev.value} = graft.functions.ArrayDot.dotl($l, $r);
        } else {
          ${ev.isNull} = true;
        }"""
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object ArrayDot {

  /** The supported element type of an `ARRAY<numeric>` input, if any. */
  private[functions] def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (IntegerType | LongType | FloatType | DoubleType), _) => Some(et)
    case _                                                                    => None
  }

  /** Element-as-double accessor for the interpreted (non-codegen) path. */
  private[functions] def getter(dt: DataType): (ArrayData, Int) => Double =
    dt match {
      case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
      case ArrayType(LongType, _)    => (a, i) => a.getLong(i).toDouble
      case ArrayType(FloatType, _)   => (a, i) => a.getFloat(i).toDouble
      case _                         => (a, i) => a.getDouble(i)
    }

  /** Equal lengths and no null elements — the cases where the HOF fold
    * would produce a non-null result. (zip_with pads the shorter side with
    * nulls and a null product poisons `acc + v` permanently, so any
    * mismatch or null element means the fold ends null.)
    */
  def aligned(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Long fold `acc += a_i * b_i` from 0L — [[ArrayDotLong]]'s kernel. */
  def dotl(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}
