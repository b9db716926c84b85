package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native squared-L2 distance row: `graft_l2sq(cmat, vec)` over a nested
  * centroid matrix `array<array<bigint>>` and a quantized vector
  * `array<bigint>` → `array<bigint>` of per-centroid distances.
  *
  * Replaces the HOF formulation
  * `transform(cmat, c -> aggregate(zip_with(vec, c, (x, y) -> (x-y)*(x-y)), 0L, +))`
  * — the single hottest map-side loop in the ANN family: every corpus row
  * evaluates it for cell assignment (nlist × dim multiply-adds), every
  * k-means training iteration re-evaluates it corpus-wide, and PQ coding
  * runs it once per subspace. The HOF form allocates a zipped array per
  * CENTROID per row and walks interpreted lambdas (CodegenFallback); this
  * expression is a two-level primitive loop with exactly one result-array
  * allocation.
  *
  * Exactness contract (parity asserted in ArrayDistSpec): identical
  * wrapping-long arithmetic, and per-ENTRY nulls exactly where the HOF
  * fold nulls — a null centroid row, a length mismatch, or a null element
  * on either side yields a null entry (zip_with's padding poisons that
  * centroid's fold), never poisoning the siblings. Sole documented
  * divergence: a NULL `vec` yields NULL (strict-null BinaryExpression)
  * where the HOF yields an array of nulls — downstream `array_min` /
  * `array_position` produce NULL either way, so no query result differs.
  */
case class ArrayL2SqAll(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_l2sq"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "graft_l2sq expects (ARRAY<ARRAY<BIGINT>>, ARRAY<BIGINT>), " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDist.l2sqAll(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (l, r) => s"${ev.value} = graft.functions.ArrayDist.l2sqAll($l, $r);"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Native PQ asymmetric-distance sum: `graft_adc(tbl, codes)` over the
  * query's per-subspace distance table `array<array<bigint>>` and a
  * candidate's PQ codes `array<int|bigint>` → `bigint`:
  * `Σ_j tbl[j][codes[j]]`.
  *
  * Replaces the HOF formulation
  * `aggregate(zip_with(tbl, codes, (t, cd) -> element_at(t, cd + 1)), 0L, +)`
  * — evaluated once per CANDIDATE PAIR in PQ/IVFPQ ranking
  * ([[graft.ext.Similarity.pqAdcTopK]], `ivfPqTopK`,
  * `scoreAgainstAnnIndex`), so the zipped-array allocation multiplies by
  * the probed-cell population.
  *
  * Exactness contract (parity asserted in ArrayDistSpec): identical long
  * sum on the domain the PQ coder produces (codes in `[0, len(tbl_j))`);
  * NULL on length mismatch or a null table row / code element, exactly as
  * zip_with's padding poisons the fold. An out-of-range code throws (the
  * ANSI `element_at` in the HOF form also errors; the coder never emits
  * one — negative `element_at` from-the-end indexing is deliberately NOT
  * reproduced).
  */
case class ArrayAdcSum(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  // NULL on length mismatch / null entry regardless of child nullability —
  // same contract reasoning as ArrayDot.nullable.
  override def nullable: Boolean = true

  override def prettyName: String = "graft_adc"

  @transient private lazy val codeIsInt: Boolean = right.dataType match {
    case ArrayType(IntegerType, _) => true
    case _                         => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(LongType, _), _), ArrayType(IntegerType | LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "graft_adc expects (ARRAY<ARRAY<BIGINT>>, ARRAY<INT|BIGINT>), " +
            s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDist.adcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], codeIsInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isInt = codeIsInt
    nullSafeCodeGen(
      ctx,
      ev,
      (l, r) => s"""
        Long ${ev.value}Boxed = graft.functions.ArrayDist.adcSum($l, $r, $isInt);
        if (${ev.value}Boxed == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ev.value}Boxed.longValue();
        }"""
    )
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object ArrayDist {

  /** [[ArrayL2SqAll]]'s kernel: per-centroid wrapping-long Σ(v_i − c_i)²,
    * null entry where the HOF fold would null (null centroid row, length
    * mismatch, null element). Returns the compact primitive encoding when
    * no entry is null — the overwhelmingly common case.
    */
  def l2sqAll(cmat: ArrayData, vec: ArrayData): ArrayData = {
    val cells = cmat.numElements()
    val n = vec.numElements()
    var vecHasNull = false
    var i = 0
    while (i < n && !vecHasNull) {
      if (vec.isNullAt(i)) vecHasNull = true
      i += 1
    }
    val out = new Array[Long](cells)
    var nulls: Array[Boolean] = null
    var cell = 0
    while (cell < cells) {
      var entryNull = cmat.isNullAt(cell) || vecHasNull
      if (!entryNull) {
        val c = cmat.getArray(cell)
        if (c.numElements() != n) entryNull = true
        else {
          var acc = 0L
          var j = 0
          while (j < n && !entryNull) {
            if (c.isNullAt(j)) entryNull = true
            else {
              val d = vec.getLong(j) - c.getLong(j)
              acc += d * d
              j += 1
            }
          }
          if (!entryNull) out(cell) = acc
        }
      }
      if (entryNull) {
        if (nulls == null) nulls = new Array[Boolean](cells)
        nulls(cell) = true
      }
      cell += 1
    }
    if (nulls == null) UnsafeArrayData.fromPrimitiveArray(out)
    else {
      val boxed = new Array[Any](cells)
      var k = 0
      while (k < cells) {
        boxed(k) = if (nulls(k)) null else java.lang.Long.valueOf(out(k))
        k += 1
      }
      new GenericArrayData(boxed)
    }
  }

  /** [[ArrayAdcSum]]'s kernel: Σ_j tbl[j][codes[j]], null where the HOF
    * fold would null; throws on an out-of-range code (as ANSI element_at
    * does). `codeIsInt` selects the codes accessor statically.
    */
  def adcSum(tbl: ArrayData, codes: ArrayData, codeIsInt: Boolean): java.lang.Long = {
    val n = tbl.numElements()
    if (codes.numElements() != n) return null
    var acc = 0L
    var j = 0
    while (j < n) {
      if (tbl.isNullAt(j) || codes.isNullAt(j)) return null
      val t = tbl.getArray(j)
      val cd = if (codeIsInt) codes.getInt(j).toLong else codes.getLong(j)
      if (cd < 0 || cd >= t.numElements())
        throw new ArrayIndexOutOfBoundsException(
          s"graft_adc: code $cd out of range [0, ${t.numElements()}) in subspace $j")
      if (t.isNullAt(cd.toInt)) return null
      acc += t.getLong(cd.toInt)
      j += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
