package graft.ops.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The exact integer co-moment pyramid as ONE bounded-buffer typed
  * [[Aggregator]]: per input vector (already milli-quantized longs) it
  * accumulates `n`, the d coordinate sums, and the d(d+1)/2
  * upper-triangle pair-product sums in a single flat long buffer —
  * the whole covariance sufficient statistic.
  *
  * Why not the HOF form ([[graft.ext.EmbAlgebra.covarianceHof]], kept as
  * the executable exactness contract): building d(d+1)/2 structs per row
  * and exploding them materializes n·2080 rows through a hash aggregate —
  * at sf0.1 that is 4.2M generated rows for 2000 vectors, and the explode
  * + per-row group lookup dominates the actual multiply-adds. This buffer
  * does the same multiplies in one tight primitive loop per row, merges
  * partials like any aggregate (the exchange carries ONE ~17 KB buffer
  * per partition), and is order-free by construction (integer sums), so
  * the output is bit-identical to the HOF form — parity is spec-pinned.
  *
  * Buffer layout: `[n, sx_0..sx_{d-1}, sxy_0..sxy_{P-1}]` with the pair
  * index row-major over i ≤ j: `idx(i,j) = i·d − i(i−1)/2 + (j−i)`.
  *
  * Null handling mirrors the HOF form: a null vector contributes nothing
  * (the HOF's built pair array is null, so its explode emits no rows). A
  * non-null vector of the WRONG length fails loudly — the HOF form would
  * silently null-pad, which is a malformed-input bug, not a semantics.
  */
final class CoMomentPyramid(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(dim >= 1, "dim must be positive")
  private val pairs = dim * (dim + 1) / 2
  private val len = 1 + dim + pairs

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(buf: Array[Long], in: Seq[Long]): Array[Long] = {
    if (in == null) return buf
    val a: Array[Long] = in match {
      case s: scala.collection.immutable.ArraySeq.ofLong => s.unsafeArray
      case s => s.toArray
    }
    require(a.length == dim, s"co-moment input length ${a.length} != dim $dim")
    buf(0) += 1L
    var i = 0
    var p = 1 + dim
    while (i < dim) {
      val xi = a(i)
      buf(1 + i) += xi
      var j = i
      while (j < dim) {
        buf(p) += xi * a(j)
        p += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CoMomentPyramid {

  /** Untyped column form over an `array<bigint>` vector column. */
  def column(dim: Int)(qVec: Column): Column =
    udaf(new CoMomentPyramid(dim)).apply(qVec)

  /** The (i, j) pair coordinates for each flat pyramid index, row-major
    * over i ≤ j — shipped as plan literals to unflatten the finished
    * buffer back to one row per dimension pair.
    */
  def pairCoords(dim: Int): (Seq[Int], Seq[Int]) = {
    val is = Seq.newBuilder[Int]
    val js = Seq.newBuilder[Int]
    for (i <- 0 until dim; j <- i until dim) { is += i; js += j }
    (is.result(), js.result())
  }
}
