package graft.ops.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group top-k as a BOUNDED-HEAP typed [[Aggregator]] — the scale
  * path for "k best rows per group": the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`) sorts
  * EVERY group's full row set inside the shuffle, so a hot group pays
  * n·log n for k survivors. This buffer never holds more than k
  * entries per group (TakeOrdered's per-partition heap, applied
  * per group), merges map-side partials like any hash aggregate, and
  * is insertion-order-free by construction.
  *
  * Ordering: greatest `(value, id)` pairs win; the id tiebreak makes
  * the selection total, so the result is deterministic under any
  * partitioning — an engine-reproducibility requirement, not a nicety.
  * Output is the DESCENDING-sorted array of (value, id) structs;
  * explode + positional ordinal downstream when rows are wanted.
  *
  * The k bound rides instance state (one instance per query plan) —
  * the model-parameter-in-the-plan discipline, like the Bloom mask.
  *
  * SET semantics, same contract as [[TopKHeapSim]]: an element EXACTLY
  * equal to one already held (same value, same id) is skipped. The ADC
  * rankers feed this heap off a persisted-index join — a candidate row
  * stored twice (an at-least-once `foreachBatch` retry re-appending a
  * batch, an overlapping append) carries the same codes, hence the same
  * integer distance, hence a bit-identical (value, id) pair; without the
  * skip it would occupy two of the k slots and silently corrupt top-k vs
  * the dedupe+window oracle. Same correctness argument as TopKHeapSim:
  * the weakest-held entry only strengthens, so a duplicate of anything
  * evicted/never-admitted fails the ordinary admission compare, and a
  * duplicate of a held entry hits the equality check; distinct
  * candidates always differ in id, so no real pair is conflated.
  */
final class TopKHeap(k: Int) extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")

  // buffer = ASCENDING-sorted list of the current best ≤k (value, id)
  // pairs; head is the weakest entry, so admission is one compare
  override def zero: List[(Long, Long)] = Nil

  private def admit(buf: List[(Long, Long)], e: (Long, Long)): List[(Long, Long)] =
    if (buf.lengthCompare(k) < 0) insert(buf, e)
    else if (implicitly[Ordering[(Long, Long)]].lteq(e, buf.head)) buf
    else {
      // insert returns its argument UNCHANGED (same reference) when e is
      // an exact duplicate of a held entry — then the weakest must NOT
      // be evicted, the duplicate displaced nothing
      val ins = insert(buf.tail, e)
      if (ins eq buf.tail) buf else ins
    }

  private def insert(buf: List[(Long, Long)], e: (Long, Long)): List[(Long, Long)] = {
    val (lo, hi) = buf.span(implicitly[Ordering[(Long, Long)]].lt(_, e))
    // set semantics: an exact duplicate is the same candidate seen again
    // (a twice-stored index row) — hold it once
    if (hi.nonEmpty && hi.head == e) buf
    else lo ::: e :: hi
  }

  override def reduce(buf: List[(Long, Long)], in: (Long, Long)): List[(Long, Long)] =
    admit(buf, in)

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(admit)

  override def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf.reverse

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    Encoders.kryo[List[(Long, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKHeap {

  /** Untyped column form: `topK(k)(value, id)` → descending array of
    * `struct(_1 = value, _2 = id)`.
    */
  def column(k: Int)(value: Column, id: Column): Column =
    udaf(new TopKHeap(k)).apply(value, id)
}
