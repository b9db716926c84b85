package graft.ops.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** [[TopKHeap]] for SIMILARITY rankings: double-valued scores with an
  * ASCENDING id tiebreak — the `(sim DESC, cand_id ASC)` total order
  * every top-k ranker in [[graft.ext.Similarity]] uses. The window
  * formulation (`row_number() OVER (PARTITION BY query_id ORDER BY sim
  * DESC, cand_id)`) shuffles ALL scored pairs to rank k survivors —
  * linear in corpus size (the brute-force truth pass scores q×N pairs);
  * this buffer admits into a ≤k-element heap map-side and merges
  * partials, so the exchange carries at most q×k rows per partition
  * regardless of N.
  *
  * Ordering parity with the window it replaces: doubles compare by
  * `java.lang.Double.compare` (NaN greatest — Spark's SQL ordering
  * puts NaN above every other value too, so a degenerate zero-norm
  * candidate ranks identically in both formulations; −0.0 cannot
  * reach the heap — every sim here is a quotient of a +0.0-seeded
  * integer dot sum by a non-negative norm product). Equal sims break
  * to the SMALLEST id — the determinism contract of
  * [[graft.ext.Similarity.bruteForceTopK]].
  *
  * Output is the DESCENDING-sorted array of (sim, id) structs;
  * `posexplode` downstream yields the 1-based rank.
  *
  * SET semantics: an element EXACTLY equal to one already held (same
  * sim bits, same id) is skipped — multi-probe/multi-table LSH surfaces
  * the same candidate through several buckets with a bit-identical
  * score, and deduping inside the heap replaces the candidate-grain
  * `dropDuplicates` exchange (which shuffled full vector rows) with
  * nothing at all. Correctness of skip-on-equal at a full buffer: the
  * weakest-held entry only strengthens over time, so a duplicate of
  * anything ever evicted (or never admitted) compares ≤ the current
  * head and is rejected by the ordinary admission test; a duplicate of
  * a held entry hits the equality check. Distinct candidates always
  * differ in id, so no real pair is ever conflated.
  */
final class TopKHeapSim(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // greater = ranks higher: larger sim wins; equal sims -> smaller id wins
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  // buffer = ASCENDING-sorted list of the current best <=k entries;
  // head is the weakest, so admission is one compare
  override def zero: List[(Double, Long)] = Nil

  private def admit(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] =
    if (buf.lengthCompare(k) < 0) insert(buf, e)
    else if (ord.lteq(e, buf.head)) buf
    else {
      // insert returns its argument UNCHANGED (same reference) when e is
      // an exact duplicate of a held entry — then the weakest must NOT
      // be evicted, the duplicate displaced nothing
      val ins = insert(buf.tail, e)
      if (ins eq buf.tail) buf else ins
    }

  private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
    val (lo, hi) = buf.span(ord.lt(_, e))
    // set semantics: an exact duplicate (same sim bits, same id) is the
    // same candidate seen through another LSH bucket — hold it once
    if (hi.nonEmpty && ord.equiv(hi.head, e)) buf
    else lo ::: e :: hi
  }

  override def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    admit(buf, in)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(admit)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf.reverse

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKHeapSim {

  /** Untyped column form: `topK(k)(sim, id)` → array of
    * `struct(_1 = sim, _2 = id)` sorted by (sim DESC, id ASC).
    */
  def column(k: Int)(sim: Column, id: Column): Column =
    udaf(new TopKHeapSim(k)).apply(sim, id)
}
