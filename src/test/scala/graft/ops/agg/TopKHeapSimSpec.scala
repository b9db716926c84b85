package graft.ops.agg

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The similarity top-k heap: (sim DESC, id ASC) total order, bounded
  * buffer, and SET semantics on exact duplicates — the contract that
  * lets multi-probe LSH skip its candidate-grain dropDuplicates
  * exchange entirely.
  */
class TopKHeapSimSpec extends SparkSpecBase {
  import spark.implicits._

  private def heap(k: Int) = new TopKHeapSim(k)

  test("orders by sim desc with ascending-id ties; bounded at k") {
    val h = heap(3)
    val in = Seq((0.5, 7L), (0.9, 2L), (0.5, 3L), (0.1, 9L), (0.9, 1L))
    val out = h.finish(in.foldLeft(h.zero)(h.reduce))
    assert(out == Seq((0.9, 1L), (0.9, 2L), (0.5, 3L)))
  }

  test("exact duplicates are held once — including at a full buffer") {
    val h = heap(2)
    // duplicate of the WEAKEST held entry while full
    val b1 = Seq((0.9, 1L), (0.5, 2L), (0.5, 2L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(b1) == Seq((0.9, 1L), (0.5, 2L)))
    // duplicate of a held NON-head entry while full: must not evict the
    // weakest (the displaced-nothing rule)
    val b2 = Seq((0.5, 2L), (0.9, 1L), (0.9, 1L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(b2) == Seq((0.9, 1L), (0.5, 2L)))
    // duplicate below the cutoff is rejected like any weak element
    val b3 = Seq((0.9, 1L), (0.8, 2L), (0.5, 3L), (0.5, 3L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(b3) == Seq((0.9, 1L), (0.8, 2L)))
  }

  test("merge dedupes across partials and keeps the global best k") {
    val h = heap(3)
    val a = Seq((0.9, 1L), (0.7, 4L)).foldLeft(h.zero)(h.reduce)
    val b = Seq((0.9, 1L), (0.8, 2L), (0.6, 5L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(h.merge(a, b)) == Seq((0.9, 1L), (0.8, 2L), (0.7, 4L)))
  }

  test("NaN ranks above every real sim — the Spark window NaN order") {
    val h = heap(2)
    val out = h.finish(Seq((0.9, 1L), (Double.NaN, 7L), (0.99, 2L)).foldLeft(h.zero)(h.reduce))
    assert(out.head._2 == 7L && out(1) == (0.99, 2L))
  }

  test("seeded randomized parity: heap == window+dropDuplicates across ties and duplicates") {
    // the heap now carries every ANN ranker; this drives it through 20
    // seeded random frames dense with exact ties (sims drawn from a
    // 5-value grid) and duplicated rows (the multi-probe shape), and
    // demands EXACT agreement with the window formulation it replaced
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"cand_id".asc)
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      // sim is a FUNCTION of (q, c): duplicates in production carry
      // bit-identical sims (same vectors, same expression), so the
      // generator must never give one pair two different scores
      val base = (0 until 200).map { _ =>
        val q = rnd.nextInt(5).toLong
        val c = rnd.nextInt(40).toLong
        (q, c, ((q * 7 + c * 13) % 5) * 0.2)
      }.distinct
      val dups = base.filter(_ => rnd.nextBoolean())
      val k = 1 + rnd.nextInt(6)
      val rows = (base ++ dups).toDF("query_id", "cand_id", "sim")
      val heaped = rows
        .groupBy($"query_id")
        .agg(TopKHeapSim.column(k)($"sim", $"cand_id").as("top"))
        .select($"query_id", posexplode($"top"))
        .select($"query_id", $"col._2".as("cand_id"), ($"pos" + 1).as("rank"), $"col._1".as("sim"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).sorted.toSeq
      val windowed = rows
        .dropDuplicates(Seq("query_id", "cand_id"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getDouble(2))).sorted.toSeq
      assert(heaped == windowed, s"seed $seed k=$k diverged")
    }
  }

  test("NON-identical duplicate scores for one id are DISTINCT entries — the call-site precondition") {
    // the set-semantics contract ONLY dedupes bit-identical (sim, id)
    // pairs: production duplicates are the same scored pair re-surfaced
    // through another LSH bucket, so their sims are bit-equal by
    // construction. A ranker that feeds the SAME candidate with two
    // DIFFERENT scores violates that precondition — the heap then holds
    // the id twice (documented in TopKHeapSim's scaladoc). This pin makes
    // the behavior explicit so a future ranker can't assume the heap
    // silently max-reduces per id.
    val h = heap(3)
    val out = h.finish(Seq((0.9, 10L), (0.8, 10L), (0.5, 11L)).foldLeft(h.zero)(h.reduce))
    assert(out == Seq((0.9, 10L), (0.8, 10L), (0.5, 11L)),
      s"non-identical duplicate must occupy two slots (precondition, not dedupe): $out")
  }

  test("column form matches the window formulation on duplicated candidates") {
    // the LSH shape: the same (query, cand, sim) row surfaces through
    // several buckets; window-after-dropDuplicates and the set-heap must
    // agree exactly
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.8),
      (1L, 12L, 0.8), (1L, 13L, 0.1), (2L, 10L, 0.5), (2L, 11L, 0.5)
    ).toDF("query_id", "cand_id", "sim")
    val heaped = rows
      .groupBy($"query_id")
      .agg(TopKHeapSim.column(2)($"sim", $"cand_id").as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", $"col._2".as("cand_id"), ($"pos" + 1).as("rank"), $"col._1".as("sim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"cand_id".asc)
    val windowed = rows
      .dropDuplicates(Seq("query_id", "cand_id"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 2)
      .select($"query_id", $"cand_id", $"rank", $"sim")
    val hs = heaped.orderBy($"query_id", $"rank").collect().toSeq
    val ws = windowed.orderBy($"query_id", $"rank").collect().toSeq
    assert(hs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))) ==
      ws.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))))
  }
}
