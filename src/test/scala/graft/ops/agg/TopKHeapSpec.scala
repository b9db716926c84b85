package graft.ops.agg

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The integer top-k heap: greatest-(value, id) total order, bounded
  * buffer, and — since round 17 — the same SET semantics on exact
  * duplicates as [[TopKHeapSim]]: the ADC rankers feed this heap off a
  * persisted-index join, where a twice-stored row (an at-least-once
  * foreachBatch retry re-appending a batch) surfaces the same candidate
  * with a bit-identical distance; without the skip it would occupy two
  * of the k slots.
  */
class TopKHeapSpec extends SparkSpecBase {
  import spark.implicits._

  private def heap(k: Int) = new TopKHeap(k)

  test("orders by value desc with DESCENDING-id ties; bounded at k") {
    val h = heap(3)
    val in = Seq((5L, 7L), (9L, 2L), (9L, 3L), (7L, 4L), (1L, 9L))
    val out = h.finish(in.foldLeft(h.zero)(h.reduce))
    // natural tuple order: equal values break to the GREATER id first
    assert(out == Seq((9L, 3L), (9L, 2L), (7L, 4L)))
  }

  test("exact duplicates are held once — including at a full buffer") {
    val h = heap(2)
    // duplicate of the weakest held entry while full: lteq(head) rejects
    val b1 = Seq((9L, 1L), (5L, 2L), (5L, 2L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(b1) == Seq((9L, 1L), (5L, 2L)))
    // duplicate of a held NON-head entry while full: must not evict the
    // weakest (the displaced-nothing rule)
    val b2 = Seq((5L, 2L), (9L, 1L), (9L, 1L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(b2) == Seq((9L, 1L), (5L, 2L)))
    // duplicate below the cutoff is rejected like any weak element
    val b3 = Seq((9L, 1L), (8L, 2L), (5L, 3L), (5L, 3L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(b3) == Seq((9L, 1L), (8L, 2L)))
    // duplicates while NOT full are held once too
    val b4 = Seq((9L, 1L), (9L, 1L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(b4) == Seq((9L, 1L)))
  }

  test("merge dedupes across partials and keeps the global best k") {
    val h = heap(3)
    val a = Seq((9L, 1L), (7L, 4L)).foldLeft(h.zero)(h.reduce)
    val b = Seq((9L, 1L), (8L, 2L), (6L, 5L)).foldLeft(h.zero)(h.reduce)
    assert(h.finish(h.merge(a, b)) == Seq((9L, 1L), (8L, 2L), (7L, 4L)))
  }

  test("a twice-stored index row cannot corrupt ADC top-k (the retry/overlap shape)") {
    // the exact failure ADVICE r16 flagged: a candidate row appended twice
    // carries the same codes ⇒ same adc ⇒ a bit-identical (−adc, −id)
    // pair; the window+dropDuplicates oracle keeps the true 3rd candidate
    val rows = Seq(
      (1L, 10L, 100L), (1L, 10L, 100L), // duplicated stored row
      (1L, 11L, 200L), (1L, 12L, 300L), (1L, 13L, 400L)
    ).toDF("query_id", "cand_id", "adc")
    val heaped = rows
      .groupBy($"query_id")
      .agg(TopKHeap.column(3)(-$"adc", -$"cand_id").as("top"))
      .select($"query_id", posexplode($"top"))
      .select($"query_id", (-$"col._2").as("cand_id"), ($"pos" + 1).as("rank"), (-$"col._1").as("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted.toSeq
    assert(heaped == Seq((1L, 10L, 1, 100L), (1L, 11L, 2, 200L), (1L, 12L, 3, 300L)),
      s"duplicate stored row corrupted the ranking: $heaped")
  }

  test("seeded randomized parity: heap == window+dropDuplicates across ties and duplicates") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"grp").orderBy($"v".desc, $"id".desc)
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      // value is a FUNCTION of (grp, id): duplicates carry identical
      // values, the set-semantics precondition (same as TopKHeapSim)
      val base = (0 until 150).map { _ =>
        val g = rnd.nextInt(4).toLong
        val id = rnd.nextInt(30).toLong
        (g, id, (g * 11 + id * 17) % 7)
      }.distinct
      val dups = base.filter(_ => rnd.nextBoolean())
      val k = 1 + rnd.nextInt(5)
      val rows = (base ++ dups).toDF("grp", "id", "v")
      val heaped = rows
        .groupBy($"grp")
        .agg(TopKHeap.column(k)($"v", $"id").as("top"))
        .select($"grp", posexplode($"top"))
        .select($"grp", $"col._2".as("id"), ($"pos" + 1).as("rank"), $"col._1".as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted.toSeq
      val windowed = rows
        .dropDuplicates(Seq("grp", "id"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
        .select($"grp", $"id", $"rank", $"v")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).sorted.toSeq
      assert(heaped == windowed, s"seed $seed k=$k diverged")
    }
  }
}
