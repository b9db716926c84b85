package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Segment-blocked fuzzy (edit-distance) record linkage. */
class FuzzyOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("editBlockedPairs: pigeonhole recall is complete for equal-length substitutions") {
    val df = Seq(
      (1L, "abcdefghi"),
      (2L, "abXdefghi"), // 1 sub vs 1
      (3L, "abXdefgYi"), // 2 subs vs 1, 1 sub vs 2
      (4L, "ZZZZZZZZZ") // far from everything
    ).toDF("id", "s")
    val out = FuzzyOps
      .editBlockedPairs(df, col("id"), col("s"), maxDist = 2, maxBlock = 64)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(out == Set((1L, 2L, 1), (1L, 3L, 2), (2L, 3L, 1)))
  }

  test("unequal-length indel pairs are missed — the documented blocking trade-off") {
    // a deletion re-grids every segment (9→3+3+3 vs 8→2+3+3), so no block
    // agrees even at distance 1: the scaladoc's substitution-domain scope
    // is a real limit, pinned here so it can't silently change
    val df = Seq((1L, "abcdefghi"), (2L, "abcdefgh")).toDF("id", "s")
    assert(
      FuzzyOps.editBlockedPairs(df, col("id"), col("s"), maxDist = 2, maxBlock = 64).count() == 0L)
  }

  test("oversizedBlocks reports quarantined blocks and editBlockedPairs excludes them") {
    // ten strings share segment 0 ("aaa"); with maxBlock=5 that block is
    // quarantined, and since their tails are pairwise-distant no pair
    // survives — the honesty contract: lost recall is REPORTED, not silent
    val decoys = (0 until 10).map(i => (100L + i, "aaa" + ("%06d".format(i * 111111))))
    val df = decoys.toDF("id", "s")
    val oversized = FuzzyOps
      .oversizedBlocks(df, col("id"), col("s"), maxDist = 2, maxBlock = 5)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(oversized.toSeq == Seq((0, "aaa", 10L)))
    val pairs = FuzzyOps.editBlockedPairs(df, col("id"), col("s"), maxDist = 2, maxBlock = 5)
    assert(pairs.count() == 0L)
  }

  test("a pair sharing several segments is emitted exactly once") {
    val df = Seq((1L, "abcdefghi"), (2L, "abcdefghX")).toDF("id", "s")
    val out = FuzzyOps.editBlockedPairs(df, col("id"), col("s"), maxDist = 2, maxBlock = 64)
    assert(out.count() == 1L)
  }

  test("blockingQuality measures the pigeonhole miss honestly") {
    // truth pairs at dist<=2: (1,2) substitution, (1,3) front insertion,
    // (2,3) insertion+substitution. Blocking catches only (1,2) — the
    // front insertion shifts every segment boundary of 3, so both pairs
    // involving it are the documented unequal-length miss
    val df = Seq(
      (1L, "abcdefghi"), (2L, "abcdefgXi"), (3L, "Zabcdefghi"), (4L, "qrstuvwxy")
    ).toDF("id", "s")
    val r = FuzzyOps
      .blockingQuality(df, col("id"), col("s"), maxDist = 2, maxBlock = 64, strataMod = 1L)
      .collect()(0)
    assert(
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((4L, 4L, 3L, 1L, 333333L)),
      s"got $r")
  }

  test("blockingQuality reports NULL completeness when the stratum has no true pairs") {
    val df = Seq((1L, "aaaaaaaaa"), (2L, "zzzzzzzzz")).toDF("id", "s")
    val r = FuzzyOps
      .blockingQuality(df, col("id"), col("s"), maxDist = 2, maxBlock = 64, strataMod = 1L)
      .collect()(0)
    assert(r.getLong(2) == 0L && r.isNullAt(4), s"0/0 must be NULL, not a rate: $r")
  }
}
