package graft

/** Measured scale-growth audit for the super-linear-risk families: the
  * pair-generating queries (set-similarity join, banded LSH, triangle
  * census, image near-dup) are the ones whose naive forms go quadratic in
  * corpus size. Their candidate-cap / prefix-filter / bucketing contracts
  * are CLAIMED in their docs — this spec measures them: run each query up
  * the sf0.001 → sf0.01 → sf0.1 ladder and assert the 10×-data step costs
  * far less than the 100× a quadratic pair-generator would pay.
  *
  * The bound is deliberately loose (40× for 10× data ≈ exponent 1.6) so
  * host-load noise can't flake the board: the failure being guarded
  * against is a silent cap regression sending a family quadratic (100×+),
  * which clears 40× by a wide margin in both directions.
  */
class ScaleLadderSpec extends SparkSpecBase {

  private val ladder =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def runOnce(q: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  for (q <- Seq(
      "dedup_setsim_exact", "dedup_minhash_pairs", "graph_triangles", "mm_image_neardup",
      // frame-grain near-dup: the family whose uncapped form measured 93 MB
      // of pair-distinct at sf0.1 — the maxBucket quarantine is the
      // contract under audit here
      "mm_frame_index_probe",
      // whole-asset image probe: its UNCAPPED form measured QUADRATIC on
      // this ladder (10× corpus → 101× verified pairs, 6,646 → 672,452 at
      // sf0.01→0.1 — SCALING.md r19), which flipped the image persist to
      // the capped default (measured ~3× pairs per 10× data); this entry
      // keeps the flipped posture honest
      "mm_index_probe",
      // text-LSH incremental probe against the persisted bucketed index —
      // the third persisted family on the ladder: candidates are
      // Σ (incoming-in-bucket × stored-in-bucket), never a cartesian, and
      // the corpus side scans exchange-free (SCALING.md r20 numbers)
      "dedup_incremental_bucketed",
      // semantic (embedding-cell) incremental probe — the fourth family:
      // candidate volume is Σ per-cell cross products under the shared
      // cell quantizer; completes the all-four-families ladder coverage
      "dedup_semantic_incremental")) {
    test(s"$q: measured growth over sf0.001→0.01→0.1 stays sub-quadratic") {
      assume(ladder.forall(d => new java.io.File(d).isDirectory))
      // untimed pass at the smallest sf: JIT + codegen compile happen here,
      // not inside the ladder's first timed point
      runOnce(q, ladder.head)
      val times = ladder.map(d => d -> runOnce(q, d))
      // the meaningful decade is 0.01 → 0.1: at 0.001 fixed overhead
      // (session, planning, file open) dominates and under-states growth
      val t01 = math.max(times(1)._2, 0.05)
      val t1 = times(2)._2
      val ratio = t1 / t01
      info(times.map { case (d, s) => f"${d.split('/').last}: $s%.2fs" }.mkString("; ") +
        f" — 10x-data time ratio $ratio%.1fx")
      assert(
        ratio < 40.0,
        f"$q grew ${ratio}%.1fx over a 10x data step (quadratic would be ~100x) — " +
          "a candidate cap / prefix filter / bucket bound has regressed")
    }
  }
}
