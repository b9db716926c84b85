package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** MODEL-BASED lifecycle audit for the persisted Hamming index — the
  * round-19 semantics with the most moving parts (era-qualified
  * tombstones, the never-re-capped append, compaction's content dedup +
  * re-cap + era collapse + horizon-split tombstone retirement). A seeded
  * deterministic op script (appends, takedowns, capped and uncapped
  * compactions, duplicate re-appends, D-then-U reversals) runs against
  * BOTH the real index and a transparent in-memory reference model, and
  * after EVERY op the engine's probe must equal the model's exactly.
  * The single-op specs pin each contract in isolation; this pins their
  * COMPOSITION under interleavings nobody hand-wrote.
  */
class HammingLifecycleModelSpec extends SparkSpecBase {
  import spark.implicits._

  private val H = 6 // hamming verify threshold
  private def bandsOf(fp: Long): Seq[(Int, Long)] =
    (0 until 4).map(b => (b, (fp >> (b * 14)) & 16383L))
  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** The reference model: banded rows with logical eras, id-level
    * tombstones with logical eras, and the documented op semantics.
    */
  private class Model {
    // (band, bv, id, fp, era)
    var rows: Vector[(Int, Long, Long, Long, Long)] = Vector.empty
    var tombs: Map[Long, Long] = Map.empty
    var tombRows: Long = 0L // census grain: one stored row per (id, delete-call)
    private var clock = 0L
    private def tick(): Long = { clock += 1; clock }

    private def live = rows.filterNot { case (_, _, id, _, era) =>
      tombs.get(id).exists(era <= _)
    }

    def persist(corpus: Seq[(Long, Long)], cap: Int): Unit = {
      val banded = corpus.flatMap { case (id, fp) =>
        bandsOf(fp).map { case (b, bv) => (b, bv, id, fp, 0L) }
      }.toVector
      val census = banded.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
      rows =
        if (cap <= 0) banded
        else banded.filter(r => census((r._1, r._2)) <= cap)
      tombs = Map.empty
      tombRows = 0L
    }

    def append(batch: Seq[(Long, Long)]): Unit = {
      val era = tick()
      rows ++= batch.flatMap { case (id, fp) =>
        bandsOf(fp).map { case (b, bv) => (b, bv, id, fp, era) }
      }
    }

    def delete(ids: Seq[Long]): Unit = {
      val era = tick()
      ids.foreach(id => tombs += id -> era)
      tombRows += ids.size
    }

    /** The maintenance-census signals as [[Maintenance.indexCensus]]
      * derives them: STORED grain (not tombstone-filtered) for docs,
      * eras, and the capped regrowth signal; tombstone ROWS (one per
      * id per delete call) for the retraction-load signal.
      */
    def census(cap: Int): (Long, Long, Long, Long) = {
      val docs = rows.map(_._3).distinct.size.toLong
      val eras = rows.map(_._5).distinct.size.toLong
      val perBucket = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.size.toLong)
      val total = rows.size.toLong
      val capped = perBucket.values.filter(_ > cap).sum
      val ppm = if (total == 0) 0L else capped * 1000000L / total
      (docs, tombRows, eras, ppm)
    }

    def compact(cap: Int): Unit = {
      val horizon = tick()
      // content dedup keeping the highest era, over LIVE rows
      val healed = live
        .groupBy(r => (r._1, r._2, r._3, r._4))
        .map { case ((b, bv, id, fp), g) => (b, bv, id, fp, g.map(_._5).max) }
        .toVector
      val census = healed.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
      val kept =
        if (cap <= 0) healed else healed.filter(r => census((r._1, r._2)) <= cap)
      val maxEra = if (kept.isEmpty) 0L else kept.map(_._5).max
      rows = kept.map { case (b, bv, id, fp, _) => (b, bv, id, fp, maxEra) }
      // the horizon split: every tombstone in this sequential script
      // predates the compaction, so all retire
      tombs = tombs.filter { case (_, t) => t >= horizon }
      tombRows = 0L
    }

    def probe(incoming: Seq[(Long, Long)]): Seq[(Long, Long, Int)] = {
      val l = live
      (for {
        (pid, pfp) <- incoming
        (b, bv) <- bandsOf(pfp)
        (rb, rbv, cid, cfp, _) <- l
        if rb == b && rbv == bv && cid != pid && hamming(pfp, cfp) <= H
      } yield (pid, cid, hamming(pfp, cfp))).distinct.sorted
    }
  }

  test("random lifecycle interleavings: engine probe equals the reference model after every op") {
    val rnd = new scala.util.Random(20260816L)
    // a tiny fp space (low 10 bits) concentrates buckets HARD: band 0
    // carries the variation, bands 1-3 collapse to the all-zero bucket —
    // the boilerplate shape the cap semantics exist for
    def freshFp(): Long = rnd.nextInt(1024).toLong
    val corpus = (1L to 40L).map(id => id -> freshFp())
    val probes = (1000L to 1019L).map(id => id -> freshFp())
    val cap = 70 // bands 1-3's shared bucket starts over it, band 0's under

    val tbl = s"hamspec_model_${System.nanoTime()}"
    val model = new Model
    def asDf(rows: Seq[(Long, Long)]) = rows.toDF("id", "fp")

    Multimodal.persistHammingIndex(asDf(corpus), "id", "fp", tbl, buckets = 2, maxBucket = cap)
    model.persist(corpus, cap)

    def check(opName: String): Unit = {
      val got = Multimodal
        .probeHammingIndex(spark, tbl, asDf(probes), "id", "fp", maxHamming = H)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      val want = model.probe(probes)
      assert(got == want,
        s"engine/model divergence after $opName: engine ${got.size} pairs, model ${want.size}")
      // the POLICY's inputs must also agree under interleavings — these
      // are what indexMaintenancePlan decides from
      val c = Maintenance
        .indexCensus(spark, tbl, "corpus_id", "m", bucketKeys = Seq("band", "bv"), bucketCap = cap)
        .collect().head
      val gotCensus = (c.getAs[Long]("index_docs"), c.getAs[Long]("tomb_entries"),
        c.getAs[Long]("append_eras"), c.getAs[Long]("capped_ppm"))
      val wantCensus = model.census(cap)
      assert(gotCensus == wantCensus,
        s"census divergence after $opName: engine $gotCensus, model $wantCensus")
    }
    check("persist")

    var nextId = 100L
    var appended: Vector[(Long, Long)] = Vector.empty
    (1 to 14).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // append a fresh batch (possibly re-using a duplicate row)
          val fresh = (0 until 1 + rnd.nextInt(4)).map { _ =>
            nextId += 1; nextId -> freshFp()
          }
          // with probability, re-append an existing row VERBATIM (the
          // at-least-once duplicate the compaction content-dedup heals)
          val dup =
            if (appended.nonEmpty && rnd.nextBoolean()) Seq(appended(rnd.nextInt(appended.size)))
            else Nil
          val batch = fresh ++ dup
          appended ++= fresh
          Multimodal.appendHammingIndex(asDf(batch), "id", "fp", tbl, buckets = 2)
          model.append(batch)
          check(s"append#$step")
        case 1 => // take down a random known stratum (corpus or appended)
          val pool = corpus.map(_._1) ++ appended.map(_._1)
          val ids = (0 until 1 + rnd.nextInt(3)).map(_ => pool(rnd.nextInt(pool.size))).distinct
          Multimodal.deleteFromHammingIndex(spark, tbl, ids.toDF("id"), col("id"))
          model.delete(ids)
          check(s"delete#$step")
        case 2 => // D-then-U reversal: take down then immediately re-append
          if (appended.nonEmpty) {
            val victim = appended(rnd.nextInt(appended.size))
            Multimodal.deleteFromHammingIndex(spark, tbl, Seq(victim._1).toDF("id"), col("id"))
            model.delete(Seq(victim._1))
            Multimodal.appendHammingIndex(asDf(Seq(victim)), "id", "fp", tbl, buckets = 2)
            model.append(Seq(victim))
            check(s"reappend#$step")
          }
        case 3 => // compact, alternating capped / uncapped posture
          val c = if (rnd.nextBoolean()) cap else 0
          Multimodal.compactHammingIndex(spark, tbl, buckets = 2, maxBucket = c)
          model.compact(c)
          check(s"compact(cap=$c)#$step")
      }
    }
    // the script must have actually exercised the interesting state: some
    // pairs exist and at least one id is currently tombstoned or was
    // re-appended (guards against a vacuously-empty walk)
    assert(model.probe(probes).nonEmpty, "fixture too weak — no pairs at the end of the walk")
  }
}
