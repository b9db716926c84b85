package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming twins of the [[graft.ops.TemporalOps]] temporal-join family.
  *
  * Two shapes, two mechanisms:
  *
  *   - [[asofJoinStream]]: Structured Streaming has no native as-of join,
  *     so this is the explicit state machine — the batch operator's
  *     union-merge formulation driven through `flatMapGroupsWithState`
  *     with an event-time watermark. Per key, rows buffer until the
  *     watermark passes them; the processed prefix emits matches and
  *     carries ONE summary row (the latest right at-or-before the
  *     frontier) forward, so state is bounded by in-flight rows per key
  *     (the watermark delay), never by history.
  *
  *   - [[lookbackJoinStream]]: Spark DOES ship watermarked stream-stream
  *     interval joins, so the bounded-lookback join uses the native
  *     machinery — both sides watermarked, the horizon expressed as the
  *     time-range join condition that lets the engine evict right-side
  *     state past `leftTs - horizon`. This is the canonical "where
  *     watermark bugs hide" surface the parity harness exists to pin.
  */
object TemporalStream {

  /** One tagged input row for [[asofJoinStream]]: `side` 0 = right
    * (payload-bearing), 1 = left (probe). `tie` is the deterministic
    * tie-break id on BOTH sides (right: greatest tie wins an equal-ts
    * instant; left: output identity).
    */
  final case class AsofIn(
      key: Long,
      ts: java.sql.Timestamp,
      side: Int,
      tie: Long,
      payload: Double
  )

  /** Per-key carried state: the latest processed right row at-or-before
    * the watermark frontier (the merge's running-last register) plus the
    * not-yet-final buffered rows (us, side, tie, payload).
    */
  final case class AsofState(
      lastUs: Option[Long],
      lastTie: Option[Long],
      lastPayload: Option[Double],
      buffer: Seq[(Long, Int, Long, Double)]
  )

  /** One matched left row: null asof_* when no right row precedes it. */
  final case class AsofOut(
      key: Long,
      tie: Long,
      ts_us: Long,
      asof_us: Option[Long],
      asof_payload: Option[Double]
  )

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming point-in-time (as-of) left join over a pre-tagged union of
    * both sides — semantics identical to
    * [[graft.ops.TemporalOps.asofJoin]] (backward, inclusive, right ties
    * to the greatest tie id): every left row emits exactly once, matched
    * to the latest right row with `right.ts <= left.ts` on the same key.
    *
    * Mechanism: rows buffer per key until the event-time watermark passes
    * them (a row is FINAL once no earlier-timestamped row can still
    * arrive); each micro-batch processes the final prefix in
    * (ts, side, tie) order — rights advance the running-last register,
    * lefts emit against it — and re-arms an event-time timeout so the
    * next watermark advance flushes the remainder even if the key
    * receives no further data. Carried state is the register plus the
    * unfinalized buffer: bounded by the watermark delay, not history.
    *
    * State cardinality: with `registerTtlSec = 0` (the default, and what
    * the parity harness uses) a key's register-only state — the compacted
    * last-right summary with nothing left to emit — lingers until the
    * query ends, so total state grows with DISTINCT KEY COUNT. That is the
    * exact batch semantics (any future left still finds its backward
    * match), and is fine when key cardinality is bounded (users, devices,
    * parcels). A production deployment over an unbounded key space sets
    * `registerTtlSec > 0`: register-only state is DROPPED once the
    * watermark passes `lastRightTs + ttl`, trading exactly one thing — a
    * left row arriving more than `ttl` after its key's last right row
    * emits null instead of the stale match (the standard state-TTL trade,
    * e.g. Flink's state retention).
    */
  def asofJoinStream(
      tagged: Dataset[AsofIn],
      watermarkDelay: String = "1 hour",
      registerTtlSec: Long = 0L
  ): Dataset[AsofOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import tagged.sparkSession.implicits._
    require(registerTtlSec >= 0, "registerTtlSec must be >= 0 (0 = keep registers until query end)")
    val ttlUs = registerTtlSec * 1000000L

    def flush(
        key: Long,
        rows: Iterator[AsofIn],
        state: GroupState[AsofState]
    ): Iterator[AsofOut] = {
      val prior = state.getOption.getOrElse(AsofState(None, None, None, Nil))
      val incoming = rows.map(r => (micros(r.ts), r.side, r.tie, r.payload)).toSeq
      val all = (prior.buffer ++ incoming).sortBy(r => (r._1, r._2, r._3))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      // STRICT bound: the watermark contract only rules out data OLDER
      // than the watermark — rows AT it can still arrive (a same-instant
      // sibling split across micro-batches would otherwise finalize the
      // left row before its greatest-tie right sibling showed up)
      val (ready, pending) = all.partition(_._1 < wmUs)
      var (lastUs, lastTie, lastPay) = (prior.lastUs, prior.lastTie, prior.lastPayload)
      val out = Seq.newBuilder[AsofOut]
      ready.foreach { case (us, side, tie, pay) =>
        if (side == 0) { lastUs = Some(us); lastTie = Some(tie); lastPay = Some(pay) }
        else out += AsofOut(key, tie, us, lastUs, lastPay)
      }
      if (pending.isEmpty && lastUs.isEmpty) state.remove()
      else if (ttlUs > 0 && pending.isEmpty && lastUs.exists(_ + ttlUs < wmUs))
        // register TTL: nothing buffered and the watermark has passed the
        // last right + ttl — drop the key's state entirely (see scaladoc)
        state.remove()
      else {
        state.update(AsofState(lastUs, lastTie, lastPay, pending))
        if (pending.nonEmpty)
          // fire when the watermark passes the earliest unfinalized row
          // (never at-or-before the current watermark — Spark rejects that)
          state.setTimeoutTimestamp(math.max(pending.head._1 / 1000L, state.getCurrentWatermarkMs() + 1L))
        else if (ttlUs > 0)
          // register-only under a TTL: arm the eviction timeout so the key
          // is reaped on watermark advance even with no further data.
          // Armed one ms PAST the truncated expiry: the remove condition
          // is strict (lastUs + ttlUs < wmUs), and a timeout firing at
          // exactly floor((lastUs+ttlUs)/1000) ms has wmUs ≤ lastUs+ttlUs
          // — the condition is false, the key re-arms at wm+1, and if the
          // stream then quiesces the eviction never happens
          state.setTimeoutTimestamp(
            math.max((lastUs.get + ttlUs) / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
        // register-only with ttl = 0: nothing left to emit, state lingers
        // until the query ends — the documented bounded-key-space posture
      }
      out.result().iterator
    }

    tagged
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(flush)
  }

  /** Per-key carried state for [[nearestJoinStream]] — same shape as
    * [[AsofState]]: the compacted backward register (the latest right at
    * or before the retention cut) plus the retained rows.
    */
  final case class NearestState(
      lastUs: Option[Long],
      lastTie: Option[Long],
      lastPayload: Option[Double],
      buffer: Seq[(Long, Int, Long, Double)]
  )

  /** One matched left row from [[nearestJoinStream]]: `asof_dir` is 'B'
    * or 'F' (null when neither direction has a candidate).
    */
  final case class NearestOut(
      key: Long,
      tie: Long,
      ts_us: Long,
      asof_us: Option[Long],
      asof_dir: Option[String],
      asof_payload: Option[Double]
  )

  /** Streaming NEAREST-match as-of join — semantics of
    * [[graft.ops.TemporalOps.asofJoinNearest]] (closest right row in
    * absolute distance, equidistant ties resolve BACKWARD, same-instant
    * rights count for both directions at distance 0, right-timestamp ties
    * to the greatest tie id) with ONE addition the streaming form
    * requires: the forward wait is bounded by `horizonSec`. An unbounded
    * "wait for the next right row" never finalizes under event time —
    * a key could stay silent forever — so production nearest-joins always
    * bound the peek-ahead; a left row becomes FINAL (and emits) once the
    * watermark passes `left.ts + horizon`, by which point every forward
    * candidate in its horizon is itself final. Callers wanting batch
    * parity pick a horizon past the data's forward-match spread.
    *
    * State bound: retained rows are those within `horizon + watermark
    * delay` of the frontier; rights older than `watermark − horizon`
    * compact into the single backward register (a future left's backward
    * match at-or-before that cut can only be the LATEST such right,
    * because arriving rows are at-or-after the watermark).
    */
  def nearestJoinStream(
      tagged: Dataset[AsofIn],
      horizonSec: Long,
      watermarkDelay: String = "1 hour",
      registerTtlSec: Long = 0L
  ): Dataset[NearestOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import tagged.sparkSession.implicits._
    require(horizonSec > 0, "horizon must be positive")
    require(registerTtlSec >= 0, "registerTtlSec must be >= 0 (0 = keep registers until query end)")
    val hUs = horizonSec * 1000000L
    // same register-TTL contract as asofJoinStream (see its scaladoc)
    val ttlUs = registerTtlSec * 1000000L

    def flush(
        key: Long,
        rows: Iterator[AsofIn],
        state: GroupState[NearestState]
    ): Iterator[NearestOut] = {
      val prior = state.getOption.getOrElse(NearestState(None, None, None, Nil))
      val incoming = rows.map(r => (micros(r.ts), r.side, r.tie, r.payload)).toSeq
      val all = ((prior.buffer ++ incoming).sortBy(r => (r._1, r._2, r._3))).toIndexedSeq
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val cut = wmUs - hUs
      val rights = all.filter(_._2 == 0)
      // forward candidate: first right at-or-after ts (same-instant counts,
      // distance 0); among equal timestamps the GREATEST tie wins
      def forwardOf(ts: Long): Option[(Long, Long, Double)] = {
        val i = rights.indexWhere(_._1 >= ts)
        if (i < 0 || rights(i)._1 > ts + hUs) None
        else {
          val us = rights(i)._1
          val sameUs = rights.slice(i, rights.length).takeWhile(_._1 == us)
          val best = sameUs.maxBy(_._3)
          Some((best._1, best._3, best._4))
        }
      }
      var (lastUs, lastTie, lastPay) = (prior.lastUs, prior.lastTie, prior.lastPayload)
      var (cutUs, cutTie, cutPay) = (prior.lastUs, prior.lastTie, prior.lastPayload)
      val out = Seq.newBuilder[NearestOut]
      val keep = Seq.newBuilder[(Long, Int, Long, Double)]
      all.foreach { case row @ (us, side, tie, pay) =>
        if (side == 0) {
          lastUs = Some(us); lastTie = Some(tie); lastPay = Some(pay)
          if (us <= cut) { cutUs = Some(us); cutTie = Some(tie); cutPay = Some(pay) }
          else keep += row
        } else if (us + hUs < wmUs) {
          // STRICT bound, as in asofJoinStream: rows AT the watermark can
          // still arrive, so a left finalizes only once wm passes ts + H
          val f = forwardOf(us)
          val bd = lastUs.map(us - _)
          val fd = f.map(_._1 - us)
          val pickF = lastUs.isEmpty || (f.nonEmpty && fd.get < bd.get)
          out += (if (f.isEmpty && lastUs.isEmpty)
            NearestOut(key, tie, us, None, None, None)
          else if (pickF)
            NearestOut(key, tie, us, Some(f.get._1), Some("F"), Some(f.get._3))
          else
            NearestOut(key, tie, us, lastUs, Some("B"), lastPay))
        } else keep += row
      }
      val pending = keep.result()
      if (pending.isEmpty && cutUs.isEmpty) state.remove()
      else if (ttlUs > 0 && pending.isEmpty && lastUs.exists(_ + ttlUs < wmUs))
        state.remove()
      else {
        state.update(NearestState(cutUs, cutTie, cutPay, pending))
        val firstDue = pending.iterator.map {
          case (us, 1, _, _) => us + hUs
          case (us, _, _, _) => us
        }.minOption
        firstDue.foreach(d =>
          state.setTimeoutTimestamp(math.max(d / 1000L, state.getCurrentWatermarkMs() + 1L)))
        if (pending.isEmpty && ttlUs > 0)
          // +1 ms past the truncated expiry — same one-firing guarantee as
          // the as-of machine (the strict remove condition needs wmUs to
          // be STRICTLY past lastUs + ttlUs when the timeout fires)
          state.setTimeoutTimestamp(
            math.max((lastUs.get + ttlUs) / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }

    tagged
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(flush)
  }

  /** Streaming bounded-lookback interval join — the native watermarked
    * stream-stream inner join, semantics identical to
    * [[graft.ops.TemporalOps.lookbackJoin]]: pairs with
    * `rightTs in [leftTs - horizonSec, leftTs]` on equal keys.
    *
    * The time-range condition is what lets the engine bound state: right
    * rows evict once the left watermark passes `rightTs + horizon`, left
    * rows once matched candidates can no longer arrive. Column names must
    * be disjoint across the two inputs (the batch operator's contract).
    */
  def lookbackJoinStream(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      horizonSec: Long,
      watermarkDelay: String = "1 hour"
  ): DataFrame = {
    require(horizonSec > 0, "horizon must be positive")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right
      .withColumnRenamed(key, "__rk")
      .withWatermark(rightTs, watermarkDelay)
      .alias("r")
    val cond: Column =
      col(s"l.$key") === col(s"r.__rk") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL '$horizonSec' SECOND")
    l.join(r, cond, "inner").drop("__rk")
  }
}
