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
    */
  def asofJoinStream(
      tagged: Dataset[AsofIn],
      watermarkDelay: String = "1 hour"
  ): Dataset[AsofOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import tagged.sparkSession.implicits._

    def flush(
        key: Long,
        rows: Iterator[AsofIn],
        state: GroupState[AsofState]
    ): Iterator[AsofOut] = {
      val prior = state.getOption.getOrElse(AsofState(None, None, None, Nil))
      val incoming = rows.map(r => (micros(r.ts), r.side, r.tie, r.payload)).toSeq
      val all = (prior.buffer ++ incoming).sortBy(r => (r._1, r._2, r._3))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (ready, pending) = all.partition(_._1 <= wmUs)
      var (lastUs, lastTie, lastPay) = (prior.lastUs, prior.lastTie, prior.lastPayload)
      val out = Seq.newBuilder[AsofOut]
      ready.foreach { case (us, side, tie, pay) =>
        if (side == 0) { lastUs = Some(us); lastTie = Some(tie); lastPay = Some(pay) }
        else out += AsofOut(key, tie, us, lastUs, lastPay)
      }
      if (pending.isEmpty && lastUs.isEmpty) state.remove()
      else {
        state.update(AsofState(lastUs, lastTie, lastPay, pending))
        if (pending.nonEmpty)
          // fire when the watermark passes the earliest unfinalized row
          // (never at-or-before the current watermark — Spark rejects that)
          state.setTimeoutTimestamp(math.max(pending.head._1 / 1000L, state.getCurrentWatermarkMs() + 1L))
        // register-only state (no pending): nothing left to emit, so the
        // state can linger until the query ends — no timeout needed
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
