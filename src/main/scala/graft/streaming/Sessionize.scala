package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (north-star extension, SURVEY.md §7.5 — the
  * reference is strictly batch, §2.11). Both a batch formulation (window
  * functions, oracle-comparable) and the Structured Streaming formulation
  * (session_window / tumbling window + watermark) of the same semantics.
  */
object Sessionize {

  /** Batch sessionization: a session breaks when the gap to the previous
    * event of the same user exceeds `gapMinutes`. Session id = cumulative
    * count of breaks per user (1-based). One shuffle on user_id.
    */
  def sessionizeBatch(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      orderTiebreak: String,
      gapMinutes: Int
  ): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(orderTiebreak))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("__prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn(
        "__new_session",
        when(
          col("__prev_ts").isNull ||
            (unix_micros(col(tsCol)) - unix_micros(col("__prev_ts"))) > gapSec * 1000000L,
          lit(1L)
        ).otherwise(lit(0L))
      )
      .withColumn(
        "session_id",
        sum(col("__new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0))
      )
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session aggregate over [[sessionizeBatch]] output. */
  def sessionStats(
      sessions: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame =
    sessions
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col(tsCol))).as("start_us"),
        unix_micros(max(col(tsCol))).as("end_us"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total_value")
      )

  /** Top-K most common session PATHS — the product-analytics view of
    * [[sessionizeBatch]]'s output ("what do sessions actually look
    * like"): each session renders as its ordered event-type string
    * (`view->click->purchase`), then paths rank by frequency. The
    * per-session order is (ts, tiebreak) — deterministic under any
    * physical row order — realized as one `array_sort` over the
    * session's collected (ts, tie, type) structs: per-session state is
    * bounded by session length (the gap rule bounds it), never by user
    * history, and the ranking is a TakeOrdered heap over the path
    * vocabulary, not a global sort.
    */
  def sessionPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      orderTiebreak: String,
      typeCol: String,
      gapMinutes: Int,
      topK: Int
  ): DataFrame = {
    require(topK > 0, "topK must be positive")
    sessionizeBatch(events, userCol, tsCol, orderTiebreak, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        collect_list(
          struct(
            unix_micros(col(tsCol)).as("u"),
            col(orderTiebreak).as("t"),
            col(typeCol).as("e"))).as("__evs"))
      .select(array_join(expr("transform(array_sort(__evs), x -> x.e)"), "->").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(topK)
  }

  /** Tumbling-window aggregate (batch formulation): event counts and value
    * sums per (window, event_type). `date_trunc` keys make the same query
    * expressible over a stream via `window(ts, "1 hour")`.
    */
  def tumblingCounts(events: DataFrame, tsCol: String, typeCol: String): DataFrame =
    events
      .groupBy(date_trunc("hour", col(tsCol)).as("window_start"), col(typeCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value")
      )

  /** Sliding-window aggregate (batch formulation): each event contributes to
    * every `slideMinutes`-spaced window of `widthMinutes` covering it —
    * `window(ts, width, slide)` generates the per-event window set, exactly
    * what the streaming form uses.
    */
  def slidingCounts(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      widthMinutes: Int,
      slideMinutes: Int
  ): DataFrame =
    events
      .groupBy(
        window(col(tsCol), s"$widthMinutes minutes", s"$slideMinutes minutes"),
        col(typeCol)
      )
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(typeCol), col("n"))

  /** Structured Streaming twin of [[tumblingCounts]]: watermarked tumbling
    * window. Call with a `readStream` DataFrame; the batch tests drive it
    * with a memory sink.
    */
  def tumblingCountsStream(events: DataFrame, tsCol: String, typeCol: String): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(typeCol), col("n"))

  /** Structured Streaming twin of [[slidingCounts]]: watermarked sliding
    * window — each event enters every `slideMinutes`-spaced window of
    * `widthMinutes` covering it, finalized in append mode once the
    * watermark passes the window end.
    */
  def slidingCountsStream(
      events: DataFrame,
      tsCol: String,
      typeCol: String,
      widthMinutes: Int,
      slideMinutes: Int
  ): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(
        window(col(tsCol), s"$widthMinutes minutes", s"$slideMinutes minutes"),
        col(typeCol)
      )
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(typeCol), col("n"))

  /** One event for the custom-state sessionizer. */
  final case class SessionEvent(user_id: String, ts: java.sql.Timestamp, value: Double)

  /** Mutable per-user session state carried between micro-batches. */
  final case class SessionState(start: Long, end: Long, nEvents: Long, totalValue: Double)

  /** One closed session emitted by [[sessionizeWithState]]. */
  final case class ClosedSession(
      user_id: String,
      start_us: Long,
      end_us: Long,
      n_events: Long,
      total_value: Double
  )

  /** Custom-state sessionization via `flatMapGroupsWithState`: the explicit
    * state-machine form of [[sessionWindowStream]] for when session logic
    * outgrows what `session_window` expresses (per-session aggregates beyond
    * count, emit-on-close semantics, custom eviction). State per user is one
    * open session; an event past the gap closes and EMITS the previous
    * session; a group timeout (watermark-driven) flushes the final one.
    * State volume is bounded by |active users|, not history.
    */
  def sessionizeWithState(
      events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMinutes: Int
  ): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def flush(
        user: String,
        rows: Iterator[SessionEvent],
        state: GroupState[SessionState]
    ): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(ClosedSession(user, s.start, s.end, s.nEvents, s.totalValue))
      }
      // full microsecond precision: getTime alone truncates to millis and
      // would shift session bounds off the batch twin's epoch_us
      def micros(t: java.sql.Timestamp): Long =
        math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.value))
      var closed = List.empty[ClosedSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val us = micros(e.ts)
        cur match {
          case Some(s) if us - s.end <= gapUs =>
            cur = Some(SessionState(s.start, math.max(s.end, us), s.nEvents + 1, s.totalValue + e.value))
          case Some(s) =>
            closed ::= ClosedSession(user, s.start, s.end, s.nEvents, s.totalValue)
            cur = Some(SessionState(us, us, 1L, e.value))
          case None =>
            cur = Some(SessionState(us, us, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // close the open session once the event-time watermark passes its gap
        state.setTimeoutTimestamp(s.end / 1000L + gapMinutes * 60L * 1000L)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(flush)
  }

  /** Structured Streaming session windows (gap-based), the streaming twin of
    * [[sessionizeBatch]].
    */
  def sessionWindowStream(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapMinutes: Int
  ): DataFrame =
    events
      .withWatermark(tsCol, "1 hour")
      .groupBy(session_window(col(tsCol), s"$gapMinutes minutes"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(userCol),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events")
      )
}
