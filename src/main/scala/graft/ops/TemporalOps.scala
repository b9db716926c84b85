package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators over event streams: point-in-time (as-of)
  * lookups and bounded-interval (range) joins. Neither exists as a Spark
  * built-in; both are expressed here as compositions of shuffles the
  * planner already optimizes, not driver-side loops:
  *
  *   - as-of join = union + one window pass over (key, ts) — the
  *     distributed merge-join shape: ONE shuffle on the key, one
  *     partition-local sort, zero row amplification. The naive
  *     alternative (theta join `l.ts >= r.ts` + keep-latest) is a
  *     per-key cross product — quadratic in events-per-key and planned
  *     as BroadcastNestedLoopJoin when keys are absent.
  *   - range join = bucketized equi-join: each side lands in
  *     floor(ts/tol) buckets, the probe side explodes to 3 adjacent
  *     buckets, and the |Δt| ≤ tol predicate filters after an ordinary
  *     shuffled equi-join. 3× probe-side amplification buys an
  *     equi-join plan (SMJ/SHJ, AQE-skew-splittable) instead of the
  *     nested-loop theta join.
  *
  * At 100 TB both scale with the equi-join machinery: partial
  * aggregation, AQE skew splitting, and co-location via bucketing all
  * apply, because the physical plan is plain shuffle-on-key.
  */
object TemporalOps {

  /** Point-in-time (as-of) left join: for every left row, attach the
    * payload of the LATEST right row with the same `key` and
    * `right.ts <= left.ts` (nulls if none) — or, with `forward = true`,
    * the EARLIEST right row with `right.ts >= left.ts`. Ties on the
    * right timestamp resolve to the greatest `rightTie` value, so
    * results are deterministic under any physical row order.
    *
    * Columns out: all of `left`, plus `asof_ts` (the matched right
    * timestamp) and `asof_<p>` for each payload column `p`. Payload
    * names must not collide with left column names.
    *
    * Implementation: tag and union both sides, then one running
    * `last(payload, ignoreNulls)` window ordered by
    * (ts, side, tie) per key — right rows sort before left rows at
    * equal ts (so the bound includes same-instant matches), and later
    * tie values overwrite earlier ones within an instant. The forward
    * variant simply reverses the timestamp order; everything else is
    * identical, so both directions share the one-shuffle merge shape.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightTie: String,
      forward: Boolean = false
  ): DataFrame = {
    val r = right.select(
      col(key),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      col(rightTie).as("__tie"),
      struct(col(rightTs).as("__mts") +: payload.map(col): _*).as("__pay")
    )
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window
      .partitionBy(col(key))
      .orderBy(tsOrder, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("asof_ts", col("__m.__mts"))
    payload
      .foldLeft(matched)((d, p) => d.withColumn(s"asof_$p", col(s"__m.$p")))
      .drop("__ts", "__side", "__tie", "__pay", "__m")
  }

  /** NEAREST-match as-of join: for every left row, attach the right row
    * (same `key`) whose timestamp is CLOSEST in absolute distance —
    * backward or forward — with ties in distance resolving backward (the
    * conservative "don't peek ahead unless strictly closer" rule sensor
    * fusion and feature-stitching pipelines use). Same-instant right rows
    * match at distance 0; ties among equal right timestamps resolve to
    * the greatest `rightTie`, exactly like [[asofJoin]].
    *
    * Columns out: all of `left`, plus `asof_ts`, `asof_dir` ('B'/'F',
    * null when no match exists on either side) and `asof_<p>` per payload
    * column.
    *
    * Implementation: the [[asofJoin]] union, with TWO running-last window
    * passes over the same key partitioning (ascending for the backward
    * candidate, descending for the forward one) and a row-local distance
    * pick. ONE shuffle on the key — the second window reuses the
    * exchange and pays only a partition-local re-sort; still zero row
    * amplification, so the 100 TB story is [[asofJoin]]'s. Timestamps
    * compare in micros (`unix_micros`) for timestamp columns and as
    * longs otherwise.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      rightTie: String
  ): DataFrame = {
    def micros(df: DataFrame, name: String): Column => Column =
      df.schema(name).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(_)
        case _ => _.cast("long")
      }
    val lUs = micros(left, leftTs)
    val rUs = micros(right, rightTs)
    val r = right.select(
      col(key),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      col(rightTie).as("__tie"),
      struct(col(rightTs).as("__mts") +: payload.map(col): _*).as("__pay")
    )
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    def w(o: Column) = Window
      .partitionBy(col(key))
      .orderBy(o, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = u
      .withColumn("__mb", last(col("__pay"), ignoreNulls = true).over(w(col("__ts").asc)))
      .withColumn("__mf", last(col("__pay"), ignoreNulls = true).over(w(col("__ts").desc)))
      .filter(col("__side") === 1)
    val bts = col("__mb.__mts")
    val fts = col("__mf.__mts")
    // strict <: an equidistant forward match loses to the backward one
    val pickF = bts.isNull ||
      (fts.isNotNull && (rUs(fts) - lUs(col("__ts")) < lUs(col("__ts")) - rUs(bts)))
    val withPick = m
      .withColumn("asof_ts", when(pickF, fts).otherwise(bts))
      .withColumn(
        "asof_dir",
        when(bts.isNull && fts.isNull, lit(null).cast("string"))
          .when(pickF, lit("F")).otherwise(lit("B")))
    payload
      .foldLeft(withPick)((d, p) =>
        d.withColumn(s"asof_$p", when(pickF, col(s"__mf.$p")).otherwise(col(s"__mb.$p"))))
      .drop("__ts", "__side", "__tie", "__pay", "__mb", "__mf")
  }

  /** Rolling per-key window aggregate over the last `nRows` rows
    * (inclusive), ordered by (ts, tie): running sum of `valueCol` in
    * DECIMAL space (exact — float running sums depend on evaluation
    * order) plus the window's row count. One shuffle on the key, one
    * partition-local sort; Spark evaluates the bounded ROWS frame
    * incrementally, so cost is O(rows), not O(rows·frame).
    */
  def rollingSum(
      df: DataFrame,
      key: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      nRows: Int
  ): DataFrame = {
    require(nRows > 0, "window must span at least one row")
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    df.withColumn("roll_sum", sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("n_window", count(lit(1)).over(w))
  }

  /** EWMA smoothing over each key's trailing `nRows` rows — the
    * exponentially-weighted moving average every metrics/monitoring
    * pipeline runs, in the ALL-INTEGER weight algebra of this module:
    * the true weights α(1−α)^j (j = 0 is the current row) scale by
    * aD^N/α into the exact integers `(aD−aN)^j · aD^(N−1−j)`, so the
    * weighted numerator and the window's weight total are Long sums —
    * associative, engine-exact — and the only float is ONE division
    * rounded at 6 dp. Truncating the exponential tail at `nRows` is the
    * production form (a full-history EWMA can't window); partial windows
    * at a series head renormalize by the present weights, the standard
    * `adjust=true` convention.
    *
    * Values are cent-quantized (`floor(v·100 + 0.5)`) like the module's
    * other integer ops; null values are excluded from both the output and
    * the windows (an EWMA over "the last n OBSERVATIONS"). Range: the
    * individual weights fit a Long by construction (aD^(N−1) ≤ 8^15 <
    * 2^46 at the guarded N ≤ 16, aD ≤ 8), and the weighted numerator
    * accumulates in decimal(38,0) — exact for any cent-quantized input
    * (the [[rollingSum]] posture; a Long numerator would overflow at
    * aD=8, N=16 for |values| beyond ~$370) — so the only float remains
    * the one final division.
    *
    * Scale shape: one bounded window per key (collect_list of ≤ nRows
    * longs), no self-join, no state beyond the frame — identical posture
    * to [[rollingSum]].
    */
  def ewmaSmooth(
      df: DataFrame,
      key: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      nRows: Int,
      alphaNum: Int = 1,
      alphaDen: Int = 4
  ): DataFrame = {
    require(nRows > 0 && nRows <= 16, "window must span 1..16 rows")
    require(alphaNum > 0 && alphaNum < alphaDen, "alpha must be in (0,1)")
    // keeps every per-lag weight itself a Long (aD^(N−1) ≤ 8^15 < 2^46);
    // the weighted numerator is decimal(38,0), so values never overflow
    require(alphaDen <= 8, "alphaDen beyond 8 overflows the Long per-lag weights at nRows=16")
    val b = (alphaDen - alphaNum).toLong
    val weights: Seq[Long] = (0 until nRows).map(j =>
      (BigInt(b).pow(j) * BigInt(alphaDen.toLong).pow(nRows - 1 - j)).toLong)
    val wlit = array(weights.map(lit): _*)          // wlit[j+1] = weight of lag j
    val dlit = array(weights.scanLeft(0L)(_ + _).tail.map(lit): _*) // dlit[s] = Σ w_0..w_{s-1}
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    df.filter(col(valueCol).isNotNull)
      .withColumn("__q", floor(col(valueCol).cast("double") * 100 + lit(0.5)).cast("long"))
      .withColumn("__arr", collect_list(col("__q")).over(w)) // frame order: oldest first
      .withColumn("n_window", size(col("__arr")))
      .withColumn(
        "__num",
        aggregate(
          // position p (0-based, oldest first) has lag j = s−1−p → wlit[s−p];
          // product and sum in decimal(38,0): q (≤ 2^63 cents) × weight
          // (≤ 8^15) exceeds a Long for large values, decimal never does
          transform(
            sequence(lit(0), col("n_window") - 1),
            p =>
              element_at(col("__arr"), p + 1).cast("decimal(20,0)") *
                element_at(wlit, col("n_window") - p).cast("decimal(18,0)")),
          lit(0).cast("decimal(38,0)"),
          (acc, x) => acc + x))
      .withColumn(
        "ewma",
        // ÷100 de-quantizes back to the value's own units; the scale
        // folds into the exact integer denominator, still one division
        round(
          col("__num").cast("double") /
            (element_at(dlit, col("n_window")) * lit(100L)).cast("double"),
          6))
      .drop("__q", "__arr", "__num")
  }

  /** Rolling z-score anomaly flags in ALL-INTEGER arithmetic: over each
    * key's trailing `nRows` rows (ordered by ts, tie-broken on `tieCol`),
    * flag the current value when it sits more than `k` population
    * standard deviations from the window mean. The float-free form:
    *
    *   |x − S/n| > k·σ  ⟺  (n·x − S)² > k²·(n·Q − S²)
    *
    * with S = Σv, Q = Σv², both over the window — every term a Long, so
    * the flag can never flip on float rounding in any engine (the
    * stats_outliers / MAD contract, windowed). `valueCol` must already be
    * integer-quantized (cents, micros — the caller picks the unit).
    *
    * Scale shape: ONE bounded window per key — rolling sums, not a
    * self-join; AQE-skew-splittable on the partition key like any window.
    * Long-range check: |n·x| and |S| ≤ n·max|v|, and the squared side
    * needs (n·max|v|)² · k² within Long — holds for quantized metrics
    * (≤ ~1e7 units) at analytics window sizes; requantize coarser if not.
    */
  def rollingZOutliers(
      df: DataFrame,
      key: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      nRows: Int,
      k: Int
  ): DataFrame = {
    require(nRows > 1, "a z-window needs at least two rows")
    require(k > 0, "k must be positive")
    val w = Window
      .partitionBy(col(key))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(nRows - 1).toLong, Window.currentRow)
    val v = col(valueCol)
    df.withColumn("win_sum", sum(v).over(w))
      .withColumn("win_sumsq", sum(v * v).over(w))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn(
        "flagged",
        (col("n_window") * v - col("win_sum")) * (col("n_window") * v - col("win_sum")) >
          lit(k.toLong * k) * (col("n_window") * col("win_sumsq") - col("win_sum") * col("win_sum")))
  }

  /** Cohort retention matrix — the growth-analytics staple: users bucket
    * by their FIRST-SEEN week (Monday-truncated, the ISO semantics both
    * Spark and DuckDB share), and each (cohort_week, week_offset) cell
    * counts the distinct users active that many weeks after their cohort
    * start. Scale shape mirrors the funnel: one partial-agg pins each
    * user's cohort (|users| rows), a probe tags every event, one
    * partial-aggregated distinct count finishes — no window, no per-user
    * sort.
    *
    * The cohort frame is one row per DISTINCT USER — small for a
    * product-analytics tenant but unbounded in general, so the broadcast
    * is opt-in via `broadcastCohorts` (default true, the analytics-scale
    * fast path). At a user count past driver/broadcast limits pass
    * `false`: both sides then shuffle-join on the user key — the same
    * hash partitioning the cohort agg already produced, so the extra
    * exchange is on the events side only.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      broadcastCohorts: Boolean = true
  ): DataFrame = {
    val cohorts = events
      .groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("__cw"))
    events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__w"))
      .join(if (broadcastCohorts) broadcast(cohorts) else cohorts, Seq(userCol))
      .groupBy(
        date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("__w"), col("__cw")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Event-type transition matrix — the Markov-chain building block of
    * behavioral analytics: counts of consecutive (from → to) event-type
    * pairs per user sequence, ordered by (ts, tiebreak). One per-user
    * window (`lag`) over the same (key, ts) clustering every sequence op
    * here shares, then one partial-aggregated pair count — the window
    * partitions by user so the sort is per-user, never global, and the
    * count's shuffle carries at most |event_types|² rows per map task.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Fixed-grid resample with last-observation-carried-forward fill —
    * the time-series regularization step (gap-fill/LOCF) that turns an
    * irregular event stream into one row per (key, grid bucket):
    *
    *   1. bucket every event at `floor(epoch_seconds / stepSec)` and keep
    *      the per-(key, bucket) LATEST observation (greatest (ts, tie) —
    *      one struct-max partial agg, so the reduce combines map-side);
    *   2. span each key's grid from its first to its last observed
    *      bucket (`sequence` + explode — grid size is span/step, a
    *      parameter the caller bounds, not a data-driven blowup);
    *   3. carry the last non-null observation forward with one running
    *      `last(ignoreNulls)` window per key.
    *
    * Every bucket from a key's first to last observation appears exactly
    * once; `observed` marks rows backed by a real event. A null observed
    * VALUE is treated as missing and carried over, the LOCF convention.
    *
    * Scale shape: shuffle 1 clusters (key, bucket) with map-side
    * combine; shuffle 2 re-keys the ≤|buckets| winners per key for the
    * span agg, grid explode, and window — all per-key, never global.
    * The grid never materializes the raw event volume: LOCF runs over
    * winners (one row per occupied bucket) plus synthesized gap rows.
    */
  def resampleLocf(
      events: DataFrame,
      key: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      stepSec: Long
  ): DataFrame = {
    require(stepSec > 0, "step must be positive")
    // microsecond epochs end-to-end: bucketing AND the winner ordering
    // stay exact integers (`div`, never a rounding double `/`), so any
    // engine replays both; truncated-seconds ordering would disagree on
    // same-second events
    val ev = events.select(
      col(key).as("k"),
      unix_micros(col(tsCol)).as("__e"),
      col(tieCol).as("__tie"),
      col(valueCol).as("__v"))
      .withColumn("bucket", expr(s"__e div ${stepSec * 1000000L}L"))
    val winners = ev
      .groupBy(col("k"), col("bucket"))
      .agg(max(struct(col("__e"), col("__tie"), col("__v"))).as("__w"))
      .select(col("k"), col("bucket"), col("__w.__v").as("__obs_v"), lit(true).as("__hit"))
    val grid = winners
      .groupBy(col("k"))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col("k"), explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val w = Window
      .partitionBy(col("k"))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(winners, Seq("k", "bucket"), "left")
      .select(
        col("k").as(key),
        col("bucket"),
        last(col("__obs_v"), ignoreNulls = true).over(w).as("value_filled"),
        coalesce(col("__hit"), lit(false)).as("observed"))
  }

  /** Interval (range) join: inner-join rows of `left` and `right` on
    * `key` where `|leftTs - rightTs| <= tolSec`. The two frames must
    * have disjoint column names apart from `key`.
    *
    * Bucketization: both sides bucket at floor(epoch_us / tol); the left
    * side probes its own bucket ±1. A matching pair is at most one
    * bucket apart (bucket width = tolerance), and since each right row
    * has exactly ONE bucket, no pair can match twice — no dedup needed.
    * Bucket indices stay integral end-to-end (subtract-mod before the
    * divide), so bucket assignment is engine-exact.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      tolSec: Long
  ): DataFrame = {
    require(tolSec > 0, "tolerance must be positive")
    val tolUs = tolSec * 1000000L
    def bkt(c: Column): Column =
      ((unix_micros(c) - pmod(unix_micros(c), lit(tolUs))) / lit(tolUs)).cast("long")
    val r = right.withColumn("__bkt", bkt(col(rightTs)))
    val l = left
      .withColumn("__b0", bkt(col(leftTs)))
      .withColumn("__bkt", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    l.join(r, Seq(key, "__bkt"))
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= tolUs)
      .drop("__bkt")
  }

  /** Bounded-lookback interval join: inner-join `left` and `right` on
    * `key`, keeping pairs with `rightTs` in `[leftTs - horizonSec,
    * leftTs]`. The one-sided sibling of [[rangeJoin]] for attribution /
    * feature-lookback shapes ("all touches in the H before the
    * conversion").
    *
    * Scale contract: the naive form `l.join(r, key).filter(rts <= lts)`
    * fans out per key by the RIGHT side's LIFETIME row count — a bot-
    * scale key with 10⁴ touches and 10² anchors materializes 10⁶ rows
    * on one shuffle key, and because every pair shares that key, AQE
    * skew-splitting cannot divide it. Here bucket width = horizon, each
    * right row lands in exactly ONE bucket, each left row probes its own
    * bucket and the previous one, so per-(key, bucket) fanout is bounded
    * by rows-per-2-horizons regardless of history length — and the two
    * residual comparisons restore the exact interval. Buckets stay
    * integral (subtract-mod before the divide), so assignment is
    * engine-exact; no pair can match twice (one bucket per right row),
    * so no dedup pass is needed.
    */
  def lookbackJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      horizonSec: Long
  ): DataFrame = {
    require(horizonSec > 0, "horizon must be positive")
    val hUs = horizonSec * 1000000L
    def bkt(c: Column): Column =
      ((unix_micros(c) - pmod(unix_micros(c), lit(hUs))) / lit(hUs)).cast("long")
    val r = right.withColumn("__bkt", bkt(col(rightTs)))
    val l = left
      .withColumn("__b0", bkt(col(leftTs)))
      .withColumn("__bkt", explode(array(col("__b0") - 1, col("__b0"))))
      .drop("__b0")
    l.join(r, Seq(key, "__bkt"))
      .filter(
        unix_micros(col(rightTs)) <= unix_micros(col(leftTs)) &&
          unix_micros(col(rightTs)) >= unix_micros(col(leftTs)) - hUs)
      .drop("__bkt")
  }

  /** Growth accounting per day — the new/retained/resurrected/churning
    * decomposition every growth team tracks (DAU alone hides whether
    * you're acquiring or leaking): for each user-active day, the user is
    * NEW (no prior activity), RETAINED (previous active day within
    * `gapDays`), or RESURRECTED (returned after a gap); a user CHURNS on
    * the last day of a streak (no activity within `gapDays` after),
    * right-censored — streaks ending within `gapDays` of the data's max
    * day can't be judged yet and aren't counted churned.
    *
    * Scale shape: raw rows collapse to distinct (user, day) once
    * (partial-agg'd); the lag/lead window runs per user over ACTIVE DAYS
    * (≤ calendar length per user, never raw events); the max-day scalar
    * broadcasts as a one-row frame. Output is |days| rows.
    */
  def growthAccounting(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      gapDays: Int
  ): DataFrame = {
    require(gapDays >= 1, "gapDays must be >= 1")
    val act = df.select(keyCol.as("k"), to_date(tsCol).as("day")).distinct()
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
    val maxD = act.agg(max(col("day")).as("__maxd"))
    act
      .withColumn("__prev", lag(col("day"), 1).over(w))
      .withColumn("__next", lead(col("day"), 1).over(w))
      .crossJoin(broadcast(maxD)) // one-row frame: the cross join is a scalar
      .withColumn(
        "__ret",
        col("__prev").isNotNull && datediff(col("day"), col("__prev")) <= gapDays)
      .withColumn(
        "__chn",
        (col("__next").isNull || datediff(col("__next"), col("day")) > gapDays) &&
          col("day") <= date_sub(col("__maxd"), gapDays))
      .groupBy(col("day"))
      .agg(
        sum(when(col("__prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__ret"), 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("__prev").isNotNull && !col("__ret"), 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("__chn"), 1L).otherwise(0L)).as("n_churning"))
  }

  /** Cumulative-unique-users curve per day — the growth/retention
    * denominator every analytics stack computes, done WITHOUT a
    * cumulative distinct (which would need per-day state proportional to
    * all users ever seen): each user collapses to their FIRST day (one
    * partial-agg'd min), new-user counts roll up per day, and the running
    * total is a window over the |days|-row frame — bounded by calendar
    * cardinality, not user count, which is what makes the global
    * (unpartitioned) window legitimate here. Daily actives come from the
    * same (day, user) rollup. One summary row per day:
    * `(day, n_active, n_new, n_cum_users)`.
    */
  def cumulativeUniques(df: DataFrame, keyCol: Column, tsCol: Column): DataFrame = {
    val ev = df.select(keyCol.as("k"), to_date(tsCol).as("day"))
    val perDay = ev.groupBy(col("day"), col("k")).agg(count(lit(1)).as("__n"))
    val active = perDay.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val newPerDay = ev
      .groupBy(col("k")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    // |days| rows: the one place a global ordered window is honest
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active
      .join(newPerDay, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("n_cum_users", sum(col("n_new")).over(w))
  }

  /** Weekly-seasonality baseline + residual per (key, day) — the
    * decomposition a metrics pipeline runs before alerting (a Sunday dip
    * is seasonality, a Tuesday dip is an incident): daily totals roll up
    * once, the per-(key, day-of-week) baseline is their exact-decimal
    * mean, and each day's residual is its distance from that baseline.
    *
    * Day-of-week is computed ENGINE-NEUTRALLY as `epoch_days mod 7`
    * (0 = Thursday, 1970-01-01) — `dayofweek()` builtins disagree on
    * week start across engines, `mod 7` cannot. The baseline is one
    * correctly-rounded division of a decimal sum (order-free exact) by
    * the day count; baseline and residual round to 6 dp.
    *
    * Scale shape: one partial-agg'd (key, day) rollup — raw rows shuffle
    * once as daily partials — then a broadcast-sized (key, dow) baseline
    * frame joins back. No window over raw rows anywhere.
    */
  def seasonalBaseline(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      valueCol: Column
  ): DataFrame = {
    val daily = df
      .select(keyCol.as("key"), to_date(tsCol).as("day"), valueCol.cast("long").as("v"))
      .groupBy(col("key"), col("day"))
      .agg(sum(coalesce(col("v"), lit(0L))).as("day_total"))
      .withColumn("dow", pmod(datediff(col("day"), lit("1970-01-01").cast("date")), lit(7)))
    val base = daily
      .groupBy(col("key"), col("dow"))
      .agg(
        sum(col("day_total").cast("decimal(38,0)")).as("__s"),
        count(lit(1)).as("__n"))
      .withColumn("baseline", round(col("__s").cast("double") / col("__n").cast("double"), 6))
      .select(col("key"), col("dow"), col("baseline"))
    daily
      .join(broadcast(base), Seq("key", "dow"))
      .select(
        col("key"), col("day"), col("dow").cast("int").as("dow"), col("day_total"),
        col("baseline"),
        round(col("day_total").cast("double") - col("baseline"), 6).as("residual"))
  }
}
