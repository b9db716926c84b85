package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** Event-time & graph family: sessionization, windows, as-of joins,
  * attribution, funnels, resampling, and the bounded-round graph loops.
  *
  * Split out of Extensions.scala (round 15): same entries, same maps —
  * [[Extensions]] aggregates the families, so the driver contract
  * (SparkEntry.queries / oracleSql) is unchanged.
  */
private[queries] object QEvents {
  import QShared._
  import OracleSql._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // cluster-density audit a dedup report actually wants
    "graph_triangles" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.triangleStats(
        edges, "id_lo", "id_hi", contentKey = Some(s"documents|$dir|pf19-20"))
    },
    // community ids over the same near-dup pair graph (third consumer of
    // the shared setsim spill): 3 rounds of derandomized synchronous
    // label propagation — mode-of-neighbor-labels, ties to the smallest —
    // electing each near-clique's minimum doc id as its community id.,
    // The oracle unrolls the identical three rounds in SQL
    "graph_label_prop" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.labelPropagation(
        edges, "id_lo", "id_hi", iters = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
    // multi-source BFS over the same near-dup pair graph: minimal hop
    // distances from the benchmark-doc seed set (doc_id % 100 == 0) out
    // to 3 hops — the contamination blast-radius trace; every round joins,
    // only the fresh frontier (work frontier-proportional, never |V|)
    "graph_bfs" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      val sources = t(s, dir, "documents").filter(col("doc_id") % 100 === 0)
      graft.ops.GraphOps.bfsDistances(
        edges, "id_lo", "id_hi", sources, "doc_id", rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20|seed=mod100"))
    },
    // reachability-closure certificate for the bounded BFS: one probe
    // round past R — at_fixpoint=true proves nothing lies beyond 3 hops,
    // so the distance table IS the full closure, checked not assumed,
    "graph_bfs_fixpoint" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      val sources = t(s, dir, "documents").filter(col("doc_id") % 100 === 0)
      graft.ops.GraphOps.bfsFixpoint(
        edges, "id_lo", "id_hi", sources, "doc_id", rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20|seed=mod100"))
    },
    // dense-subgraph certificate over the same near-dup pair graph (fourth
    // consumer of the shared setsim spill): 3 fixed rounds of bulk-
    // synchronous 2-core peeling — spam/template mills survive as
    // high-core near-cliques, organic pairwise near-dups peel away. The,
    // oracle unrolls the identical rounds
    "graph_kcore" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.kcorePeel(
        edges, "id_lo", "id_hi", k = 2, rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
    // fixpoint certificate for the fixed-round peel above: peel the same
    // 3 rounds plus ONE probe round and report whether the survivor set
    // moved — at_fixpoint=true proves graph_kcore's answer IS the exact
    // 2-core (a fixpoint round removes nothing), turning the documented
    // "superset on long chains" caveat into a checked signal. The oracle,
    // unrolls the identical 4 rounds and diffs the two survivor sets
    "graph_kcore_fixpoint" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.kcoreFixpoint(
        edges, "id_lo", "id_hi", k = 2, rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
    // convergence certificate for the synchronous label propagation: run
    // the same 3 rounds plus one probe round and count nodes whose label
    // still moves — converged=true distinguishes a stable community,
    // assignment from a truncated (or oscillating) one
    "graph_label_prop_fixpoint" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.labelPropFixpoint(
        edges, "id_lo", "id_hi", iters = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
    "ev_sessionize" -> { (s, dir) =>
      val sessions = Sessionize.sessionizeBatch(Fixtures.events(s, dir), "user_id", "ts", "event_id", 30)
      Sessionize.sessionStats(sessions, "user_id", "ts", "value")
    },
    "ev_tumbling" -> { (s, dir) =>
      Sessionize
        .tumblingCounts(Fixtures.events(s, dir), "ts", "event_type")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"),
          col("n"),
          col("total_value")
        )
    },
    "ev_sliding" -> { (s, dir) =>
      Sessionize
        .slidingCounts(Fixtures.events(s, dir), "ts", "event_type", 60, 30)
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"),
          col("n")
        )
    },
    // Embedding-cosine near-dup (SRP buckets). md5-derived planes +,
    // per-key cross product)
    "ev_asof_join" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalOps
        .asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("value"), "event_id")
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("purchase_us"),
          col("asof_value").as("purchase_value")
        )
    },
    // cumulative-unique-users curve: first-seen collapse (no cumulative
    // distinct state), per-day rollups, running total over the bounded,
    // |days| frame — the growth denominator
    "ev_cumulative_uniques" -> { (s, dir) =>
      TemporalOps.cumulativeUniques(Fixtures.events(s, dir), col("user_id"), col("ts"))
    },
    // weekly-seasonality decomposition: per-(event_type, day) totals vs
    // the (event_type, day-of-week) baseline — dow as epoch_days mod 7
    // (engine-neutral), exact decimal means, residual = actual − baseline;,
    // one daily rollup + a broadcast baseline join, no raw-row window
    "ev_seasonal_baseline" -> { (s, dir) =>
      TemporalOps.seasonalBaseline(
        Fixtures.events(s, dir),
        col("event_type"), col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
    },
    // NEAREST as-of: each click's closest purchase in either direction,
    // equidistant ties resolving backward — two window passes over ONE,
    // key shuffle (the second reuses the exchange), row-local pick
    "ev_asof_nearest" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalOps
        .asofJoinNearest(clicks, purchases, "user_id", "ts", "ts", Seq("value"), "event_id")
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("purchase_us"),
          col("asof_dir"),
          col("asof_value").as("purchase_value")
        )
    },
    // forward as-of: each click's NEXT purchase at-or-after it (time-to-,
    // conversion shape; same one-shuffle merge plan, reversed ts order)
    "ev_asof_forward" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalOps
        .asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("value"), "event_id", forward = true)
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("purchase_us"),
          col("asof_value").as("purchase_value")
        )
    },
    // interval join: events of the same user within ±30 min of each error,
    // event, aggregated per anchor (bucketized equi-join, not a theta join)
    "ev_range_join" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val anchors = ev
        .filter(col("event_type") === "error")
        .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("a_ts"))
      val others = ev.select(
        col("user_id"), col("ts").as("e_ts"), col("event_id").as("e_id"), col("value"))
      val near = TemporalOps
        .rangeJoin(anchors, others, "user_id", "a_ts", "e_ts", tolSec = 1800)
        .filter(col("e_id") =!= col("anchor_id"))
        .groupBy(col("anchor_id"))
        .agg(
          count(lit(1)).as("n_nearby"),
          sum(col("value").cast("decimal(18,2)")).as("sv")
        )
      anchors
        .join(near, Seq("anchor_id"), "left")
        .select(
          col("anchor_id"),
          col("user_id"),
          unix_micros(col("a_ts")).as("ts_us"),
          coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
          coalesce(col("sv"), lit(0).cast("decimal(18,2)")).cast("double").as("total_value")
        )
    },
    // exact interpolated quantiles of the doc-length distribution (the,
    // distinct user-days once, lag/lead over ACTIVE days only
    "ev_growth_accounting" -> { (s, dir) =>
      TemporalOps.growthAccounting(
        Fixtures.events(s, dir), col("user_id"), col("ts"), gapDays = 7)
    },
    // product-analytics session paths: each session rendered as its
    // ordered event-type string, top-20 by frequency — per-session state,
    // bounded by the gap rule, TakeOrdered over the path vocabulary
    "ev_path_sessions" -> { (s, dir) =>
      graft.streaming.Sessionize.sessionPaths(
        Fixtures.events(s, dir), "user_id", "ts", "event_id", "event_type",
        gapMinutes = 30, topK = 20)
    },
    // robust feature scaling: (v − median)/IQR per source — ONE quantile
    // sort serves all three quartiles, stats broadcast back; IQR=0 groups,
    "ts_ewma" -> { (s, dir) =>
      TemporalOps
        .ewmaSmooth(Fixtures.events(s, dir), "user_id", "ts", "event_id", "value", nRows = 8)
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("n_window"), col("ewma"))
    },
    // rolling 5-event window per user: decimal-exact running sum + count,
    "ev_rolling" -> { (s, dir) =>
      TemporalOps
        .rollingSum(Fixtures.events(s, dir), "user_id", "ts", "event_id", "value", nRows = 5)
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("roll_sum"), col("n_window"))
    },
    // rolling z-score anomaly flags, float-free: the |x−μ| > k·σ compare
    // cross-multiplied into Long arithmetic ((n·x−S)² > k²·(nQ−S²)) over
    // cent-quantized values — the windowed form of the stats_outliers
    // exactness contract, so the flag cannot flip on float rounding.
    // nRows=12 with k=3: a window's own point can reach at most,
    // (n−1)/√n̅ σ from its mean, so k=3 needs n ≥ 11 to be able to fire
    "ev_anomaly_roll" -> { (s, dir) =>
      TemporalOps
        .rollingZOutliers(
          Fixtures.events(s, dir)
            .select(
              col("event_id"), col("user_id"), col("ts"),
              expr("cast(floor(value * 100) as long)").as("cents")),
          "user_id", "ts", "event_id", "cents", nRows = 12, k = 3)
        .select(
          col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("n_window"), col("win_sum"), col("flagged"))
    },
    // time-series resampling with forward fill: an hourly grid per user
    // (generated in-plan — sequence + explode, no driver loop), each point
    // carrying the user's latest event at-or-before it via the SAME as-of,
    // operator queries use directly — operator composition, not a one-off
    "ev_resample_ffill" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val grid = ev
        .groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("gts"))
      TemporalOps
        .asofJoin(
          grid,
          ev.select(col("user_id"), col("ts"), col("value"), col("event_id")),
          "user_id", "gts", "ts", Seq("value"), "event_id")
        .select(
          col("user_id"),
          unix_micros(col("gts")).as("gts_us"),
          unix_micros(col("asof_ts")).as("last_ts_us"),
          col("asof_value").as("last_value"))
    },
    // conversion funnel: each user's first click, first purchase at-or-after
    // it, latency, and purchase count after the click — one window pass to
    // pin the anchor, one aggregate; unconverted users kept via left join
    // event-type transition matrix (Markov counts): per-user lag window,
    // (per-user sort, never global) + a bounded |types|² pair count
    "ev_transitions" -> { (s, dir) =>
      TemporalOps.transitionMatrix(
        Fixtures.events(s, dir), "user_id", "ts", "event_id", "event_type")
    },
    // fixed-grid DAILY resample + LOCF gap-fill: per (user, day) latest
    // observation (micros-exact ordering), grid spans first..last observed,
    // day per user, last value carried forward across the gaps
    "ts_resample_locf" -> { (s, dir) =>
      TemporalOps.resampleLocf(
        Fixtures.events(s, dir), "user_id", "ts", "event_id", "value", stepSec = 86400L)
    },
    // fixed-iteration (3) integer PageRank over the per-user props.k
    // transition graph — rank propagation as join+agg rounds, all-integer,
    // so the oracle unrolls the identical three iterations in SQL
    "graph_pagerank" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = Fixtures
        .events(s, dir)
        .select(
          col("user_id"), col("ts"), col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("dst"))
        .withColumn("src", lag(col("dst"), 1).over(w))
        .filter(col("src").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w"))
      graft.ops.GraphOps.pageRank(
        edges, "src", "dst", "w", iters = 3,
        contentKey = Some(s"events|$dir|props-k-lag-transitions"))
    },
    // last-touch attribution: every purchase credits the latest click
    // at-or-before it — the as-of join composed over a filtered stream,
    // (nulls when the user never clicked before buying)
    "ev_attribution_last_touch" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"))
      TemporalOps
        .asofJoin(purchases, clicks, "user_id", "ts", "cts", Seq("cid"), "cid")
        .select(
          col("user_id"),
          col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("asof_cid").as("click_id"),
          unix_micros(col("asof_ts")).as("click_us"))
    },
    // LINEAR multi-touch attribution over a BOUNDED 3-day lookback: every
    // click within [purchase - 3d, purchase] shares the credit equally,
    // in integer cents — credit = cents div n with the remainder assigned
    // to the most recent click (ties to the greatest click id, the
    // asofJoin tie rule), so Σ credit == cents exactly and any engine
    // replays the split. Purchases with no click in the horizon emit no
    // rows (no touch, no credit — inner-join semantics).
    // Scale: the horizon is what makes this survivable — production
    // attribution always bounds the window, and the bucketized
    // lookbackJoin bounds per-(user, bucket) fanout by clicks-per-2-
    // horizons, never clicks-per-lifetime (a bot user with 10⁴ lifetime
    // clicks costs only its in-horizon rows). One window per purchase key,
    // after the join.
    "ev_attribution_linear" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"), col("ts"), col("event_id").as("purchase_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      val j = TemporalOps.lookbackJoin(
        purchases, clicks, "user_id", "ts", "cts", horizonSec = 3L * 86400L)
      val byP = Window.partitionBy(col("purchase_id"))
      j.withColumn("n_touches", count(lit(1)).over(byP))
        .withColumn(
          "rn",
          row_number().over(byP.orderBy(col("cts").desc, col("click_id").desc)))
        .select(
          col("user_id"),
          col("purchase_id"),
          col("click_id"),
          col("n_touches"),
          (expr("cents div n_touches") +
            when(col("rn") === 1, expr("cents % n_touches")).otherwise(0L)).as("credit_cents"))
    },
    // U-SHAPED (position-based) attribution over the same 3-day lookback:
    // the first and last touch each take 40%, the middles share the
    // remaining 20% equally — all in integer cents with every remainder
    // assigned to the most recent touch, so Σ credit == cents exactly.
    // n=1 takes everything; n=2 splits half/half (remainder to the most
    // recent). Same bounded lookbackJoin shape as the linear query; the,
    // role column makes the split auditable
    "ev_attribution_ushape" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"), col("ts"), col("event_id").as("purchase_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      val j = TemporalOps.lookbackJoin(
        purchases, clicks, "user_id", "ts", "cts", horizonSec = 3L * 86400L)
      val byP = Window.partitionBy(col("purchase_id"))
      val t = j
        .withColumn("n_touches", count(lit(1)).over(byP))
        .withColumn(
          "rn",
          row_number().over(byP.orderBy(col("cts").desc, col("click_id").desc)))
      val n = col("n_touches")
      val role = when(n === 1, lit("solo"))
        .when(col("rn") === 1, lit("last"))
        .when(col("rn") === n, lit("first"))
        .otherwise(lit("middle"))
      val fl = expr("cents * 40 div 100") // first/last share when n >= 3
      val half = expr("cents div 2")
      val mid = (col("cents") - fl * 2) // middles' pool when n >= 3
      val perMid = expr("(cents - 2 * (cents * 40 div 100)) div (n_touches - 2)")
      val credit = when(n === 1, col("cents"))
        .when(n === 2, when(col("rn") === 1, col("cents") - half).otherwise(half))
        .otherwise(
          when(col("rn") === n, fl)
            .when(col("rn") === 1, fl + (mid - perMid * (n - 2))) // last: share + remainder
            .otherwise(perMid))
      t.select(
        col("user_id"),
        col("purchase_id"),
        col("click_id"),
        col("n_touches"),
        role.as("role"),
        credit.as("credit_cents"))
    },
    "ev_funnel" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      // anchor via aggregate + join back, NOT a per-user window: the window
      // form sorts every event inside the shuffle; this shape is one
      // partial-agg plus a join on the same key. NO broadcast hint: anchors
      // is one row per clicking user — user-grain, so it scales WITH the
      // data, and a forced broadcast would collect-and-ship O(|users|) at
      // 100x. AQE picks broadcast at runtime when the frame measures small
      // and falls back to a shuffled join when it doesn't.
      val anchors = ev
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "click", col("ts"))).as("c_ts"))
        .filter(col("c_ts").isNotNull)
      val conv = ev
        .filter(col("event_type") === "purchase")
        .join(anchors, Seq("user_id"))
        .filter(col("ts") >= col("c_ts"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("p_ts"), count(lit(1)).as("n_purchases_after"))
      anchors
        .join(conv, Seq("user_id"), "left")
        .select(
          col("user_id"),
          unix_micros(col("c_ts")).as("click_us"),
          unix_micros(col("p_ts")).as("purchase_us"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("latency_us"),
          coalesce(col("n_purchases_after"), lit(0L)).as("n_purchases_after"))
    },
    // cohort retention: first-seen-week cohorts x week offset x distinct
    // returning users — aggregate-then-probe shape, no per-user window.
    // broadcastCohorts=false: the cohort frame is USER-GRAIN (grows with
    // the data), so the registered query leaves the join choice to AQE;,
    // the opt-in broadcast fast path stays for small-tenant callers
    "ev_cohort_retention" -> { (s, dir) =>
      TemporalOps.cohortRetention(
        Fixtures.events(s, dir), "user_id", "ts", broadcastCohorts = false)
    },
    // JSON column parsing: extract props.k and profile it per event type,
    "ev_props_json" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    },
    // fuzzy matching: Levenshtein distance between consecutive docs' 40-char
    // prefixes (the record-linkage primitive; both engines implement the,
  )

  val oracles: Map[String, String] = Map(
    // right-censoring scalar
    "ev_growth_accounting" ->
      """WITH act AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS day FROM events),
         mx AS (SELECT max(day) AS maxd FROM act),
         x AS (SELECT k, day,
                 lag(day) OVER (PARTITION BY k ORDER BY day) AS prev,
                 lead(day) OVER (PARTITION BY k ORDER BY day) AS nxt
               FROM act)
         SELECT day,
                CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
                CAST(sum(CASE WHEN prev IS NOT NULL AND day - prev <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                CAST(sum(CASE WHEN prev IS NOT NULL AND day - prev > 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
                CAST(sum(CASE WHEN (nxt IS NULL OR nxt - day > 7)
                               AND day <= (SELECT maxd FROM mx) - 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_churning
         FROM x GROUP BY day""",
    // path twin: the session CTE + in-session ordered string_agg,
    "ev_path_sessions" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events
         ), y AS (
           SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                          THEN 1 ELSE 0 END AS brk
           FROM x
         ), z AS (
           SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM y
         ), p AS (
           SELECT user_id, session_id,
                  string_agg(event_type, '->' ORDER BY ts, event_id) AS path
           FROM z GROUP BY 1, 2)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""",
    // robust-scale twin: the manual (n−1)p rank interpolation (the,
    "ev_seasonal_baseline" ->
      """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
                CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS BIGINT)
                  AS day_total
              FROM events GROUP BY 1, 2),
         d2 AS (SELECT *, CAST((day - DATE '1970-01-01') % 7 AS INTEGER) AS dow FROM daily),
         b AS (SELECT key, dow,
                 round(CAST(sum(CAST(day_total AS HUGEINT)) AS DOUBLE) /
                       CAST(count(*) AS DOUBLE), 6) AS baseline
               FROM d2 GROUP BY 1, 2)
         SELECT d.key, d.day, d.dow, d.day_total, b.baseline,
                round(CAST(d.day_total AS DOUBLE) - b.baseline, 6) AS residual
         FROM d2 d JOIN b USING (key, dow)""",
    "graph_triangles" ->
      """WITH tok0 AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
                       FROM documents),
         tok AS (SELECT doc_id, token FROM tok0 WHERE length(token) > 0),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
         pair AS (SELECT a.doc_id AS lo, b.doc_id AS hi, CAST(count(*) AS BIGINT) AS inter
                  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         e AS (SELECT lo AS a, hi AS b
               FROM pair JOIN sz sa ON sa.doc_id = lo JOIN sz sb ON sb.doc_id = hi
               WHERE inter * 20 >= 19 * (sa.n + sb.n - inter)),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
         tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                 FROM e e1 JOIN e e2 ON e2.a = e1.b
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         ds AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices,
                       CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
         ec AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
         SELECT ds.n_vertices, ec.n_edges, ds.n_wedges, tri.n_triangles,
                CASE WHEN ds.n_wedges > 0
                     THEN round(3.0 * tri.n_triangles / ds.n_wedges, 6) END AS clustering
         FROM ds, ec, tri""",
    "ev_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events
         ), y AS (
           SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                          THEN 1 ELSE 0 END AS brk
           FROM x
         ), z AS (
           SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM y
         )
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM z GROUP BY user_id, session_id""",
    "ev_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    "ev_sliding" ->
      """WITH half AS (
           SELECT event_type,
             to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) AS w0
           FROM events
         ), windows AS (
           SELECT event_type, unnest([w0, w0 - INTERVAL 30 MINUTE]) AS window_start
           FROM half
         )
         SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS n
         FROM windows GROUP BY 1, 2""",
    "ev_asof_join" -> evAsofJoinSql,
    "ev_asof_forward" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p0 AS (SELECT user_id, ts, value,
                  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'),
         p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
         SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
                epoch_us(p.ts) AS purchase_us, p.value AS purchase_value
         FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts""",
    // nearest twin: backward + forward DuckDB ASOF joins combined with the,
    // same strict-< forward pick and backward tie rule the engine applies
    "ev_asof_nearest" -> evAsofNearestSql,
    "ev_range_join" ->
      """WITH anchors AS (SELECT event_id AS anchor_id, user_id, ts AS a_ts FROM events WHERE event_type = 'error'),
         near AS (
           SELECT a.anchor_id, count(*) AS n_nearby, sum(CAST(e.value AS DECIMAL(18,2))) AS sv
           FROM anchors a JOIN events e
             ON e.user_id = a.user_id AND e.event_id <> a.anchor_id
            AND abs(epoch_us(e.ts) - epoch_us(a.a_ts)) <= 1800000000
           GROUP BY 1)
         SELECT a.anchor_id, a.user_id, epoch_us(a.a_ts) AS ts_us,
                coalesce(n.n_nearby, 0) AS n_nearby,
                CAST(coalesce(n.sv, 0) AS DOUBLE) AS total_value
         FROM anchors a LEFT JOIN near n USING (anchor_id)""",
    "ev_cumulative_uniques" ->
      """WITH ev AS (SELECT user_id AS k, CAST(ts AS DATE) AS day FROM events),
         act AS (SELECT day, CAST(count(DISTINCT k) AS BIGINT) AS n_active FROM ev GROUP BY 1),
         fs AS (SELECT k, min(day) AS day FROM ev GROUP BY 1),
         nw AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM fs GROUP BY 1)
         SELECT a.day, a.n_active, coalesce(n.n_new, 0) AS n_new,
                CAST(sum(coalesce(n.n_new, 0)) OVER
                     (ORDER BY a.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum_users
         FROM act a LEFT JOIN nw n ON n.day = a.day""",
    // ER twin: the fuzzy-pair CTEs verbatim + the recursive reach closure,
    // side bakes as literals, so num/den are integer sums in both engines
    "ts_ewma" ->
      """WITH e AS (SELECT user_id, event_id, ts,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
                    FROM events WHERE value IS NOT NULL),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM e)
         SELECT a.user_id, a.event_id, epoch_us(a.ts) AS ts_us,
                CAST(count(*) AS INTEGER) AS n_window,
                round(CAST(sum(b.q * CASE a.rn - b.rn
                         WHEN 0 THEN 16384 WHEN 1 THEN 12288 WHEN 2 THEN 9216 WHEN 3 THEN 6912
                         WHEN 4 THEN 5184 WHEN 5 THEN 3888 WHEN 6 THEN 2916 WHEN 7 THEN 2187
                       END) AS DOUBLE) /
                      CAST(sum(CASE a.rn - b.rn
                         WHEN 0 THEN 16384 WHEN 1 THEN 12288 WHEN 2 THEN 9216 WHEN 3 THEN 6912
                         WHEN 4 THEN 5184 WHEN 5 THEN 3888 WHEN 6 THEN 2916 WHEN 7 THEN 2187
                       END) * 100 AS DOUBLE), 6) AS ewma
         FROM r a JOIN r b
           ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
         GROUP BY a.user_id, a.event_id, a.ts""",
    "ev_rolling" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum,
           count(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_window
         FROM events""",
    // DuckDB sums BIGINT into HUGEINT — cast S/Q back before the Long,
    // products (the dsir-oracle lesson)
    "ev_anomaly_roll" ->
      """WITH q AS (
           SELECT event_id, user_id, ts, CAST(floor(value * 100) AS BIGINT) AS c
           FROM events
         ), w AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, c,
             CAST(sum(c) OVER win AS BIGINT) AS win_sum,
             CAST(sum(c * c) OVER win AS BIGINT) AS win_sumsq,
             CAST(count(*) OVER win AS BIGINT) AS n_window
           FROM q
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
         )
         SELECT event_id, user_id, ts_us, n_window, win_sum,
                (n_window * c - win_sum) * (n_window * c - win_sum) >
                  9 * (n_window * win_sumsq - win_sum * win_sum) AS flagged
         FROM w""",
    "ev_resample_ffill" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
                    FROM events GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS gts FROM b),
         p0 AS (SELECT user_id, ts, value,
                  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events),
         p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
         SELECT g.user_id, epoch_us(g.gts) AS gts_us,
                epoch_us(p.ts) AS last_ts_us, p.value AS last_value
         FROM grid g ASOF LEFT JOIN p ON g.user_id = p.user_id AND g.gts >= p.ts""",
    "ev_cohort_retention" ->
      """WITH c AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1),
         e AS (SELECT user_id, date_trunc('week', ts) AS w FROM events)
         SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
                CAST(date_diff('day', c.cw, e.w) / 7 AS BIGINT) AS week_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN c USING (user_id)
         GROUP BY 1, 2""",
    "ev_transitions" ->
      """SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
         FROM (
           SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS from_type,
                  event_type AS to_type
           FROM events) t
         WHERE from_type IS NOT NULL
         GROUP BY 1, 2""",
    // micros-exact bucketing and winner ordering mirror resampleLocf,
    "ts_resample_locf" ->
      """WITH ev AS (SELECT user_id AS k, epoch_us(ts) AS e, event_id, value FROM events),
         ev2 AS (SELECT k, e // 86400000000 AS bucket, e, event_id, value FROM ev),
         win AS (SELECT k, bucket, value AS v FROM (
           SELECT k, bucket, value,
                  row_number() OVER (PARTITION BY k, bucket ORDER BY e DESC, event_id DESC) AS rn
           FROM ev2) WHERE rn = 1),
         span AS (SELECT k, min(bucket) AS blo, max(bucket) AS bhi FROM win GROUP BY k),
         grid AS (SELECT k, unnest(generate_series(blo, bhi)) AS bucket FROM span)
         SELECT g.k AS user_id, g.bucket,
                last_value(w.v IGNORE NULLS) OVER (
                  PARTITION BY g.k ORDER BY g.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
                w.k IS NOT NULL AS observed
         FROM grid g LEFT JOIN win w ON g.k = w.k AND g.bucket = w.bucket""",
    "graph_pagerank" -> pagerankOracleSql,
    "graph_label_prop" -> labelPropOracleSql,
    "graph_bfs" -> bfsOracleSql,
    "graph_bfs_fixpoint" -> bfsFixpointOracleSql,
    "graph_kcore" -> kcoreOracleSql,
    "graph_label_prop_fixpoint" -> labelPropFixpointOracleSql,
    "graph_kcore_fixpoint" -> kcoreFixpointOracleSql,
    // latest click at-or-before each purchase; same-instant ties to the,
    // greatest click id (the asofJoin tie contract)
    "ev_attribution_last_touch" ->
      """WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS cts, event_id AS cid FROM events WHERE event_type = 'click'),
         j AS (SELECT p.user_id, p.ts, p.event_id, c.cid, c.cts,
                 row_number() OVER (PARTITION BY p.user_id, p.event_id
                                    ORDER BY c.cts DESC, c.cid DESC) AS rn
               FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.cts <= p.ts)
         SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us,
                cid AS click_id, epoch_us(cts) AS click_us
         FROM j WHERE rn = 1""",
    // linear attribution twin: same integer-cents split over the same
    // 3-day lookback, remainder to the most recent click (greatest id on,
    // a timestamp tie)
    "ev_attribution_linear" -> evAttributionLinearSql,
    // U-shape twin: same 3-day lookback, 40/20/40 split in integer cents,
    // remainders to the most recent touch (all operands non-negative, so,
    // Spark's truncating div and DuckDB's floor // agree)
    "ev_attribution_ushape" ->
      """WITH p AS (SELECT user_id, ts, event_id AS purchase_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS cts, event_id AS click_id
               FROM events WHERE event_type = 'click'),
         j AS (SELECT p.user_id, p.purchase_id, p.cents, x.click_id, x.cts
               FROM p JOIN c x ON x.user_id = p.user_id AND x.cts <= p.ts
                              AND x.cts >= p.ts - INTERVAL 3 DAY),
         w AS (SELECT user_id, purchase_id, click_id, cents,
                 CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
                 row_number() OVER (PARTITION BY purchase_id ORDER BY cts DESC, click_id DESC) AS rn
               FROM j)
         SELECT user_id, purchase_id, click_id, n_touches,
                CASE WHEN n_touches = 1 THEN 'solo'
                     WHEN rn = 1 THEN 'last'
                     WHEN rn = n_touches THEN 'first'
                     ELSE 'middle' END AS role,
                CAST(CASE WHEN n_touches = 1 THEN cents
                     WHEN n_touches = 2 THEN
                       CASE WHEN rn = 1 THEN cents - cents // 2 ELSE cents // 2 END
                     WHEN rn = n_touches THEN cents * 40 // 100
                     WHEN rn = 1 THEN cents * 40 // 100 +
                       ((cents - 2 * (cents * 40 // 100)) -
                        ((cents - 2 * (cents * 40 // 100)) // (n_touches - 2)) * (n_touches - 2))
                     ELSE (cents - 2 * (cents * 40 // 100)) // (n_touches - 2) END AS BIGINT) AS credit_cents
         FROM w""",
    "ev_funnel" ->
      """WITH a AS (
           SELECT user_id, min(CASE WHEN event_type = 'click' THEN ts END) AS c_ts
           FROM events GROUP BY 1),
         conv AS (
           SELECT e.user_id, min(e.ts) AS p_ts, CAST(count(*) AS BIGINT) AS n_purchases_after
           FROM events e JOIN a ON a.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= a.c_ts
           GROUP BY 1)
         SELECT a.user_id, epoch_us(a.c_ts) AS click_us,
                epoch_us(conv.p_ts) AS purchase_us,
                epoch_us(conv.p_ts) - epoch_us(a.c_ts) AS latency_us,
                coalesce(conv.n_purchases_after, 0) AS n_purchases_after
         FROM a LEFT JOIN conv ON conv.user_id = a.user_id
         WHERE a.c_ts IS NOT NULL""",
    "ev_props_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type""",
  )
}
