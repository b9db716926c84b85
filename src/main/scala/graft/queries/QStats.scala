package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** Stats & sketch family: quantiles, correlation, drift tests, outliers,
  * bootstrap, HLL/KLL/KMV/CountMin/Bloom sketches, skew audits.
  *
  * Split out of Extensions.scala (round 15): same entries, same maps —
  * [[Extensions]] aggregates the families, so the driver contract
  * (SparkEntry.queries / oracleSql) is unchanged.
  */
private[queries] object QStats {
  import QShared._
  import OracleSql._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // fixture vocab size) with the exact count riding along as the audit
    "sketch_distinct_kmv" -> { (s, dir) =>
      val tokens = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      Sketches.kmvDistinct(tokens, col("token"), k = 16)
    },
    // (k=64: the estimation path is live; overlap fraction drives the rest)
    "sketch_kmv_setops" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      Sketches.kmvSetOps(
        li.filter(col("l_shipdate") < lit("1998-01-01")),
        col("l_partkey").cast("string"),
        li.filter(col("l_shipdate") >= lit("1998-01-01")),
        col("l_partkey").cast("string"),
        k = 64
      )
    },
    // compaction / bin-packing maintenance (the post-CDC layout pass):
    // a deliberately fragmented partitioned layout (12-way repartition
    // before partitionBy → ~12 small files per partition) is rewritten
    // into target-size files — same partitions, same rows, fewer files.
    // The returned frame is the compacted table's CONTENT, so the oracle
    // (the original table) proves the rewrite is a row-level bijection;,
    // validation twin of approx_percentile; integer inputs => engine-exact)
    "stats_quantiles" -> { (s, dir) =>
      Stats.exactQuantiles(
        t(s, dir, "documents"), col("n_chars"), Seq(0.25, 0.5, 0.75, 0.9))
    },
    // decile banding without ntile()-over-() (that global window is the
    // single-task sort the two-phase quantiles exist to avoid): 9 exact
    // cut points collected as bounded driver scalars, then map-only,
    // assignment by comparison fold
    "stats_deciles" -> { (s, dir) =>
      Stats
        .quantileBuckets(
          t(s, dir, "documents"), col("doc_id"), col("n_chars"),
          (1 to 9).map(_ / 10.0))
        .select(col("id").as("doc_id"), col("v"), col("q_bucket"))
    },
    // Pearson correlation chars~tokens via integer moment sums (the,
    // engine-exact alternative to corr()'s merge-order-dependent stream)
    "stats_corr" -> { (s, dir) =>
      Stats.corrExact(
        t(s, dir, "documents"), col("n_chars"), TextStats.tokenCount(col("text")))
    },
    // the grouped profile a curation user actually runs: corr(chars, tokens),
    // per source — keyed moments partial-aggregate, |sources| rows shuffle
    "stats_corr_by_source" -> { (s, dir) =>
      Stats.corrExactBy(
        t(s, dir, "documents"), col("source"), col("n_chars"),
        TextStats.tokenCount(col("text")))
    },
    // distribution-drift monitor: per-source two-sample KS distance of the
    // n_chars distribution between two md5-hash snapshot halves (id parity
    // won't do: the fixture derives source FROM doc_id, so parity is
    // constant within a source) — decimal(38,0) cross-product numerator,
    // one rounded double at the end, one-sided groups dropped (KS,
    // undefined, not zero)
    "stats_ks_drift" -> { (s, dir) =>
      Stats.ksDrift(
        t(s, dir, "documents"), col("source"), col("n_chars"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // deterministic round-robin source interleave (the dataloader order):
    // position p reads source p mod |S|, within-source order is the epoch-,
    // complement of the KS monitor, same integer cross-product discipline
    "stats_tvd_drift" -> { (s, dir) =>
      Stats.tvdDrift(
        t(s, dir, "documents"), col("source"), col("lang"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // scorecard-standard drift: per-source PSI of the lang mix between the
    // same md5 halves — log-weighted, so small-category shifts score high;,
    // Laplace-smoothed, 9-dp-quantized terms summed in exact decimal
    "stats_psi_drift" -> { (s, dir) =>
      Stats.psiDrift(
        t(s, dir, "documents"), col("source"), col("lang"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // bounded symmetric drift: per-source Jensen-Shannon divergence (base
    // 2, [0,1]) of the lang mix — the trendable companion to the PSI,
    // threshold alert; zero cells are finite by construction, no smoothing
    "stats_jsd_drift" -> { (s, dir) =>
      Stats.jsdDrift(
        t(s, dir, "documents"), col("source"), col("lang"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // drift SIGNIFICANCE: Welch's unequal-variance t per event_type on the
    // cent-quantized value between md5 halves — exact decimal moments, a,
    // transcendental-free IEEE tail, + Welch–Satterthwaite df
    "stats_welch_t" -> { (s, dir) =>
      Stats.welchT(
        Fixtures.events(s, dir).filter(col("value").isNotNull),
        col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long"),
        graft.ops.Hashing.md5Mod(col("event_id").cast("string"), 2L) === 0)
    },
    // uncertainty at scale: Poisson-bootstrap CI for per-type mean cents —
    // B=32 deterministic Poisson(1) weight columns, ALL replicate sums in
    // ONE partial-agg'd pass (never B resampling shuffles), CI row-local,
    // off the sorted replicate array
    "stats_bootstrap_ci" -> { (s, dir) =>
      Stats.bootstrapMeanCI(
        Fixtures.events(s, dir),
        col("event_type"), col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long"),
        reps = 32)
    },
    // growth accounting: per-day new/retained/resurrected/churning user
    // decomposition (7-day gap, churn right-censored at the data edge);,
    // scale to NULL, never ±∞
    "stats_robust_scale" -> { (s, dir) =>
      Stats.robustScale(
        t(s, dir, "documents"), col("source"), col("doc_id"), col("n_chars"))
    },
    // change-point LOCALIZATION: per-event-type CUSUM over daily cents —
    // the WHEN companion to the KS/TVD/PSI drift monitors; all-integer,
    // scaled walk Σ(N·x − S_N), |peak| at the last pre-shift day
    "stats_cusum_changepoint" -> { (s, dir) =>
      Stats.cusumChangepoint(
        Fixtures.events(s, dir),
        col("event_type"), to_date(col("ts")),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
    },
    // categorical ASSOCIATION audit: per-source chi-square of independence
    // between lang and a length bucket + Cramér's V effect size — zero
    // cells folded in algebraically (χ² = n + Σ_obs[(O−E)²/E − E]), exact,
    // decimal margins, 9-dp-quantized IEEE terms in an exact decimal sum
    "stats_chi2_assoc" -> { (s, dir) =>
      Stats.chi2Assoc(
        t(s, dir, "documents"),
        col("source"), col("lang"), expr("least(n_chars div 150, 5L)"))
    },
    // Unicode NFC canonicalization (the native graft_nfc Expression):
    // decomposed suffixes (e+combining acute, A+combining ring) are
    // composed before digesting — both engines implement the same Unicode,
    // flip between engines
    "stats_outliers" -> { (s, dir) =>
      Stats.outliersExact(
        t(s, dir, "documents"), col("source"), col("doc_id"), col("n_chars"), k = 3)
    },
    // robust (median/MAD) outliers on event values — Hampel's k=3 rule in
    // the doubled-integer domain, so the interpolated medians are exact,
    // Longs and the flag can never flip on float rounding
    "stats_mad_outliers" -> { (s, dir) =>
      Stats.madOutliers(
        Fixtures
          .events(s, dir)
          .select(col("event_id"), expr("cast(floor(value * 100) as long)").as("cents")),
        col("event_id"), col("cents"), k = 3)
    },
    // EXACT heavy hitters via the count-min gate: output is identical to
    // the plain HAVING-threshold truth (count-min never underestimates),
    // but the exact pass's shuffle carries only gate survivors,
    // raw-row shuffle, TakeOrdered top-K
    "audit_key_skew" -> { (s, dir) =>
      graft.ops.SkewOps.keySkewAudit(Fixtures.events(s, dir), col("user_id"), topK = 20)
    },
    // skew-safe aggregation: the two-stage salted group-by, bit-identical,
    // summaries without rescanning either side
    "sketch_join_size" -> { (s, dir) =>
      val a = t(s, dir, "lineitem").select(col("l_orderkey").cast("string").as("k"))
      val b = t(s, dir, "orders").select(col("o_orderkey").cast("string").as("k"))
      val ca = Sketches.countMinCells(a, col("k"), depth = 4, width = 512)
      val cb = Sketches.countMinCells(b, col("k"), depth = 4, width = 512)
      Sketches
        .countMinJoinSize(ca, cb, depth = 4)
        // two one-row frames: the cross join is a scalar attach
        .crossJoin(a.join(b, "k").agg(count(lit(1)).as("true_join_rows")))
    },
    // weighted exact-k draw (Efraimidis–Spirakis A-Res): probability
    // proportional to n_chars, without replacement — the length-weighted,
    "stats_median_by_source" -> { (s, dir) =>
      Stats
        .groupedQuantile(t(s, dir, "documents"), col("source"), col("n_chars"), p = 0.5)
        .select(col("grp").as("source"), col("q").as("median"))
    },
    // count-min point-frequency estimates for probe tokens, exact counts,
    // riding along as the audit ("zebra" is absent from the fixture vocab)
    "sketch_countmin" -> { (s, dir) =>
      import s.implicits._
      val tokens = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      val cells = Sketches.countMinCells(tokens, col("token"), depth = 4, width = 256)
      val probes = Seq("spark", "table", "the", "zebra").toDF("item")
      val est = Sketches.countMinEstimate(cells, probes, col("item"), depth = 4, width = 256)
      val exact = tokens.groupBy(col("token").as("item")).agg(count(lit(1)).as("exact"))
      est
        .join(exact, Seq("item"), "left")
        .select(col("item").as("token"), col("est"), coalesce(col("exact"), lit(0L)).as("exact"))
    },
    // HyperLogLog register table: the integer-exact, mergeable-by-max half
    // of HLL (the float estimate stays driver-side; see Sketches scaladoc).,
    // 2^8 = 256 registers over ~10k distinct custkeys
    "sketch_hll_registers" -> { (s, dir) =>
      Sketches.hllRegisters(t(s, dir, "orders"), col("o_custkey"), p = 8)
    },
    // per-group HLL rollup unit: one register table per order status —,
    // max-merge any subset of groups for their combined distinct count
    "sketch_hll_by_group" -> { (s, dir) =>
      Sketches.hllRegistersByGroup(
        t(s, dir, "orders"), col("o_orderstatus"), col("o_custkey"), p = 8)
    },
    // mergeable quantile sketch (KLL-style levels, hash-derandomized):
    // level-4 gate keeps ~1/16 of orders at weight 16; deciles read off
    // the (value, key)-ranked sample. Engine-exact: the md5 gate, the,
    // string-keyed tie order, and the double ceil all replay in DuckDB.
    "sketch_kll_quantiles" -> { (s, dir) =>
      val sk = Sketches.kllSketch(
        t(s, dir, "orders"), col("o_totalprice"), col("o_orderkey"), level = 4)
      Sketches.kllQuantiles(sk, (1 to 9).map(_ / 10.0))
    },
    // per-group profile quartiles off one grouped sketch pass — the,
    // per-source/per-language distribution report at sketch cost
    "sketch_kll_by_group" -> { (s, dir) =>
      val sk = Sketches.kllSketchGrouped(
        t(s, dir, "orders"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"), level = 3)
      Sketches.kllQuantilesByGroup(sk, col("grp"), Seq(0.25, 0.5, 0.75))
    },
    // Bloom-filter membership (one-sided error): build the bit set over
    // custkeys that have orders, probe every customer, and ride the exact
    // membership along as the audit column — rows where maybe=true but,
    // actual=false ARE the sketch's false positives, visible in the output
    "sketch_bloom_probe" -> { (s, dir) =>
      val bits = Sketches.bloomBits(
        t(s, dir, "orders"), col("o_custkey"), m = 65536L, k = 3)
      val probed = Sketches.bloomProbe(
        bits, t(s, dir, "customer"), col("c_custkey"), m = 65536L, k = 3)
      val actual = t(s, dir, "orders")
        .select(col("o_custkey").cast("string").as("item"))
        .distinct()
        .withColumn("actual", lit(true))
      probed
        .join(actual, Seq("item"), "left")
        .select(
          col("item").as("custkey"),
          col("maybe"),
          coalesce(col("actual"), lit(false)).as("actual"))
    },
  )

  val oracles: Map[String, String] = Map(
    "stats_bootstrap_ci" -> bootstrapOracleSql(32),
    // growth-accounting twin: lag/lead over distinct user-days + the,
    // median_by_source discipline — never trust quantile_cont parity)
    "stats_robust_scale" ->
      """WITH v AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v FROM documents),
         r AS (SELECT grp, v,
                 CAST(row_number() OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
               FROM v),
         q AS (SELECT grp,
                 max(CASE WHEN rn = CAST(floor((n-1) * 0.25) AS BIGINT) + 1 THEN v END) AS vlo25,
                 max(CASE WHEN rn = CAST(ceil((n-1) * 0.25) AS BIGINT) + 1 THEN v END) AS vhi25,
                 max(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1 THEN v END) AS vlo50,
                 max(CASE WHEN rn = CAST(ceil((n-1) * 0.5) AS BIGINT) + 1 THEN v END) AS vhi50,
                 max(CASE WHEN rn = CAST(floor((n-1) * 0.75) AS BIGINT) + 1 THEN v END) AS vlo75,
                 max(CASE WHEN rn = CAST(ceil((n-1) * 0.75) AS BIGINT) + 1 THEN v END) AS vhi75,
                 max((n-1) * 0.25) AS p25, max(CAST(floor((n-1) * 0.25) AS BIGINT)) AS l25,
                 max((n-1) * 0.5) AS p50, max(CAST(floor((n-1) * 0.5) AS BIGINT)) AS l50,
                 max((n-1) * 0.75) AS p75, max(CAST(floor((n-1) * 0.75) AS BIGINT)) AS l75
               FROM r GROUP BY grp),
         s AS (SELECT grp,
                 CAST(vlo25 AS DOUBLE) + (CAST(vhi25 AS DOUBLE) - CAST(vlo25 AS DOUBLE)) * (p25 - CAST(l25 AS DOUBLE)) AS q25,
                 CAST(vlo50 AS DOUBLE) + (CAST(vhi50 AS DOUBLE) - CAST(vlo50 AS DOUBLE)) * (p50 - CAST(l50 AS DOUBLE)) AS q50,
                 CAST(vlo75 AS DOUBLE) + (CAST(vhi75 AS DOUBLE) - CAST(vlo75 AS DOUBLE)) * (p75 - CAST(l75 AS DOUBLE)) AS q75
               FROM q)
         SELECT d.source AS grp, d.doc_id AS id, CAST(d.n_chars AS BIGINT) AS v,
                s.q50 AS median, s.q75 - s.q25 AS iqr,
                CASE WHEN s.q75 - s.q25 > 0
                     THEN round((CAST(d.n_chars AS DOUBLE) - s.q50) / (s.q75 - s.q25), 6)
                END AS scaled
         FROM documents d JOIN s ON s.grp = d.source""",
    "stats_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type AS grp, CAST(ts AS DATE) AS day,
                CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS HUGEINT) AS x
              FROM events GROUP BY 1, 2),
         r AS (SELECT *,
                 CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS ndays,
                 CAST(sum(x) OVER (PARTITION BY grp) AS HUGEINT) AS sn
               FROM daily),
         c AS (SELECT *,
                 CAST(sum(x * ndays - sn)
                   OVER (PARTITION BY grp ORDER BY day ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cw
               FROM r),
         p AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY abs(cw) DESC, day) AS pick
               FROM c)
         SELECT grp, ndays AS n_days, day AS cp_day, CAST(abs(cw) AS BIGINT) AS max_abs_cusum
         FROM p WHERE pick = 1""",
    "sketch_distinct_kmv" ->
      """WITH tok AS (
           SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM documents
         ), tok2 AS (SELECT t FROM tok WHERE length(t) > 0),
         h AS (SELECT DISTINCT CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) AS h FROM tok2),
         kmin AS (SELECT h FROM h ORDER BY h LIMIT 16),
         agg AS (SELECT max(h) AS kth_min, CAST(count(*) AS BIGINT) AS k_actual FROM kmin)
         SELECT CAST(16 AS BIGINT) AS k, k_actual, kth_min,
           CASE WHEN k_actual < 16 THEN k_actual ELSE (15 * 4294967296) // kth_min END AS est_distinct
         FROM agg""",
    "sketch_kmv_setops" ->
      """WITH ha AS (SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
                     FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'),
         kha AS (SELECT h FROM ha ORDER BY h LIMIT 64),
         hb AS (SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
                FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'),
         khb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
         u AS (SELECT DISTINCT h FROM (SELECT h FROM kha UNION ALL SELECT h FROM khb) ORDER BY h LIMIT 64),
         agg AS (SELECT max(h) AS kth_min, CAST(count(*) AS BIGINT) AS k_actual,
                        CAST(sum(CASE WHEN h IN (SELECT h FROM kha) AND h IN (SELECT h FROM khb)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS overlap
                 FROM u),
         est AS (SELECT k_actual, kth_min, overlap,
                        CASE WHEN k_actual < 64 THEN k_actual
                             ELSE (63 * 4294967296) // kth_min END AS est_union
                 FROM agg)
         SELECT CAST(64 AS BIGINT) AS k, k_actual, kth_min, est_union, overlap,
                (overlap * est_union) // k_actual AS est_intersect,
                (overlap * 10000) // k_actual AS jaccard_bp
         FROM est""",
    // per-row unrolled bit interleave — (l_orderkey, l_linenumber) is NOT,
    "stats_quantiles" ->
      """WITH v AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents),
         r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
         p AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                              CAST(0.75 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p),
         k AS (SELECT p, (n - 1) * p AS pos,
                      CAST(floor((n - 1) * p) AS BIGINT) AS lo,
                      CAST(ceil((n - 1) * p) AS BIGINT) AS hi
               FROM p, c)
         SELECT k.p,
                CAST(a.v AS DOUBLE) + (CAST(b.v AS DOUBLE) - CAST(a.v AS DOUBLE)) * (k.pos - CAST(k.lo AS DOUBLE)) AS q
         FROM k JOIN r a ON a.rn = k.lo + 1 JOIN r b ON b.rn = k.hi + 1""",
    "stats_deciles" ->
      """WITH v AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents
                    WHERE n_chars IS NOT NULL),
         r AS (SELECT v AS sv, row_number() OVER (ORDER BY v) AS rn FROM v),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
         p AS (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE), CAST(0.3 AS DOUBLE),
                              CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.6 AS DOUBLE),
                              CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p),
         k AS (SELECT p, (n - 1) * p AS pos,
                      CAST(floor((n - 1) * p) AS BIGINT) AS lo,
                      CAST(ceil((n - 1) * p) AS BIGINT) AS hi
               FROM p, c),
         cuts AS (
           SELECT CAST(a.sv AS DOUBLE) +
                  (CAST(b.sv AS DOUBLE) - CAST(a.sv AS DOUBLE)) * (k.pos - CAST(k.lo AS DOUBLE)) AS q
           FROM k JOIN r a ON a.rn = k.lo + 1 JOIN r b ON b.rn = k.hi + 1)
         SELECT v.doc_id, v.v,
                CAST(1 + sum(CASE WHEN CAST(v.v AS DOUBLE) > cu.q THEN 1 ELSE 0 END) AS INTEGER)
                  AS q_bucket
         FROM v CROSS JOIN cuts cu
         GROUP BY 1, 2""",
    "stats_outliers" ->
      """WITH m AS (
           SELECT source,
                  CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(n_chars) AS HUGEINT) AS s,
                  CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS ss
           FROM documents GROUP BY source)
         SELECT d.source AS grp, d.doc_id AS id, CAST(d.n_chars AS BIGINT) AS x,
                ((m.n * d.n_chars - m.s) * (m.n * d.n_chars - m.s)) > 9 * (m.n * m.ss - m.s * m.s) AS is_outlier
         FROM documents d JOIN m USING (source)""",
    // doubled-integer median/MAD: quantile_cont on even ints is integral,
    // so the CASTs are exact and the flag is pure Long arithmetic,
    "stats_mad_outliers" ->
      """WITH v AS (SELECT event_id AS id, CAST(floor(value * 100) AS BIGINT) AS x
                    FROM events WHERE value IS NOT NULL),
         m AS (SELECT CAST(quantile_cont(2 * x, 0.5) AS BIGINT) AS med2 FROM v),
         d AS (SELECT v.id, v.x, 2 * abs(2 * v.x - m.med2) AS dev4, m.med2 FROM v, m),
         mm AS (SELECT CAST(quantile_cont(dev4, 0.5) AS BIGINT) AS mad4 FROM d)
         SELECT d.id, d.x, d.dev4, d.med2, mm.mad4,
                d.dev4 > 3 * mm.mad4 AS is_outlier
         FROM d, mm""",
    // the heavy-hitter gate is exact (count-min only overestimates), so,
    "stats_corr" ->
      """WITH b AS (SELECT CAST(n_chars AS BIGINT) AS x,
           CAST(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS y
           FROM documents),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM b)
         -- moments stay HUGEINT (the engine mirrors with decimal(38,0)),
         -- exact to ±1.7e38; only the final scalars narrow to DOUBLE
         SELECT n, CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
         FROM a""",
    "audit_key_skew" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(cnt) AS HUGEINT) AS tot, CAST(count(*) AS BIGINT) AS n_keys
               FROM c)
         SELECT key, cnt, n_keys,
                CAST(CAST(cnt AS HUGEINT) * 1000000 // tot AS BIGINT) AS share_ppm,
                CAST(CAST(cnt AS HUGEINT) * 1000 * n_keys // tot AS BIGINT) AS hot_x_milli
         FROM c, t ORDER BY cnt DESC, key ASC LIMIT 20""",
    "sketch_join_size" ->
      """WITH a AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
         b AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
         ca AS (SELECT j,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', k)), 1, 8))
                    AS BIGINT) % 512 AS cell,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM a, range(0, 4) t(j) GROUP BY 1, 2),
         cb AS (SELECT j,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', k)), 1, 8))
                    AS BIGINT) % 512 AS cell,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM b, range(0, 4) t(j) GROUP BY 1, 2),
         ip AS (SELECT ca.j, sum(CAST(ca.cnt AS HUGEINT) * cb.cnt) AS ip
                FROM ca JOIN cb ON ca.j = cb.j AND ca.cell = cb.cell GROUP BY 1),
         est AS (SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) AS est_join_rows
                 FROM range(0, 4) t(j) LEFT JOIN ip ON ip.j = t.j),
         tr AS (SELECT CAST(count(*) AS BIGINT) AS true_join_rows
                FROM a JOIN b USING (k))
         SELECT est_join_rows, true_join_rows FROM est, tr""",
    "stats_corr_by_source" ->
      """WITH b AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS x,
           CAST(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS y
           FROM documents),
         a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                      sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM b GROUP BY grp)
         SELECT grp, n, CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
         FROM a""",
    // KS replay: same pooled-distinct-value formulation, HUGEINT cross
    // products, one rounded double ratio
    // interleave twin: same md5 epoch salt, same (hash, id) within-source,
    "stats_tvd_drift" ->
      """WITH base AS (SELECT source AS grp, lang AS cat,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, cat,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         tot AS (SELECT grp, cat, ca, cb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb
                 FROM cnt)
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(sum(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)) AS DOUBLE) /
                      (2.0 * CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)), 6) AS tvd
         FROM tot GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_ks_drift" ->
      """WITH base AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, v,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         cum AS (SELECT grp,
                   CAST(sum(ca) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cuma,
                   CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cumb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb
                 FROM cnt)
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(max(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)) AS DOUBLE) /
                      (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)), 6) AS ks
         FROM cum GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_psi_drift" ->
      """WITH base AS (SELECT source AS grp, lang AS cat,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, cat,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         tot AS (SELECT grp, ca, cb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb,
                   CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS ncat
                 FROM cnt),
         trm AS (SELECT grp, na, nb,
                   CAST(round((p - q) * ln(p / q), 9) AS DECIMAL(28,9)) AS term
                 FROM (SELECT grp, na, nb,
                         CAST(ca + 1 AS DOUBLE) / CAST(na + ncat AS DOUBLE) AS p,
                         CAST(cb + 1 AS DOUBLE) / CAST(nb + ncat AS DOUBLE) AS q
                       FROM tot))
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(sum(term) AS DOUBLE), 6) AS psi
         FROM trm GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_welch_t" ->
      """WITH base AS (SELECT event_type AS grp,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  (CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM events WHERE value IS NOT NULL),
         m AS (SELECT grp,
                 sum(CASE WHEN a THEN 1 ELSE 0 END) AS na,
                 sum(CASE WHEN a THEN 0 ELSE 1 END) AS nb,
                 sum(CASE WHEN a THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
                 sum(CASE WHEN a THEN 0 ELSE CAST(v AS HUGEINT) END) AS sb,
                 sum(CASE WHEN a THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS qa,
                 sum(CASE WHEN a THEN 0 ELSE CAST(v AS HUGEINT) * v END) AS qb
               FROM base GROUP BY grp
               HAVING na >= 2 AND nb >= 2),
         vv AS (SELECT grp, na, nb, sa, sb,
                  CAST(CAST(na AS HUGEINT) * qa - sa * sa AS DOUBLE) /
                    CAST(CAST(na AS HUGEINT) * (na - 1) AS DOUBLE) AS va,
                  CAST(CAST(nb AS HUGEINT) * qb - sb * sb AS DOUBLE) /
                    CAST(CAST(nb AS HUGEINT) * (nb - 1) AS DOUBLE) AS vb
                FROM m),
         se AS (SELECT grp, na, nb, sa, sb,
                  va / CAST(na AS DOUBLE) AS sea, vb / CAST(nb AS DOUBLE) AS seb
                FROM vv)
         SELECT grp, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                round((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
                       CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / sqrt(sea + seb), 6) AS t,
                round(((sea + seb) * (sea + seb)) /
                      (sea * sea / CAST(na - 1 AS DOUBLE) + seb * seb / CAST(nb - 1 AS DOUBLE)), 4) AS df
         FROM se WHERE sea + seb > 0""",
    "stats_jsd_drift" ->
      """WITH base AS (SELECT source AS grp, lang AS cat,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, cat,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         tot AS (SELECT grp, ca, cb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb
                 FROM cnt),
         trm AS (SELECT grp, na, nb,
                   CAST(round(
                     0.5 * (CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0.0 END) +
                     0.5 * (CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0.0 END), 9) AS DECIMAL(28,9)) AS term
                 FROM (SELECT grp, na, nb, p, q, (p + q) / 2.0 AS m
                       FROM (SELECT grp, na, nb,
                               CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS p,
                               CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS q
                             FROM tot WHERE na > 0 AND nb > 0)))
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(sum(term) AS DOUBLE) / 0.6931471805599453, 6) AS jsd
         FROM trm GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_chi2_assoc" ->
      """WITH base AS (SELECT source AS grp, lang AS x, least(n_chars // 150, 5) AS y
                FROM documents),
         cells AS (SELECT grp, x, y, CAST(count(*) AS HUGEINT) AS o
                   FROM base GROUP BY 1, 2, 3),
         rk AS (SELECT *,
                  dense_rank() OVER (PARTITION BY grp ORDER BY x) AS drx,
                  dense_rank() OVER (PARTITION BY grp ORDER BY y) AS dry
                FROM cells),
         marg AS (SELECT grp, o,
                    CAST(sum(o) OVER (PARTITION BY grp) AS HUGEINT) AS n,
                    CAST(sum(o) OVER (PARTITION BY grp, x) AS HUGEINT) AS rt,
                    CAST(sum(o) OVER (PARTITION BY grp, y) AS HUGEINT) AS ct,
                    max(drx) OVER (PARTITION BY grp) AS r,
                    max(dry) OVER (PARTITION BY grp) AS c
                  FROM rk),
         trm AS (SELECT grp, n, r, c,
                   CAST(round(
                     CAST(o * n - rt * ct AS DOUBLE) * CAST(o * n - rt * ct AS DOUBLE) /
                       CAST(n * rt * ct AS DOUBLE) -
                     CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9)) AS term
                 FROM marg),
         agg AS (SELECT grp, CAST(max(n) AS BIGINT) AS n,
                   CAST(max(r) AS BIGINT) AS r, CAST(max(c) AS BIGINT) AS c,
                   round(CAST(max(n) AS DOUBLE) + CAST(sum(term) AS DOUBLE), 6) AS chi2
                 FROM trm GROUP BY grp
                 HAVING max(r) >= 2 AND max(c) >= 2)
         SELECT grp, n, r, c, (r - 1) * (c - 1) AS dof, chi2,
                round(sqrt(chi2 / (CAST(n AS DOUBLE) *
                                   CAST(least(r - 1, c - 1) AS DOUBLE))), 6) AS cramers_v
         FROM agg""",
    "stats_median_by_source" ->
      """WITH v AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
         r AS (SELECT g, v,
                 row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY g) AS n
               FROM v),
         k AS (SELECT g, v, rn, (n - 1) * CAST(0.5 AS DOUBLE) AS pos,
                      CAST(floor((n - 1) * CAST(0.5 AS DOUBLE)) AS BIGINT) AS lo,
                      CAST(ceil((n - 1) * CAST(0.5 AS DOUBLE)) AS BIGINT) AS hi
               FROM r),
         f AS (SELECT g,
                 max(CASE WHEN rn = lo + 1 THEN v END) AS vlo,
                 max(CASE WHEN rn = hi + 1 THEN v END) AS vhi,
                 max(pos) AS pos, max(lo) AS lo
               FROM k WHERE rn = lo + 1 OR rn = hi + 1 GROUP BY g)
         SELECT g AS source,
                CAST(vlo AS DOUBLE) + (CAST(vhi AS DOUBLE) - CAST(vlo AS DOUBLE)) * (pos - CAST(lo AS DOUBLE)) AS median
         FROM f""",
    "sketch_countmin" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS item FROM documents),
         tok2 AS (SELECT item FROM tok WHERE length(item) > 0),
         cells AS (
           SELECT j,
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', item)), 1, 8)) AS BIGINT) % 256 AS cell,
             CAST(count(*) AS BIGINT) AS cnt
           FROM tok2, range(0, 4) t(j) GROUP BY 1, 2),
         probes AS (SELECT unnest(['spark', 'table', 'the', 'zebra']) AS item),
         pc AS (SELECT item, j,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', item)), 1, 8)) AS BIGINT) % 256 AS cell
                FROM probes, range(0, 4) t(j)),
         est AS (SELECT item, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
                 FROM pc LEFT JOIN cells USING (j, cell) GROUP BY 1),
         ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact FROM tok2 GROUP BY 1)
         SELECT e.item AS token, e.est, coalesce(x.exact, 0) AS exact
         FROM est e LEFT JOIN ex x USING (item)""",
    "sketch_hll_registers" -> {
      // restBits = 32 - p = 24; bit length as a sum of integer threshold
      // compares, mirroring the Spark side exactly (no float log2 anywhere)
      val bitlen = (0 until 24).map(k => s"CAST(rest >= ${1L << k} AS INTEGER)").mkString(" + ")
      s"""WITH it AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS item FROM orders),
         h AS (
           SELECT CAST(concat('0x', substr(md5(item), 1, 8)) AS BIGINT) AS h FROM it),
         r AS (SELECT h >> 24 AS register, h & ${(1L << 24) - 1} AS rest FROM h)
         SELECT register, max(CAST(24 - ($bitlen) + 1 AS INTEGER)) AS max_rho
         FROM r GROUP BY register"""
    },
    "sketch_hll_by_group" -> {
      val bitlen = (0 until 24).map(k => s"CAST(rest >= ${1L << k} AS INTEGER)").mkString(" + ")
      s"""WITH it AS (
           SELECT DISTINCT o_orderstatus AS grp, CAST(o_custkey AS VARCHAR) AS item FROM orders),
         h AS (
           SELECT grp, CAST(concat('0x', substr(md5(item), 1, 8)) AS BIGINT) AS h FROM it),
         r AS (SELECT grp, h >> 24 AS register, h & ${(1L << 24) - 1} AS rest FROM h)
         SELECT grp, register, max(CAST(24 - ($bitlen) + 1 AS INTEGER)) AS max_rho
         FROM r GROUP BY grp, register"""
    },
    // lane family: position j = md5 hex chars 8j+1..8j+8 (digest lane j)
    // mod m — the Sketches.bloomPositions twin (one digest, four lanes)
    "sketch_bloom_probe" ->
      """WITH bk AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS item FROM orders),
         bits AS (
           SELECT DISTINCT
             CAST(concat('0x', substr(md5(item), 1 + 8 * CAST(j AS INTEGER), 8)) AS BIGINT)
               % 65536 AS bpos
           FROM bk, range(0, 3) t(j)),
         pr AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS item FROM customer),
         pp AS (
           SELECT item, j,
             CAST(concat('0x', substr(md5(item), 1 + 8 * CAST(j AS INTEGER), 8)) AS BIGINT)
               % 65536 AS pos
           FROM pr, range(0, 3) t(j)),
         mb AS (
           SELECT pp.item, count(b.bpos) = 3 AS maybe
           FROM pp LEFT JOIN bits b ON pp.pos = b.bpos
           GROUP BY pp.item)
         SELECT m.item AS custkey, m.maybe, (bk.item IS NOT NULL) AS actual
         FROM mb m LEFT JOIN bk ON m.item = bk.item""",
    // the gate, the string-keyed tie order, and the DOUBLE ceil (the list
    // literal is cast to DOUBLE[] — DuckDB's default DECIMAL probs would
    // round ceil(0.3*m) differently from IEEE doubles) replay the engine.
    // SHARED verbatim with stream_kll_parity: the sketch is a pure,
    // function of the multiset, so the streamed build must match exactly.
    "sketch_kll_quantiles" -> kllQuantilesSql,
    "sketch_kll_by_group" ->
      """WITH s AS (
           SELECT o_orderstatus AS grp, o_totalprice AS v, CAST(o_orderkey AS VARCHAR) AS k
           FROM orders
           WHERE o_totalprice IS NOT NULL
             AND CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 8 = 0
         ), r AS (
           SELECT grp, v,
                  row_number() OVER (PARTITION BY grp ORDER BY v, k) AS r,
                  count(*) OVER (PARTITION BY grp) AS m
           FROM s
         ), p AS (
           SELECT unnest(CAST([0.25,0.5,0.75] AS DOUBLE[])) AS prob
         )
         SELECT r.grp, p.prob, r.v AS est
         FROM p JOIN r ON r.r = greatest(1, CAST(ceil(p.prob * r.m) AS BIGINT))""",
  )
}
