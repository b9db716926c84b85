package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** DuckDB oracle-SQL builders shared by the query family files (split out
  * of Extensions.scala). Pure string land: no Spark session, no fixture
  * reads — each member replays one engine operator's arithmetic as
  * DuckDB-dialect SQL for the driver's differential gate.
  */
private[queries] object OracleSql {

  // ======================= DuckDB oracle twins =========================

  /** PageRank oracle: the three integer iterations unrolled as
    * (sᵢ = per-destination contribution sums, rᵢ = damped update) CTE
    * pairs — token-for-token the arithmetic of `GraphOps.pageRank`
    * (`(rank · w) div outw`, then `(85·Σ + 15·base) div 100`). DuckDB
    * promotes the sums to HUGEINT; the final CAST lands the identical
    * Long the engine produced.
    */
  private[queries] lazy val pagerankOracleSql: String = {
    val base = "(1000000000000 // (SELECT n FROM nn))"
    val iters = (1 to 3).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""s$i AS (SELECT e.dst AS node, sum((r.rank * e.w) // o.outw) AS si
         FROM e JOIN $prev r ON r.node = e.src JOIN outw o ON o.src = e.src GROUP BY 1),
         r$i AS (SELECT n.node, (85 * coalesce(s$i.si, 0) + 15 * $base) // 100 AS rank
         FROM nodes n LEFT JOIN s$i ON s$i.node = n.node)"""
    }.mkString(",\n         ")
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS e, event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS node FROM events),
       sq AS (SELECT node AS dst,
                lag(node) OVER (PARTITION BY user_id ORDER BY e, event_id) AS src FROM ev),
       e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM sq WHERE src IS NOT NULL GROUP BY 1, 2),
       nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       outw AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1),
       r0 AS (SELECT node, $base AS rank FROM nodes),
       $iters
       SELECT node, CAST(rank AS BIGINT) AS rank FROM r3"""
  }

  /** Label-propagation oracle: the setsim pair-graph CTE (shared with
    * graph_triangles) plus three unrolled synchronous LPA rounds —
    * mode-of-neighbor-labels with (count DESC, label) tie-break, the
    * pagerank-oracle unrolling pattern.
    */
  /** The τ=19/20 exact set-similarity pair-graph CTE chain (`e(a, b)` with
    * a < b) — the SQL twin of the shared setsim spill, composed by every
    * graph-family oracle (label propagation, k-core) so the edge
    * definition cannot drift between them.
    */
  private[queries] lazy val setsimEdgesCte: String =
    // MATERIALIZED throughout: the downstream graph oracles reference
    // these CTEs many times (unrolled rounds), and DuckDB's default
    // inlining re-evaluates a CTE per reference — the 4-round k-core
    // fixpoint oracle went 1019 s → 0.2 s with the hint. Semantics
    // unchanged (it is only an evaluation-strategy hint).
    s"""tok0 AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS token
                      FROM documents),
         tok AS MATERIALIZED (SELECT doc_id, token FROM tok0 WHERE length(token) > 0),
         sz AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
         pair AS MATERIALIZED (SELECT a.doc_id AS lo, b.doc_id AS hi, CAST(count(*) AS BIGINT) AS inter
                  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         e AS MATERIALIZED (SELECT lo AS a, hi AS b
               FROM pair JOIN sz sa ON sa.doc_id = lo JOIN sz sb ON sb.doc_id = hi
               WHERE inter * 20 >= 19 * (sa.n + sb.n - inter))"""

  /** The LPA round CTEs l1..lN, shared by the assignment oracle and its
    * fixpoint-certificate oracle so the two can never desynchronize. */
  private[queries] def lpaRoundsCte(n: Int): String =
    (1 to n).map { i =>
      val prev = s"l${i - 1}"
      s"""c$i AS MATERIALIZED (SELECT adj.v AS node, l.lab, CAST(count(*) AS BIGINT) AS c
         FROM adj JOIN $prev l ON l.node = adj.u GROUP BY 1, 2),
         l$i AS MATERIALIZED (SELECT node, lab FROM (
           SELECT node, lab, row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
           FROM c$i) WHERE rn = 1)"""
    }.mkString(",\n         ")

  private[queries] lazy val labelPropOracleSql: String =
    s"""WITH $setsimEdgesCte,
         adj AS MATERIALIZED (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
         l0 AS MATERIALIZED (SELECT DISTINCT v AS node, v AS lab FROM adj),
         ${lpaRoundsCte(3)}
         SELECT node, lab AS label FROM l3"""

  /** LPA fixpoint-certificate oracle: the same 3 unrolled rounds plus one
    * probe round, then count label moves between l3 and l4 — one row. */
  private[queries] lazy val labelPropFixpointOracleSql: String =
    s"""WITH $setsimEdgesCte,
         adj AS MATERIALIZED (SELECT a AS v, b AS u FROM e UNION ALL SELECT b AS v, a AS u FROM e),
         l0 AS MATERIALIZED (SELECT DISTINCT v AS node, v AS lab FROM adj),
         ${lpaRoundsCte(4)}
         SELECT CAST(3 AS INTEGER) AS iters,
                CAST(count(*) AS BIGINT) AS n_nodes,
                CAST(count(*) FILTER (WHERE a.lab <> b.lab) AS BIGINT) AS n_changed,
                count(*) FILTER (WHERE a.lab <> b.lab) = 0 AS converged
         FROM l3 a JOIN l4 b ON a.node = b.node"""

  /** k-core oracle: the setsim pair-graph CTE plus three unrolled
    * bulk-synchronous peel rounds (degree → survivors ≥ k → induced
    * edges), then the survivors' final degrees — the pagerank-oracle
    * unrolling pattern, k = 2.
    */
  /** The peel-round CTEs (degrees → alive ≥ k → induced edges) for rounds
    * 1..n plus the post-round degree frame d(n+1), shared by the k-core
    * oracle and its fixpoint-certificate oracle. */
  private[queries] def kcoreDegsCte(i: Int): String =
    s"""d$i AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
           (SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) GROUP BY 1)"""

  private[queries] def kcoreRoundsCte(n: Int, k: Int): String =
    (1 to n).map { i =>
      s"""${kcoreDegsCte(i)},
         a$i AS MATERIALIZED (SELECT node FROM d$i WHERE degree >= $k),
         e$i AS MATERIALIZED (SELECT u, v FROM e${i - 1}
                 WHERE u IN (SELECT node FROM a$i) AND v IN (SELECT node FROM a$i))"""
    }.mkString(",\n         ")

  private[queries] lazy val kcoreOracleSql: String = {
    val k = 2
    s"""WITH $setsimEdgesCte,
         e0 AS MATERIALIZED (SELECT a AS u, b AS v FROM e),
         ${kcoreRoundsCte(3, k)},
         ${kcoreDegsCte(4)}
         SELECT node, degree FROM d4 WHERE degree >= $k"""
  }

  /** k-core fixpoint-certificate oracle: the same 3 unrolled peel rounds
    * plus one probe round (round 4), then a full diff of the two
    * survivor (node, degree) sets — one row. */
  private[queries] lazy val kcoreFixpointOracleSql: String = {
    val k = 2
    s"""WITH $setsimEdgesCte,
         e0 AS MATERIALIZED (SELECT a AS u, b AS v FROM e),
         ${kcoreRoundsCte(4, k)},
         ${kcoreDegsCte(5)},
         sr AS MATERIALIZED (SELECT node, degree FROM d4 WHERE degree >= $k),
         sr1 AS MATERIALIZED (SELECT node, degree FROM d5 WHERE degree >= $k),
         j AS (SELECT a.node AS na, b.node AS nb
               FROM sr a FULL JOIN sr1 b ON a.node = b.node AND a.degree = b.degree)
         SELECT CAST(3 AS INTEGER) AS rounds,
                CAST(count(na) AS BIGINT) AS n_round_r,
                CAST(count(nb) AS BIGINT) AS n_round_r1,
                CAST(count(*) FILTER (WHERE na IS NULL OR nb IS NULL) AS BIGINT) AS n_diff,
                count(*) FILTER (WHERE na IS NULL OR nb IS NULL) = 0 AS at_fixpoint
         FROM j"""
  }

  /** k-center coreset oracle: the same greedy unrolled — c1 = smallest id,
    * then k−1 rounds of (fold newest center into min_d, argmax). The
    * distance is a correlated scalar subquery per round over the exact
    * quantized grid, so the walk replays the engine integer-for-integer. */
  private[queries] def coresetOracleSql(k: Int): String = {
    val dist = (qa: String, qb: String) =>
      s"list_sum(list_transform(range(1, 65), i -> ($qa[i] - $qb[i]) * ($qa[i] - $qb[i])))"
    val rounds = (2 to k).map { r =>
      s"""m$r AS MATERIALIZED (
           SELECT m.id, m.qv,
                  least(m.min_d, ${dist("m.qv", "c.qv")}) AS min_d
           FROM m${r - 1} m CROSS JOIN c${r - 1} c),
         c$r AS MATERIALIZED (
           SELECT id, qv, min_d FROM m$r ORDER BY min_d DESC, id ASC LIMIT 1)"""
    }.mkString(",\n         ")
    val out = (2 to k)
      .map(r =>
        s"SELECT CAST($r AS INTEGER) AS round, id AS vec_id, CAST(min_d AS BIGINT) AS dist_sq FROM c$r")
      .mkString("\n         UNION ALL ")
    s"""WITH q0 AS MATERIALIZED (
           SELECT vec_id AS id,
             list_transform(range(1, 65),
               i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
           FROM embeddings),
         c1 AS MATERIALIZED (SELECT id, qv FROM q0 ORDER BY id ASC LIMIT 1),
         m1 AS MATERIALIZED (
           SELECT q0.id, q0.qv, ${dist("q0.qv", "c.qv")} AS min_d
           FROM q0 CROSS JOIN c1 c),
         $rounds
         SELECT CAST(1 AS INTEGER) AS round, id AS vec_id, CAST(0 AS BIGINT) AS dist_sq FROM c1
         UNION ALL $out"""
  }

  /** Poisson-bootstrap oracle: the same B weight derivations, one grouped
    * pass, CI interpolation constants computed with the IDENTICAL Scala
    * arithmetic the engine's interp uses (embedded via Double.toString,
    * which round-trips exactly). */
  private[queries] def bootstrapOracleSql(reps: Int): String = {
    val cs = graft.ext.Stats.PoissonCdf
    val hCols = (0 until (reps + 3) / 4)
      .map(g => s"md5(concat(CAST(event_id AS VARCHAR), '_$g')) AS h$g")
      .mkString(",\n           ")
    def u(b: Int) =
      s"CAST(CAST(concat('0x', substr(h${b / 4}, ${1 + 8 * (b % 4)}, 8)) " +
        s"AS BIGINT) % 1000000 AS DOUBLE) / 1000000.0"
    val uCols = (0 until reps).map(b => s"${u(b)} AS u$b").mkString(",\n           ")
    val wCols = (0 until reps).map(b =>
      s"(CASE WHEN u$b < ${cs(0)} THEN 0 WHEN u$b < ${cs(1)} THEN 1 " +
        s"WHEN u$b < ${cs(2)} THEN 2 WHEN u$b < ${cs(3)} THEN 3 ELSE 4 END) AS w$b")
      .mkString(",\n           ")
    val aggCols = (0 until reps).map(b =>
      s"CAST(sum(CAST(w$b AS HUGEINT) * v) AS HUGEINT) AS s$b, CAST(sum(w$b) AS BIGINT) AS n$b")
      .mkString(",\n           ")
    val meanList = (0 until reps)
      .map(b => s"CASE WHEN n$b > 0 THEN CAST(s$b AS DOUBLE) / CAST(n$b AS DOUBLE) END")
      .mkString(", ")
    val nNull = (0 until reps).map(b => s"CASE WHEN n$b > 0 THEN 0 ELSE 1 END").mkString(" + ")
    def interp(p: Double): String = {
      val pos = (reps - 1) * p
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      val frac = pos - lo
      s"round(ms[${lo + 1}] + (ms[${hi + 1}] - ms[${lo + 1}]) * $frac, 6)"
    }
    s"""WITH base AS (SELECT event_type AS grp, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
         hh AS (SELECT grp, v,
           $hCols
           FROM base),
         uu AS (SELECT grp, v,
           $uCols
           FROM hh),
         ww AS (SELECT grp, v,
           $wCols
           FROM uu),
         a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sx,
           $aggCols
           FROM ww GROUP BY grp),
         m AS (SELECT grp, n, sx, list_sort([$meanList]) AS ms, ($nNull) AS nnull FROM a)
         SELECT grp, n, round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
                CASE WHEN nnull = 0 THEN ${interp(0.025)} END AS ci_lo,
                CASE WHEN nnull = 0 THEN ${interp(0.975)} END AS ci_hi
         FROM m"""
  }

  /** ε-DP count-release oracle — shared verbatim by the batch release and
    * its streaming parity twin, so the two can never desynchronize. */
  private[queries] lazy val dpCountsOracleSql: String =
    """WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
         h AS (SELECT *,
                 CAST(concat('0x', substr(md5(concat_ws('|', event_type,
                   CAST(day AS VARCHAR))), 1, 8)) AS BIGINT) % 999998 + 1 AS v
               FROM g),
         u AS (SELECT event_type, day, n,
                 CAST(v AS DOUBLE) / 1000000.0 - 0.5 AS u FROM h)
         SELECT event_type, day,
                round(CAST(n AS DOUBLE) +
                      round(-1.0 * sign(u) * ln(1.0 - 2.0 * abs(u)), 6), 6) AS n_dp,
                CAST(1.0 AS DOUBLE) AS epsilon
         FROM u"""

  /** The unrolled BFS round CTEs n1..nN/b1..bN over the `und` adjacency and
    * seed frame `b0`, shared by the distance oracle and its fixpoint twin.
    * Round i discovers `ni` (frontier-adjacent, not yet reached) at
    * distance i — identical timing to the engine's frontier expansion. */
  private[queries] def bfsRoundsCte(n: Int): String =
    (1 to n).map { i =>
      val pb = s"b${i - 1}"
      val pf = if (i == 1) "b0" else s"n${i - 1}"
      s"""n$i AS MATERIALIZED (SELECT DISTINCT u.d AS node FROM und u
           JOIN $pf f ON u.s = f.node
           WHERE u.d NOT IN (SELECT node FROM $pb)),
         b$i AS MATERIALIZED (SELECT node, dist FROM $pb
           UNION ALL SELECT node, $i AS dist FROM n$i)"""
    }.mkString(",\n         ")

  private[queries] lazy val bfsOracleSql: String =
    s"""WITH $setsimEdgesCte,
         und AS MATERIALIZED (SELECT a AS s, b AS d FROM e UNION ALL SELECT b AS s, a AS d FROM e),
         b0 AS MATERIALIZED (SELECT doc_id AS node, 0 AS dist FROM documents WHERE doc_id % 100 = 0),
         ${bfsRoundsCte(3)}
         SELECT node, CAST(dist AS INTEGER) AS dist FROM b3"""

  private[queries] lazy val bfsFixpointOracleSql: String =
    s"""WITH $setsimEdgesCte,
         und AS MATERIALIZED (SELECT a AS s, b AS d FROM e UNION ALL SELECT b AS s, a AS d FROM e),
         b0 AS MATERIALIZED (SELECT doc_id AS node, 0 AS dist FROM documents WHERE doc_id % 100 = 0),
         ${bfsRoundsCte(4)}
         SELECT CAST(3 AS INTEGER) AS rounds,
                CAST((SELECT count(*) FROM b3) AS BIGINT) AS n_reached,
                CAST((SELECT count(*) FROM n4) AS BIGINT) AS n_new_probe,
                (SELECT count(*) FROM n4) = 0 AS at_fixpoint"""

  private[queries] def hexval(expr: String): String =
    s"(strpos('0123456789abcdef', $expr) - 1)"

  /** occ of literal term in padded lowered text (see TextStats.occurrences). */
  private[queries] def occSql(term: String): String =
    s"CAST((length(p) - length(replace(p, '$term', ''))) / ${term.length} AS BIGINT)"

  private[queries] val langScoreSqls: Seq[(String, String)] =
    TextStats.StopwordLexicons.map { case (lang, lex) =>
      lang -> lex.map(occSql).mkString(" + ")
    }

  private[queries] val ngramScoreSqls: Seq[(String, String)] =
    TextStats.TrigramProfiles.map { case (lang, grams) =>
      lang -> grams.map(occSql).mkString(" + ")
    }

  /** The minhash-signature → banded-bucket → candidate-pair CTE chain,
    * defined ONCE and composed by every LSH oracle (batch pairs, streaming
    * parity, verified survivors, cluster chain) so a change to the
    * signature scheme cannot desynchronize them.
    */
  private[queries] lazy val sigBandedCte: String = """
        , sig AS (
          SELECT doc_id, [
            list_aggregate(list_transform(grams, x -> substr(md5(x),  1, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x),  9, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x), 17, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x), 25, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'),  1, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'),  9, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'), 17, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'), 25, 8)), 'min')
          ] AS sig FROM g
        ), banded AS (
          SELECT doc_id, b, md5(concat(sig[2*b + 1], '|', sig[2*b + 2])) AS bh
          FROM sig, range(0, 4) t(b)
        )"""

  private[queries] lazy val sigBandedCandsCte: String = sigBandedCte + """
        , cands AS (
          SELECT DISTINCT a.doc_id AS id_lo, b.doc_id AS id_hi
          FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        )"""

  /** The language/quality/token profile of every document (the composed
    * quality-gate inputs, identical formulas to `TextStats.profileNativeDF`)
    * — shared by the `corpus_filter` gate and the `corpus_data_card`
    * summary so the scoring definitions cannot drift.
    */
  private[queries] lazy val profileCte: String =
    s"""WITH base AS (
            SELECT doc_id, concat(' ', lower(coalesce(text, '')), ' ') AS p,
              CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
              CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
              CAST(length(coalesce(text, '')) - length(regexp_replace(coalesce(text, ''), '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct
            FROM documents
          ), sc AS (
            SELECT *, ${langScoreSqls.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")} FROM base
          ), b AS (
            SELECT *, greatest(${langScoreSqls.map(x => "s_" + x._1).mkString(", ")}) AS best FROM sc
          ), scored AS (
            SELECT doc_id,
              CASE ${langScoreSqls.map { case (l, _) => s"WHEN s_$l = best AND best > 0 THEN '$l'" }.mkString(" ")}
                   ELSE 'und' END AS lang,
              round(CASE WHEN n_chars >= 50 AND n_chars <= 5000 THEN 1.0 ELSE 0.0 END * 0.4 +
                    least(CASE WHEN n_tokens > 0 THEN CAST((${TextStats.StopwordLexicons.flatMap(_._2).map(occSql).mkString(" + ")}) AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 2.0, 1.0) * 0.4 +
                    CASE WHEN (CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END) <= 0.1 THEN 0.2 ELSE 0.0 END, 4) AS score,
              CAST(n_tokens AS BIGINT) AS n_tokens
            FROM b
          )
    """

  /** The deterministic-changelog CDC snapshot (every 7th order re-priced,
    * every 11th deleted at a later sequence) — shared by the batch window
    * apply (`scd_changelog_apply`) and the streaming max_by parity twin
    * (`stream_changelog_parity`).
    */
  private[queries] lazy val changelogApplySql: String =
    """SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000 ELSE o_totalprice END
           AS o_totalprice,
         o_orderstatus
       FROM orders
       WHERE o_orderkey % 11 <> 0"""

  /** The BPE training oracle: K unrolled stages, each one pair-count →
    * argmax (cnt desc, lexicographic tiebreak) → greedy left-to-right
    * rewrite via a list_reduce fold into a chr(1)-joined accumulator —
    * the exact fold the Spark operator runs, so every stage's corpus
    * state (and therefore every later count) matches string-for-string.
    */
  private[queries] def bpeRewriteSql(m: String): String =
    s"""string_split(list_reduce(list_prepend('', toks),
          (acc, tk) -> CASE
            WHEN acc = '' THEN tk
            WHEN (acc = $m.a OR ends_with(acc, chr(1) || $m.a)) AND tk = $m.b
              THEN substr(acc, 1, length(acc) - length($m.a)) || $m.a || $m.b
            ELSE acc || chr(1) || tk END), chr(1))"""

  /** The K unrolled training stages (t0 sample → m1..mK merge picks with
    * the intermediate rewrites) — the WITH prefix shared by the training
    * oracle (`text_bpe_merges`) and the encode oracle (`text_bpe_encode`),
    * so the merge table both replay is one definition.
    */
  private[queries] def bpeTrainCtesSql(K: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH t0 AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents WHERE doc_id % 10 = 0)"""
    for (i <- 1 to K) {
      sb ++= s""", m$i AS (
        SELECT a, b, CAST(c AS BIGINT) AS cnt FROM (
          SELECT toks[u.i] AS a, toks[u.i + 1] AS b, count(*) AS c
          FROM t${i - 1}, unnest(range(1, len(toks))) u(i)
          GROUP BY 1, 2)
        ORDER BY c DESC, a, b LIMIT 1)"""
      if (i < K)
        sb ++= s""", t$i AS (
        SELECT doc_id, ${bpeRewriteSql(s"m$i")} AS toks
        FROM t${i - 1} CROSS JOIN m$i)"""
    }
    sb.toString
  }

  private[queries] lazy val bpeMergesSql: String = {
    val K = 8
    bpeTrainCtesSql(K) + (1 to K)
      .map(i => s"SELECT $i AS rank, a, b, a || b AS merged, cnt FROM m$i")
      .mkString("\n", "\nUNION ALL\n", "")
  }

  /** Encode oracle: train (shared CTEs), then chain the K rewrites over
    * ALL documents and report the before/after token counts.
    */
  private[queries] lazy val bpeEncodeSql: String = {
    val K = 8
    val sb = new StringBuilder
    sb ++= bpeTrainCtesSql(K)
    sb ++= """, e0 AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)"""
    for (i <- 1 to K)
      sb ++= s""", e$i AS (
        SELECT doc_id, ${bpeRewriteSql(s"m$i")} AS toks
        FROM e${i - 1} CROSS JOIN m$i)"""
    sb ++= s"""
      SELECT e0.doc_id,
             CAST(len(e0.toks) AS BIGINT) AS n_raw,
             CAST(len(e$K.toks) AS BIGINT) AS n_bpe
      FROM e0 JOIN e$K USING (doc_id)"""
    sb.toString
  }

  /** Incremental-ingestion probe + exact-Jaccard verify: every 5th doc is
    * the incoming batch, the rest the corpus index. Shared verbatim by the
    * batch probe (`dedup_incremental`) and the stream-static parity twin
    * (`stream_incremental_parity`) — the parity claim IS one oracle.
    */
  private[queries] lazy val incrementalProbeSql: String =
    incrementalProbeSqlFor("a.doc_id % 5 = 0", "b.doc_id % 5 <> 0")

  /** The probe chain with explicit batch/corpus membership predicates —
    * the delete twin (`dedup_index_delete`) narrows the corpus side to
    * rebuild-WITHOUT-deleted, exactly mirroring the tombstone anti-join.
    */
  private[queries] def incrementalProbeSqlFor(newPred: String, corpusPred: String): String =
    gramsCte + sigBandedCte + s"""
        , cands AS (
          SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
          FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh
          WHERE ($newPred) AND ($corpusPred)
        )
        SELECT new_id, corpus_id,
          round(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                / len(list_distinct(list_concat(ga.grams, gb.grams))), 6) AS jac
        FROM cands
        JOIN g ga ON ga.doc_id = new_id
        JOIN g gb ON gb.doc_id = corpus_id
        WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
              / len(list_distinct(list_concat(ga.grams, gb.grams))) >= 0.7"""

  /** dedup_index_delete twin: the incremental probe against the corpus
    * index REBUILT WITHOUT the retracted md5 stratum — tombstone-then-
    * probe ≡ rebuild-without-deleted-then-probe (Dedup.deleteFromLshIndex,
    * the serving-index form of the reference's J4 anti-join retraction).
    */
  private[queries] lazy val dedupIndexDeleteSql: String =
    incrementalProbeSqlFor(
      "a.doc_id % 5 = 0",
      s"b.doc_id % 5 <> 0 AND NOT (${md5GateSql("b.doc_id", 7)})")

  /** The batch LSH candidate-pair derivation — shared verbatim by the
    * batch query's oracle and the streaming-parity oracle (the parity claim
    * IS that the two candidate sets are identical).
    */
  private[queries] lazy val minhashPairsOracleSql: String =
    gramsCte + sigBandedCandsCte + """
      SELECT id_lo, id_hi FROM cands"""

  /** The VERIFIED-pair variant of [[clusterChainSql]]: candidates pass the
    * exact-Jaccard gate before symmetric closure — the reachability base of
    * the streaming candidates → verify → survivors composition.
    */
  private[queries] lazy val verifiedClusterChainSql: String =
    gramsCte.replaceFirst("WITH", "WITH RECURSIVE") + sigBandedCandsCte + """
        , ver AS (
          SELECT id_lo, id_hi
          FROM cands
          JOIN g ga ON ga.doc_id = id_lo
          JOIN g gb ON gb.doc_id = id_hi
          WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                / len(list_distinct(list_concat(ga.grams, gb.grams))) >= 0.7
        ), sym AS (
          SELECT id_lo AS a, id_hi AS b FROM ver
          UNION
          SELECT id_hi, id_lo FROM ver
        ), reach(id, r) AS (
          SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
          UNION
          SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
        )"""

  /** The LSH-candidate → symmetric-closure → reachability chain shared by
    * the cluster oracle and the survivor oracle (one definition so the two
    * cannot drift).
    */
  private[queries] lazy val clusterChainSql: String =
    gramsCte.replaceFirst("WITH", "WITH RECURSIVE") + sigBandedCandsCte + """
        , sym AS (
          SELECT id_lo AS a, id_hi AS b FROM cands
          UNION
          SELECT id_hi, id_lo FROM cands
        ), reach(id, r) AS (
          SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
          UNION
          SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
        )"""

  /** The arithmetic PNG/BMP decode oracle — shared verbatim by the batch
    * query and the streaming-parity twin (the parity claim IS that the two
    * decode outputs are identical).
    */
  private[queries] lazy val decodeRealOracleSql: String =
    """WITH dims AS (
         SELECT doc_id,
                CAST(1 + doc_id % 13 AS INTEGER) AS width,
                CAST(1 + doc_id % 11 AS INTEGER) AS height
         FROM documents)
       SELECT d.doc_id AS asset_id,
              CASE WHEN d.doc_id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END AS media_type,
              d.width, d.height,
              CAST(sum((d.doc_id * 31 + 7 * x.g + 13 * y.g) % 256) AS BIGINT) AS pix_sum
       FROM dims d
       CROSS JOIN generate_series(0, 12) AS x(g)
       CROSS JOIN generate_series(0, 10) AS y(g)
       WHERE x.g < d.width AND y.g < d.height
       GROUP BY 1, 2, 3, 4"""

  /** Shared dHash CTEs: replay [[graft.ext.Multimodal.dHashImages]]
    * arithmetically — the id-derived pixel formula sampled on the 9×7
    * integer-div grid, horizontal-gradient bits OR-ed into the 56-bit
    * hash (bit 55 max: positive BIGINT in both engines).
    */
  private[queries] lazy val dhashCtesSql: String =
    """WITH dims AS (
         SELECT doc_id AS id,
                1 + doc_id % 13 AS w,
                1 + doc_id % 11 AS h
         FROM documents),
       grid AS (
         SELECT d.id, x.g AS x, y.g AS y,
                (d.id * 31 + 7 * ((x.g * d.w) // 9) + 13 * ((y.g * d.h) // 7)) % 256 AS v
         FROM dims d
         CROSS JOIN generate_series(0, 8) AS x(g)
         CROSS JOIN generate_series(0, 6) AS y(g)),
       bits AS (
         SELECT a.id, CAST(a.y * 8 + a.x AS BIGINT) AS bit
         FROM grid a JOIN grid b ON a.id = b.id AND a.y = b.y AND b.x = a.x + 1
         WHERE a.x < 8 AND b.v > a.v),
       hashes AS (
         SELECT d.id, d.w, d.h,
                CAST(COALESCE(bit_or(1::BIGINT << b.bit), 0) AS BIGINT) AS dhash
         FROM dims d LEFT JOIN bits b ON b.id = d.id
         GROUP BY d.id, d.w, d.h)"""

  private[queries] lazy val dhashOracleSql: String =
    s"""$dhashCtesSql
       SELECT id AS asset_id,
              CAST(w AS INTEGER) AS width,
              CAST(h AS INTEGER) AS height,
              dhash
       FROM hashes"""

  private[queries] lazy val dhashNearDupOracleSql: String =
    s"""$dhashCtesSql,
       bands AS (
         SELECT id, dhash, b.g AS band, (dhash >> (b.g * 14)) & 16383 AS bv
         FROM hashes CROSS JOIN generate_series(0, 3) AS b(g))
       SELECT DISTINCT l.id AS id_lo, r.id AS id_hi,
              CAST(bit_count(xor(l.dhash, r.dhash)) AS INTEGER) AS hamming
       FROM bands l JOIN bands r ON l.band = r.band AND l.bv = r.bv AND l.id < r.id
       WHERE bit_count(xor(l.dhash, r.dhash)) <= 8"""

  /** Shared audio-fingerprint CTEs: replay
    * [[graft.ext.Multimodal.audioFingerprints]] arithmetically from the
    * id-derived PCM formula. Frame of sample i under boundaries
    * `lo_f = f·n div 57` has the closed form `(i·57 + 56) div n`
    * (verified exhaustively for n ∈ [100, 300)).
    */
  private[queries] lazy val audioFpCtesSql: String =
    """WITH ids AS (SELECT doc_id AS id, 100 + doc_id % 200 AS n FROM documents),
       smp AS (
         SELECT x.id, x.n, i.g AS i,
                ((x.id * 31 + 7 * i.g) % 2003 - 1001) AS s,
                (i.g * 57 + 56) // x.n AS f
         FROM ids x JOIN generate_series(0, 298) AS i(g) ON i.g < x.n),
       en AS (SELECT id, n, f, CAST(sum(s * s) AS BIGINT) AS e
              FROM smp GROUP BY id, n, f),
       bits AS (SELECT a.id, CAST(a.f AS BIGINT) AS bit
                FROM en a JOIN en b ON a.id = b.id AND b.f = a.f + 1
                WHERE a.f < 56 AND b.e > a.e),
       fps AS (SELECT x.id, x.n, CAST(COALESCE(bit_or(1::BIGINT << b.bit), 0) AS BIGINT) AS fingerprint
               FROM ids x LEFT JOIN bits b ON b.id = x.id GROUP BY x.id, x.n)"""

  private[queries] lazy val audioFpOracleSql: String =
    s"""$audioFpCtesSql
       SELECT id AS asset_id, CAST(n AS BIGINT) AS n_samples, fingerprint FROM fps"""

  private[queries] lazy val audioNearDupOracleSql: String =
    s"""$audioFpCtesSql,
       bands AS (
         SELECT id, fingerprint, b.g AS band, (fingerprint >> (b.g * 14)) & 16383 AS bv
         FROM fps CROSS JOIN generate_series(0, 3) AS b(g))
       SELECT DISTINCT l.id AS id_lo, r.id AS id_hi,
              CAST(bit_count(xor(l.fingerprint, r.fingerprint)) AS INTEGER) AS hamming
       FROM bands l JOIN bands r ON l.band = r.band AND l.bv = r.bv AND l.id < r.id
       WHERE bit_count(xor(l.fingerprint, r.fingerprint)) <= 8"""

  /** PQ/ADC oracle: per subspace j (offset j·16), one unrolled Lloyd's
    * iteration (c0 seed slices → assign → half-up means → c1 with the
    * empty-cell rule), then codes under c1 and the ADC sum as nsub
    * per-subspace distance-table joins. Generated, not hand-written, so
    * subspace count/width change in one place.
    */
  /** The two-iteration Lloyd's coarse-quantizer training + serving-side
    * assignment/probe CTEs (c0..c2, cdist, assign, qprobe at nprobe=2) —
    * shared verbatim by the trained-IVF oracle and the IVFPQ composition.
    */
  private[queries] lazy val ivfKmeansCtesSql: String = ivfKmeansCtes("vec_id < 10", 2)

  private[queries] def ivfKmeansCtes(queryPred: String, nprobe: Int): String = s""", c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, q AS cq
          FROM (SELECT vec_id, q FROM qz ORDER BY vec_id LIMIT 8)
        )
        -- Lloyd's iteration 1: assign to nearest c0 centroid, re-mean
        , d1 AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, 65), i -> (z.q[i] - c.cq[i]) * (z.q[i] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN c0 c
        ), a1 AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM d1) WHERE rn = 1
        ), m1 AS (
          SELECT a.cell, t.i AS pos,
                 CAST(floor(CAST(sum(z.q[t.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS v
          FROM a1 a JOIN qz z USING (vec_id), unnest(range(1, 65)) t(i)
          GROUP BY a.cell, t.i
        ), n1 AS (
          SELECT cell, list(v ORDER BY pos) AS cq FROM m1 GROUP BY cell
        ), c1 AS (
          SELECT cell, cq FROM n1
          UNION ALL
          SELECT c.cell, c.cq FROM c0 c WHERE c.cell NOT IN (SELECT cell FROM n1)
        )
        -- Lloyd's iteration 2
        , d2 AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, 65), i -> (z.q[i] - c.cq[i]) * (z.q[i] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN c1 c
        ), a2 AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM d2) WHERE rn = 1
        ), m2 AS (
          SELECT a.cell, t.i AS pos,
                 CAST(floor(CAST(sum(z.q[t.i]) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS v
          FROM a2 a JOIN qz z USING (vec_id), unnest(range(1, 65)) t(i)
          GROUP BY a.cell, t.i
        ), n2 AS (
          SELECT cell, list(v ORDER BY pos) AS cq FROM m2 GROUP BY cell
        ), c2 AS (
          SELECT cell, cq FROM n2
          UNION ALL
          SELECT c.cell, c.cq FROM c1 c WHERE c.cell NOT IN (SELECT cell FROM n2)
        )
        -- serving under the trained quantizer (same shape as ann_ivf_topk)
        , cdist AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, 65), i -> (z.q[i] - c.cq[i]) * (z.q[i] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN c2 c
        ), assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM cdist) WHERE rn = 1
        ), qprobe AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM cdist WHERE $queryPred) WHERE rn <= $nprobe
        )"""

  /** The per-subspace PQ training + coding CTE block (c0_j .. cd_j per
    * subspace j) — shared by the standalone PQ oracle and the IVFPQ
    * composition.
    */
  private[queries] def pqSubspaceCtesSql(nsub: Int, nlist: Int, dsub: Int): String = {
    val sb = new StringBuilder
    for (j <- 0 until nsub) {
      val off = j * dsub
      sb ++= s"""
        , c0_$j AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
                 q[${off + 1}:${off + dsub}] AS cq
          FROM (SELECT vec_id, q FROM qz ORDER BY vec_id LIMIT $nlist)
        ), d1_$j AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, ${dsub + 1}), i -> (z.q[i + $off] - c.cq[i]) * (z.q[i + $off] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN c0_$j c
        ), a1_$j AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM d1_$j) WHERE rn = 1
        ), m1_$j AS (
          SELECT a.cell, t.i AS pos,
                 CAST(floor(CAST(sum(z.q[t.i + $off]) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS v
          FROM a1_$j a JOIN qz z USING (vec_id), unnest(range(1, ${dsub + 1})) t(i)
          GROUP BY a.cell, t.i
        ), n1_$j AS (
          SELECT cell, list(v ORDER BY pos) AS cq FROM m1_$j GROUP BY cell
        ), c1_$j AS (
          SELECT cell, cq FROM n1_$j
          UNION ALL
          SELECT c.cell, c.cq FROM c0_$j c WHERE c.cell NOT IN (SELECT cell FROM n1_$j)
        ), d2_$j AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, ${dsub + 1}), i -> (z.q[i + $off] - c.cq[i]) * (z.q[i + $off] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN c1_$j c
        ), cd_$j AS (
          SELECT vec_id, cell AS code FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM d2_$j) WHERE rn = 1
        )"""
    }
    sb.toString
  }

  private[queries] def pqAdcSumSql(nsub: Int): String =
    (0 until nsub).map(j => s"qd$j.d").mkString(" + ")

  private[queries] def pqAdcJoinsSql(nsub: Int, candAlias: String): String =
    (0 until nsub)
      .map(j =>
        s"JOIN cd_$j ON cd_$j.vec_id = $candAlias.cand_id JOIN d2_$j qd$j ON qd$j.vec_id = $candAlias.query_id AND qd$j.cell = cd_$j.code")
      .mkString("\n        ")

  private[queries] lazy val pqAdcSql: String = {
    val nsub = 4
    val sb = new StringBuilder
    sb ++= qzCte
    sb ++= pqSubspaceCtesSql(nsub, 4, 16)
    sb ++= s"""
      , pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS cand_id
        FROM qz a CROSS JOIN qz b
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
      ), scored AS (
        SELECT p.query_id, p.cand_id,
               CAST(${pqAdcSumSql(nsub)} AS BIGINT) AS adc
        FROM pairs p
        ${pqAdcJoinsSql(nsub, "p")}
      ), ranked AS (
        SELECT query_id, cand_id, adc,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS INTEGER) AS rank
        FROM scored
      )
      SELECT query_id, cand_id, rank, adc FROM ranked WHERE rank <= 5"""
    sb.toString
  }

  /** PQ→exact-rerank oracle: the 8x8 training/coding/ADC CTEs keep the
    * top-100 per query, then the exact quantized-cosine rerank (the
    * ann_int8_rerank tail, reading qz directly) cuts to 5.
    */
  private[queries] lazy val pqRerankSql: String = {
    val nsub = 8
    val sb = new StringBuilder
    sb ++= qzCte
    sb ++= pqSubspaceCtesSql(nsub, 8, 8)
    sb ++= s"""
      , pairs AS (
        SELECT a.vec_id AS query_id, b.vec_id AS cand_id
        FROM qz a CROSS JOIN qz b
        WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
      ), scored AS (
        SELECT p.query_id, p.cand_id,
               CAST(${pqAdcSumSql(nsub)} AS BIGINT) AS adc
        FROM pairs p
        ${pqAdcJoinsSql(nsub, "p")}
      ), cand AS (
        SELECT query_id, cand_id FROM (
          SELECT query_id, cand_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS rk
          FROM scored) WHERE rk <= 100
      ), ex AS (
        SELECT c.query_id, c.cand_id,
               CAST(list_sum(list_transform(range(1, 65), i -> qv.q[i] * cv.q[i])) AS BIGINT) AS dot,
               CAST(list_sum(list_transform(range(1, 65), i -> qv.q[i] * qv.q[i])) AS BIGINT) AS naa,
               CAST(list_sum(list_transform(range(1, 65), i -> cv.q[i] * cv.q[i])) AS BIGINT) AS ncc
        FROM cand c JOIN qz qv ON qv.vec_id = c.query_id JOIN qz cv ON cv.vec_id = c.cand_id
      ), rr AS (
        SELECT query_id, cand_id,
               CAST(dot AS DOUBLE) / sqrt(CAST(naa AS DOUBLE) * CAST(ncc AS DOUBLE)) AS sim
        FROM ex
      ), rranked AS (
        SELECT query_id, cand_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
        FROM rr
      )
      SELECT query_id, cand_id, rank, sim FROM rranked WHERE rank <= 5"""
    sb.toString
  }

  /** IVFPQ oracle: the trained coarse quantizer's probe/candidate CTEs
    * (shared with `ann_ivf_kmeans`) composed with the per-subspace PQ
    * chains (shared with `ann_pq_topk`); ranking is the ADC sum over the
    * PROBED candidates only.
    */
  private[queries] lazy val ivfPqSql: String = {
    val nsub = 4
    val sb = new StringBuilder
    sb ++= qzCte
    sb ++= "\n        "
    sb ++= ivfKmeansCtesSql
    sb ++= """
      , cand AS (
        SELECT DISTINCT p.query_id, a.vec_id AS cand_id
        FROM qprobe p JOIN assign a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
      )"""
    sb ++= pqSubspaceCtesSql(nsub, 4, 16)
    sb ++= s"""
      , scored AS (
        SELECT c.query_id, c.cand_id,
               CAST(${pqAdcSumSql(nsub)} AS BIGINT) AS adc
        FROM cand c
        ${pqAdcJoinsSql(nsub, "c")}
      ), ranked AS (
        SELECT query_id, cand_id, adc,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS INTEGER) AS rank
        FROM scored
      )
      SELECT query_id, cand_id, rank, adc FROM ranked WHERE rank <= 5"""
    sb.toString
  }

  /** Batch-scoring oracle: ivfPqSql's composition with the 50-query probe
    * set and top-3 — the semantics of scoring against the PERSISTED index
    * are identical to the inline composition (layout is execution, not
    * meaning), so the oracle differs only in predicate and k.
    */
  private[queries] def annIndexScoredSqlFor(
      queryPred: String,
      k: Int,
      candExclude: String = ""
  ): String = {
    val nsub = 4
    val sb = new StringBuilder
    sb ++= qzCte
    sb ++= "\n        "
    sb ++= ivfKmeansCtes(queryPred, 2)
    // candExclude models a RETRACTION (ann_index_delete/compact): the
    // rebuild-without-deleted corpus is the index scan minus the gated ids
    val excl = if (candExclude.isEmpty) "" else s"\n          AND NOT ($candExclude)"
    sb ++= s"""
      , cand AS (
        SELECT DISTINCT p.query_id, a.vec_id AS cand_id
        FROM qprobe p JOIN assign a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id$excl
      )"""
    sb ++= pqSubspaceCtesSql(nsub, 4, 16)
    sb ++= s"""
      , scored AS (
        SELECT c.query_id, c.cand_id,
               CAST(${pqAdcSumSql(nsub)} AS BIGINT) AS adc
        FROM cand c
        ${pqAdcJoinsSql(nsub, "c")}
      ), ranked AS (
        SELECT query_id, cand_id, adc,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS INTEGER) AS rank
        FROM scored
      )
      SELECT query_id, cand_id, rank, adc FROM ranked WHERE rank <= $k"""
    sb.toString
  }

  private[queries] lazy val annIndexScoredSql: String =
    annIndexScoredSqlFor("vec_id < 50", 3)

  /** ann_index_append twin: the ONE-SHOT index over the full corpus with
    * the append query's probe set — under a pinned model, append-then-
    * probe must hash-equal rebuild-then-probe (the equivalence contract
    * of Similarity.appendAnnIndex).
    */
  private[queries] lazy val annIndexAppendSql: String =
    annIndexScoredSqlFor("vec_id >= 50 AND vec_id < 80", 3)

  /** ann_index_filtered twin: the scored oracle with the candidate
    * pre-filter as an exclusion of its complement — filter-then-rank,
    * never rank-then-filter (k survivors from the ALLOWED set).
    */
  private[queries] lazy val annIndexFilteredSql: String =
    annIndexScoredSqlFor(
      "vec_id >= 180 AND vec_id < 220", 3, candExclude = "a.vec_id >= 300")

  /** ann_index_delete twin: the REBUILD-WITHOUT-DELETED index — the scored
    * oracle with the retracted md5 stratum excluded from the candidate
    * side (queries may still be retracted docs; only the INDEX forgets
    * them). Hash equality IS the delete contract: tombstone-then-probe ≡
    * rebuild-without-deleted-then-probe (Similarity.deleteFromAnnIndex).
    */
  private[queries] lazy val annIndexDeleteSql: String =
    annIndexScoredSqlFor(
      "vec_id >= 100 AND vec_id < 140", 3, candExclude = md5GateSql("a.vec_id", 5))

  /** ann_index_reappend twin: rebuild WITH the re-appended even half of
    * the retracted stratum — era-stamped tombstones (hide rows at era ≤
    * tomb_seq only) make a delete-then-reappend visible immediately, so
    * the excluded set is the deleted stratum MINUS its re-appends.
    */
  private[queries] lazy val annIndexReappendSql: String =
    annIndexScoredSqlFor(
      "vec_id >= 260 AND vec_id < 300", 3,
      candExclude = s"(${md5GateSql("a.vec_id", 5)}) AND a.vec_id % 2 <> 0")

  /** ann_index_compact twin: identical CONTENT contract as the delete
    * twin under a different probe stratum — compaction (fold tombstones,
    * merge each bucket's append file-sets to one file) is layout, not
    * meaning, so the oracle is again rebuild-without-deleted.
    */
  private[queries] lazy val annIndexCompactSql: String =
    annIndexScoredSqlFor(
      "vec_id >= 140 AND vec_id < 180", 3, candExclude = md5GateSql("a.vec_id", 5))

  /** ann_index_staleness twin: per-population mean PQ quantization error
    * under the 1-iteration-trained codebooks (pqSubspaceCtesSql's c1_j) —
    * the base population reuses d2_j's distances (min over cells IS the
    * assigned code's distance), the drifted batch recomputes them from
    * the +0.25-shifted quantization.
    */
  /** stream_ann_index_maintain twin: the IVFPQ serving chain under the
    * full-corpus-trained model, with ARRIVAL-ORDER candidate visibility —
    * the era-0 corpus is visible to every probe; batch A (gated, even id)
    * is visible only to batch B's probes (gated, odd id), because batch
    * A's vectors entered the index via the append BETWEEN the batches.
    */
  private[queries] lazy val streamAnnMaintainSql: String =
    streamAnnCycleSqlFor(
      s"NOT (${md5GateSql("a.vec_id", 4)}) OR (a.vec_id % 2 = 0 AND p.query_id % 2 = 1)")

  /** stream_ann_index_retract twin: arrival order, retraction AND
    * re-append over THREE stream batches. Era-0 candidates stay visible
    * to epoch-1 queries (probe-before-delete); the md5%5 takedown stratum
    * vanishes for epoch-2 queries (batch B's own U set plus the
    * re-appended vectors themselves, which probe too); epoch-3 queries
    * see the takedown stratum's RE-APPENDED even half again (its fresh
    * era beats the tombstone — the D-then-U visibility) plus both earlier
    * batches' appends.
    */
  private[queries] lazy val streamAnnRetractSql: String = {
    val mdA = md5GateSql("a.vec_id", 4) // candidate is stream-stratum (gated)
    val delA = md5GateSql("a.vec_id", 5) // candidate is takedown-gated
    val mq = md5GateSql("p.query_id", 4) // query is stream-stratum
    // query is a re-appended takedown vector (probes in batch B)
    val rvq = s"(NOT (${md5GateSql("p.query_id", 4)}) AND (${md5GateSql("p.query_id", 5)}) AND p.query_id % 2 = 0)"
    streamAnnCycleSqlFor(
      s"""( NOT ($mdA) AND (
                    ( ($mq) AND p.query_id % 2 = 0 )
                    OR ( ( (($mq) AND p.query_id % 4 = 1) OR $rvq ) AND NOT ($delA) )
                    OR ( ($mq) AND p.query_id % 4 = 3
                         AND (NOT ($delA) OR a.vec_id % 2 = 0) )
                  ) )
                OR ( ($mdA) AND a.vec_id % 2 = 0
                     AND ( (($mq) AND p.query_id % 2 = 1) OR $rvq ) )
                OR ( ($mdA) AND a.vec_id % 4 = 1 AND ($mq) AND p.query_id % 4 = 3 )""",
      queryPred =
        s"(${md5GateSql("vec_id", 4)}) OR (NOT (${md5GateSql("vec_id", 4)}) AND (${md5GateSql("vec_id", 5)}) AND vec_id % 2 = 0)")
  }

  /** The shared two-batch ANN maintenance-cycle oracle: IVFPQ serving
    * under the full-corpus-trained model with an explicit candidate
    * VISIBILITY predicate (arrival order, retraction) over probe pairs
    * (p = query rows, a = candidate assignment rows).
    */
  private[queries] def streamAnnCycleSqlFor(
      visibility: String,
      queryPred: String = md5GateSql("vec_id", 4)
  ): String = {
    val nsub = 4
    qzCte + "\n        " + ivfKmeansCtes(queryPred, 2) + s"""
      , cand AS (
        SELECT DISTINCT p.query_id, a.vec_id AS cand_id
        FROM qprobe p JOIN assign a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
          AND ( $visibility )
      )""" + pqSubspaceCtesSql(nsub, 4, 16) + s"""
      , scored AS (
        SELECT c.query_id, c.cand_id,
               CAST(${pqAdcSumSql(nsub)} AS BIGINT) AS adc
        FROM cand c
        ${pqAdcJoinsSql(nsub, "c")}
      ), ranked AS (
        SELECT query_id, cand_id, adc,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS INTEGER) AS rank
        FROM scored
      )
      SELECT query_id, cand_id, rank, adc FROM ranked WHERE rank <= 3"""
  }

  private[queries] lazy val annIndexStalenessSql: String = {
    val nsub = 4
    val dsub = 16
    // join-shaped per-subspace minima (no correlated subqueries — DuckDB
    // lambdas cannot capture correlated outer columns): the base
    // population's min over cells IS the assigned code's distance, read
    // straight off d2_j; the drifted batch recomputes distances from the
    // shifted quantization against the same trained c1_j codebooks
    val baseMins = (0 until nsub)
      .map(j => s"""
      , qb_$j AS (SELECT vec_id, min(d) AS qe FROM d2_$j GROUP BY vec_id)""")
      .mkString
    val driftMins = (0 until nsub)
      .map(j => s"""
      , qa_$j AS (
        SELECT z.vec_id, min(list_sum(list_transform(range(1, ${dsub + 1}),
          i -> (z.q[i + ${j * dsub}] - c.cq[i]) * (z.q[i + ${j * dsub}] - c.cq[i])))) AS qe
        FROM qzd z CROSS JOIN c1_$j c GROUP BY z.vec_id)""")
      .mkString
    def sumJoin(prefix: String): String =
      s"""SELECT a0.vec_id, ${(0 until nsub).map(j => s"a$j.qe").mkString(" + ")} AS qe
        FROM ${prefix}_0 a0 ${(1 until nsub)
          .map(j => s"JOIN ${prefix}_$j a$j ON a$j.vec_id = a0.vec_id")
          .mkString(" ")}"""
    qzCte + pqSubspaceCtesSql(nsub, 4, dsub) + s"""
      , qzd AS (
        SELECT vec_id, list_transform(range(1, 65), i ->
          CAST(floor((CAST(embedding[i] AS DOUBLE) + 0.25) * 1000 + 0.5) AS BIGINT)) AS q
        FROM embeddings WHERE ${md5GateSql("vec_id", 4)})
      $baseMins
      $driftMins
      , qb AS (${sumJoin("qb")})
      , qa AS (${sumJoin("qa")})
      SELECT population, CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(qe) AS BIGINT) AS sum_qerr,
             CAST(floor(CAST(sum(qe) AS DOUBLE) / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS mean_qerr
      FROM (SELECT 'base' AS population, qe FROM qb
            UNION ALL SELECT 'appended_drifted' AS population, qe FROM qa)
      GROUP BY population"""
  }

  /** index_maintenance_plan twin: the staleness oracle's drift sums
    * reduced to ONE exact integer ppm ratio (HUGEINT cross-multiplied
    * floor division — bit-identical to the engine's remainder-subtraction
    * decimal form), the other indexes' censuses derived from the same
    * md5/modulo strata their fixtures are built from (the Hamming frame
    * index's capped-bucket regrowth replayed from the shared frame-hash
    * CTEs), and the decision CASE replaying the engine's plan-literal
    * thresholds verbatim. `append_eras` per index is a fixture constant
    * (the build recipe: ANN/Hamming = persist + one append = 2;
    * LSH/semantic = persist only = 1).
    */
  private[queries] lazy val indexMaintenancePlanSql: String =
    maintenanceCensusCtes + s"""
      SELECT index_name, index_docs, tomb_entries, append_eras,
             (tomb_entries * 1000000) // greatest(index_docs, 1) AS tomb_ppm,
             drift_ppm, capped_ppm,
             $maintenanceDecisionSql AS decision
      FROM census"""

  /** The decision CASE both maintenance twins replay — one definition so
    * the plan and apply (and fixpoint) rounds cannot drift from the
    * engine's plan literals (rebuildDriftPpm 1200000, compactTombPpm
    * 100000, compactAppendEras 4, compactCappedPpm 50000).
    */
  private[queries] lazy val maintenanceDecisionSql: String =
    """CASE WHEN drift_ppm >= 1200000 THEN 'rebuild'
            WHEN (tomb_entries * 1000000) // greatest(index_docs, 1) >= 100000
                 OR append_eras >= 4 OR capped_ppm >= 50000 THEN 'compact'
            ELSE 'none' END"""

  /** The post-ACTION census per decision — the healed contract the
    * executor's audit must show, shared by the apply and fixpoint twins.
    * `rebuild` re-encodes that index's registered corpus (the fleet
    * registration: ANN over all embeddings, LSH over the %5 corpus,
    * semantic over the %5 vectors) at one fresh era with no tombstones;
    * `compact` folds the tombstones into the files (every tombstone in
    * this fixture hides exactly one indexed id) and merges eras — for the
    * capped Hamming layout, compaction is also the RE-CAP point, so its
    * surviving ids are the re-capped census (`hrecap`) and its
    * `capped_ppm` returns to zero; `none` leaves the census untouched.
    * Emits `post(index_name, index_docs, tomb_entries, append_eras,
    * capped_ppm, decision)`; requires `planned`.
    */
  private[queries] lazy val maintenancePostStateCtes: String =
    """
      , post AS (
        SELECT index_name,
               CASE WHEN decision = 'rebuild' THEN
                      CASE index_name
                        WHEN 'ann_ivfpq' THEN (SELECT CAST(count(*) AS BIGINT) FROM embeddings)
                        WHEN 'lsh_text' THEN
                          (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 5 <> 0)
                        ELSE
                          (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 5 <> 0)
                      END
                    WHEN decision = 'compact' THEN
                      CASE index_name
                        WHEN 'hamming_frame' THEN
                          (SELECT CAST(count(DISTINCT key) AS BIGINT) FROM hrecap)
                        ELSE index_docs - tomb_entries END
                    ELSE index_docs END AS index_docs,
               CASE WHEN decision = 'none' THEN tomb_entries
                    ELSE CAST(0 AS BIGINT) END AS tomb_entries,
               CASE WHEN decision = 'none' THEN append_eras
                    ELSE CAST(1 AS BIGINT) END AS append_eras,
               CASE WHEN decision = 'none' THEN capped_ppm
                    ELSE CAST(0 AS BIGINT) END AS capped_ppm,
               decision
        FROM planned)"""

  /** index_maintenance_apply twin: the SAME census + threshold replay as
    * the plan twin, then the post-ACTION state per decision
    * ([[maintenancePostStateCtes]]).
    */
  private[queries] lazy val indexMaintenanceApplySql: String =
    maintenanceCensusCtes + s"""
      , planned AS (
        SELECT index_name, index_docs, tomb_entries, append_eras, capped_ppm,
               $maintenanceDecisionSql AS decision
        FROM census)""" + maintenancePostStateCtes + """
      SELECT index_name, index_docs, tomb_entries, append_eras, capped_ppm, decision
      FROM post"""

  /** index_maintenance_fixpoint twin: the plan round, the post-action
    * state, then the SECOND plan round over the healed fleet — whose
    * drift signal is the NEXT (unshifted) incoming batch's quantization
    * error vs the training population (`drift2`, the ~10⁶-ppm self-ratio
    * of an undrifted crawl), and whose other signals are the post-state
    * columns. The healed fleet must decide all-`none`: the policy's own
    * fixed point, replayed threshold-for-threshold.
    */
  private[queries] lazy val indexMaintenanceFixpointSql: String = {
    val nsub = 4
    val dsub = 16
    val unshiftedMins = (0 until nsub)
      .map(j => s"""
      , qn_$j AS (
        SELECT z.vec_id, min(list_sum(list_transform(range(1, ${dsub + 1}),
          i -> (z.q[i + ${j * dsub}] - c.cq[i]) * (z.q[i + ${j * dsub}] - c.cq[i])))) AS qe
        FROM qzn z CROSS JOIN c1_$j c GROUP BY z.vec_id)""")
      .mkString
    maintenanceCensusCtes + s"""
      , planned AS (
        SELECT index_name, index_docs, tomb_entries, append_eras, capped_ppm,
               $maintenanceDecisionSql AS decision
        FROM census)""" + maintenancePostStateCtes + s"""
      , qzn AS (
        SELECT vec_id, q FROM qz WHERE ${md5GateSql("vec_id", 4)})
      $unshiftedMins
      , qn AS (SELECT a0.vec_id, ${(0 until nsub).map(j => s"a$j.qe").mkString(" + ")} AS qe
        FROM qn_0 a0 ${(1 until nsub)
        .map(j => s"JOIN qn_$j a$j ON a$j.vec_id = a0.vec_id")
        .mkString(" ")})
      , drift2 AS (
        SELECT CAST(
          (CAST((SELECT sum(qe) FROM qn) AS HUGEINT) * (SELECT count(*) FROM qb) * 1000000)
          // (CAST((SELECT sum(qe) FROM qb) AS HUGEINT) * (SELECT count(*) FROM qn))
          AS BIGINT) AS drift_ppm)
      , census2 AS (
        SELECT index_name, index_docs, tomb_entries, append_eras,
               CASE WHEN index_name = 'ann_ivfpq' THEN (SELECT drift_ppm FROM drift2)
                    ELSE CAST(0 AS BIGINT) END AS drift_ppm,
               capped_ppm
        FROM post)
      SELECT index_name, index_docs, tomb_entries, append_eras,
             (tomb_entries * 1000000) // greatest(index_docs, 1) AS tomb_ppm,
             drift_ppm, capped_ppm,
             $maintenanceDecisionSql AS decision
      FROM census2"""
  }

  /** The shared body of the maintenance twins: drift CTEs + the
    * four-index census (see [[indexMaintenancePlanSql]]'s doc for the
    * replay rationale; the fixtures build the same fleet recipe). The
    * Hamming frame index's stored layout is replayed from the shared
    * frame-hash CTEs ([[QMultimodal.frameHashCtesBody]]): persist-time
    * corpus census capped at 64 (`hkept`), the never-re-capped append
    * (`happ`), the stored-bucket census (`hbc`) whose over-cap rows are
    * the `capped_ppm` regrowth signal, and the re-capped survivor set
    * (`hrecap` — compaction's layout, used by the post-state twins).
    */
  private[queries] lazy val maintenanceCensusCtes: String = {
    val nsub = 4
    val dsub = 16
    val baseMins = (0 until nsub)
      .map(j => s"""
      , qb_$j AS (SELECT vec_id, min(d) AS qe FROM d2_$j GROUP BY vec_id)""")
      .mkString
    val driftMins = (0 until nsub)
      .map(j => s"""
      , qa_$j AS (
        SELECT z.vec_id, min(list_sum(list_transform(range(1, ${dsub + 1}),
          i -> (z.q[i + ${j * dsub}] - c.cq[i]) * (z.q[i + ${j * dsub}] - c.cq[i])))) AS qe
        FROM qzd z CROSS JOIN c1_$j c GROUP BY z.vec_id)""")
      .mkString
    def sumJoin(prefix: String): String =
      s"""SELECT a0.vec_id, ${(0 until nsub).map(j => s"a$j.qe").mkString(" + ")} AS qe
        FROM ${prefix}_0 a0 ${(1 until nsub)
          .map(j => s"JOIN ${prefix}_$j a$j ON a$j.vec_id = a0.vec_id")
          .mkString(" ")}"""
    qzCte + pqSubspaceCtesSql(nsub, 4, dsub) + s"""
      , qzd AS (
        SELECT vec_id, list_transform(range(1, 65), i ->
          CAST(floor((CAST(embedding[i] AS DOUBLE) + 0.25) * 1000 + 0.5) AS BIGINT)) AS q
        FROM embeddings WHERE ${md5GateSql("vec_id", 4)})
      $baseMins
      $driftMins
      , qb AS (${sumJoin("qb")})
      , qa AS (${sumJoin("qa")})
      , drift AS (
        SELECT CAST(
          (CAST((SELECT sum(qe) FROM qa) AS HUGEINT) * (SELECT count(*) FROM qb) * 1000000)
          // (CAST((SELECT sum(qe) FROM qb) AS HUGEINT) * (SELECT count(*) FROM qa))
          AS BIGINT) AS drift_ppm)
      , ${QMultimodal.frameHashCtesBody}
      , hperT AS (
        SELECT band, bv, count(*) AS n FROM bands
        WHERE id % 5 <> 0 AND id % 3 <> 0 GROUP BY 1, 2)
      , hkept AS (
        SELECT b.key, b.band, b.bv FROM bands b
        JOIN hperT c ON c.band = b.band AND c.bv = b.bv
        WHERE b.id % 5 <> 0 AND b.id % 3 <> 0 AND c.n <= 64)
      , happ AS (SELECT key, band, bv FROM bands WHERE id % 5 <> 0 AND id % 3 = 0)
      , hstored AS (SELECT * FROM hkept UNION ALL SELECT * FROM happ)
      , hbc AS (SELECT band, bv, count(*) AS n FROM hstored GROUP BY 1, 2)
      , hstats AS (
        SELECT CAST(sum(CASE WHEN n > 64 THEN n ELSE 0 END) AS BIGINT) AS capped_rows,
               CAST(sum(n) AS BIGINT) AS total_rows FROM hbc)
      , hrecap AS (
        SELECT s.key FROM hstored s
        JOIN hbc c ON c.band = s.band AND c.bv = s.bv
        WHERE c.n <= 64)
      , census AS (
        SELECT 'ann_ivfpq' AS index_name,
               (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS index_docs,
               CAST(0 AS BIGINT) AS tomb_entries,
               CAST(2 AS BIGINT) AS append_eras,
               (SELECT drift_ppm FROM drift) AS drift_ppm,
               CAST(0 AS BIGINT) AS capped_ppm
        UNION ALL
        SELECT 'lsh_text',
               (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 5 <> 0),
               (SELECT CAST(count(*) AS BIGINT) FROM documents
                WHERE doc_id % 5 <> 0 AND (${md5GateSql("doc_id", 3)})),
               CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'semantic_cell',
               (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 5 <> 0),
               CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        UNION ALL
        SELECT 'hamming_frame',
               (SELECT CAST(count(DISTINCT key) AS BIGINT) FROM hstored),
               CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(0 AS BIGINT),
               (SELECT CAST(capped_rows * 1000000 // greatest(total_rows, 1) AS BIGINT)
                FROM hstats))"""
  }

  /** The KLL quantile read (level-4 gate over orders, deciles) — shared by
    * the batch query and the streaming parity twin.
    */
  private[queries] lazy val kllQuantilesSql: String =
    """WITH s AS (
         SELECT o_totalprice AS v, CAST(o_orderkey AS VARCHAR) AS k FROM orders
         WHERE o_totalprice IS NOT NULL
           AND CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 16 = 0
       ), r AS (
         SELECT v, row_number() OVER (ORDER BY v, k) AS r, count(*) OVER () AS m FROM s
       ), p AS (
         SELECT unnest(CAST([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9] AS DOUBLE[])) AS prob
       )
       SELECT p.prob, r.v AS est
       FROM p JOIN r ON r.r = greatest(1, CAST(ceil(p.prob * r.m) AS BIGINT))"""

  private[queries] val gramsCte: String = """
    WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
    g AS (
      SELECT doc_id,
        list_distinct(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
          i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS grams
      FROM w
    )
  """

  // ---- SRP / quantized-vector oracle builders ---------------------------
  // The Spark side quantizes vectors (floor(x*1000+0.5) -> BIGINT) and does
  // ALL similarity math in exact integer arithmetic with md5-derived SRP
  // coefficients, so these twins reproduce results bit-for-bit: integer
  // sums are associative (no summation-order divergence) and md5 exists in
  // both engines.

  private[queries] val qzCte: String = """
    WITH qz AS (
      SELECT vec_id,
        list_transform(range(1, 65),
          i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    )
  """

  /** Twin of Similarity.srpBucket over the staged `q` column: plane p's
    * coefficient d is md5("p_d") first-8-hex mod 1000 minus 500.
    */
  /** SRP bucket over quantized vector `q` for `planes` sign bits; table
    * `offset` shifts the GLOBAL plane index (md5 seed) while bit weights
    * stay local — the SQL twin of Similarity.srpBucketQ(_, _, planes,
    * offset).
    */
  /** EmbAlgebra.covariance twin prefix: per-row upper-triangle pair
    * products via the range cross (the HOF's SQL shape), one grouped
    * integer-sum pyramid, then the same decimal→double one-division
    * cov_ppm estimate. Ends inside the WITH list (covu defined) so the
    * PCA twin can extend it.
    */
  private[queries] val covPairsCtes: String = qzCte + """
    , cprs AS (
      SELECT CAST(ii.i AS INTEGER) AS i, CAST(jj.j AS INTEGER) AS j,
             z.q[CAST(ii.i AS INTEGER) + 1] AS xi, z.q[CAST(jj.j AS INTEGER) + 1] AS xj
      FROM qz z, range(0, 64) ii(i), range(0, 64) jj(j)
      WHERE jj.j >= ii.i
    ), cagg AS (
      SELECT i, j, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(xj) AS BIGINT) AS sy,
             CAST(sum(xi * xj) AS BIGINT) AS sxy
      FROM cprs GROUP BY 1, 2
    ), covu AS (
      SELECT i, j, n, sx, sy, sxy,
        CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
                   CAST(CAST(n AS HUGEINT) * n AS DOUBLE) + 0.5) AS BIGINT) AS cov_ppm
      FROM cagg
    )"""

  private[queries] val embCovarianceSql: String = covPairsCtes + """
    SELECT i, j, n, sx, sy, sxy, cov_ppm FROM covu"""

  /** EmbAlgebra.topComponent + projectScore twin: the driver's power
    * iteration replayed as SIX UNROLLED CTE rounds (the fixed-round
    * doctrine — `rounds <= 16` exists precisely so a SQL twin can unroll),
    * each round one exact integer mat-vec (HUGEINT-safe sums) and one
    * fixed-order double renormalization; then the Rayleigh quotient, the
    * convergence delta vs round 5, and the map-only integer projection of
    * every vector onto the fitted component.
    */
  private[queries] lazy val embPcaProjectSql: String = {
    val rounds = (1 to 6).map { k =>
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      s""", s$k AS (SELECT m.i, CAST(sum(m.c * v.v) AS BIGINT) AS s
           FROM covm m JOIN $prev v ON v.i = m.j GROUP BY 1),
         m$k AS (SELECT max(abs(s)) AS mx FROM s$k),
         v$k AS (SELECT i, CAST(floor(CAST(s AS DOUBLE) / CAST(mx AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v
           FROM s$k, m$k)"""
    }.mkString("\n")
    covPairsCtes + s"""
    , covm AS (SELECT i, j, cov_ppm AS c FROM covu
               UNION ALL SELECT j AS i, i AS j, cov_ppm AS c FROM covu WHERE i <> j),
    v0 AS (SELECT CAST(t.i AS INTEGER) AS i, CAST(1000000 AS BIGINT) AS v FROM range(0, 64) t(i))
    $rounds
    , lam AS (SELECT CAST(floor(CAST(nm.num AS DOUBLE) / CAST(dn.den AS DOUBLE) + 0.5) AS BIGINT) AS lambda_ppm
        FROM (SELECT sum(CAST(m.c AS HUGEINT) * va.v * vb.v) AS num
              FROM covm m JOIN v6 va ON va.i = m.i JOIN v6 vb ON vb.i = m.j) nm,
             (SELECT sum(CAST(v AS HUGEINT) * v) AS den FROM v6) dn),
    dl AS (SELECT CAST(max(abs(a.v - b.v)) AS BIGINT) AS conv_delta
           FROM v6 a JOIN v5 b ON b.i = a.i),
    vl AS (SELECT list(v ORDER BY i) AS vl FROM v6)
    SELECT z.vec_id,
      CAST(list_sum(list_transform(range(1, 65), d -> z.q[d] * vl.vl[d])) AS BIGINT) AS score,
      lam.lambda_ppm, dl.conv_delta
    FROM qz z CROSS JOIN vl CROSS JOIN lam CROSS JOIN dl"""
  }

  /** EmbAlgebra.topComponents twin: per component k over the (k−1)-times
    * deflated matrix — `rounds` unrolled power rounds (the embPcaProjectSql
    * shape), the Rayleigh lambda, then the rank-1 deflation
    * `c′ = c − floor(λ·v_i·v_j / (vᵀv) + 0.5)` in exact HUGEINT products
    * with one double division per entry. Ends inside the WITH list:
    * pccov{0..m−1} (matrices), pcv{k}_{rounds} (components), pclam{k}.
    */
  private[queries] def pcaFitCtes(m: Int, rounds: Int): String = {
    // MATERIALIZED everywhere: DuckDB inlines plain CTEs per reference,
    // and each power round references the previous round's vector twice —
    // 8 components × 6 rounds of doubling would inline the embeddings
    // scan exponentially many times (observed as file-handle exhaustion);
    // materializing pins every stage to ONE evaluation, which is also the
    // engine's execution shape (the driver model is computed once)
    val sb = new StringBuilder
    sb.append("""
    , pccov0 AS MATERIALIZED (SELECT i, j, cov_ppm AS c FROM covu
                 UNION ALL SELECT j AS i, i AS j, cov_ppm AS c FROM covu WHERE i <> j)""")
    for (k <- 1 to m) {
      val mat = s"pccov${k - 1}"
      // index-perturbed start 10⁶+i (see EmbAlgebra.topComponents: the
      // flat start can be exactly orthogonal to a deflated eigenvector)
      sb.append(s"""
    , pcv${k}_0 AS (SELECT CAST(t.i AS INTEGER) AS i, CAST(1000000 + t.i AS BIGINT) AS v FROM range(0, 64) t(i))""")
      for (r <- 1 to rounds) sb.append(s"""
    , pcs${k}_$r AS MATERIALIZED (SELECT m.i, CAST(sum(m.c * v.v) AS BIGINT) AS s
        FROM $mat m JOIN pcv${k}_${r - 1} v ON v.i = m.j GROUP BY 1),
      pcm${k}_$r AS (SELECT max(abs(s)) AS mx FROM pcs${k}_$r),
      pcv${k}_$r AS MATERIALIZED (SELECT i, CAST(floor(CAST(s AS DOUBLE) / CAST(mx AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS v
        FROM pcs${k}_$r, pcm${k}_$r)""")
      sb.append(s"""
    , pclam$k AS MATERIALIZED (SELECT CAST(floor(CAST(nm.num AS DOUBLE) / CAST(dn.den AS DOUBLE) + 0.5) AS BIGINT) AS lambda
        FROM (SELECT sum(CAST(m.c AS HUGEINT) * va.v * vb.v) AS num
              FROM $mat m JOIN pcv${k}_$rounds va ON va.i = m.i JOIN pcv${k}_$rounds vb ON vb.i = m.j) nm,
             (SELECT sum(CAST(v AS HUGEINT) * v) AS den FROM pcv${k}_$rounds) dn)""")
      if (k < m) sb.append(s"""
    , pccov$k AS MATERIALIZED (SELECT m.i, m.j,
          m.c - CAST(floor(CAST(CAST(l.lambda AS HUGEINT) * va.v * vb.v AS DOUBLE) /
                           CAST(d.den AS DOUBLE) + 0.5) AS BIGINT) AS c
        FROM $mat m
        JOIN pcv${k}_$rounds va ON va.i = m.i
        JOIN pcv${k}_$rounds vb ON vb.i = m.j,
        pclam$k l,
        (SELECT sum(CAST(v AS HUGEINT) * v) AS den FROM pcv${k}_$rounds) d)""")
    }
    sb.toString
  }

  /** emb_pca_topm twin: the m=8 deflated fits (pcaFitCtes) and the
    * map-only integer projection of every vector onto each component.
    */
  private[queries] lazy val embPcaTopmSql: String = {
    val m = 8
    val rounds = 6
    val compsUnion = (1 to m)
      .map(k =>
        s"""SELECT CAST($k AS BIGINT) AS pc, l.lambda,
           (SELECT list(v ORDER BY i) FROM pcv${k}_$rounds) AS vl FROM pclam$k l""")
      .mkString("\n          UNION ALL\n")
    covPairsCtes + pcaFitCtes(m, rounds) + s"""
    , pccomps AS ($compsUnion)
    SELECT z.vec_id, c.pc,
      CAST(list_sum(list_transform(range(1, 65), d -> z.q[d] * c.vl[d])) AS BIGINT) AS score,
      c.lambda AS lambda_ppm
    FROM qz z CROSS JOIN pccomps c"""
  }

  /** Twin of Similarity.cosine over quantized vectors of dimension n
    * (the 64-dim [[cosSql]] generalized for reduced spaces).
    */
  private[queries] def cosSqlDim(a: String, b: String, n: Int): String =
    s"""(CAST(list_sum(list_transform(range(1, ${n + 1}), i -> $a[i] * $b[i])) AS DOUBLE) /
        (sqrt(CAST(list_sum(list_transform(range(1, ${n + 1}), i -> $a[i] * $a[i])) AS DOUBLE)) *
         sqrt(CAST(list_sum(list_transform(range(1, ${n + 1}), i -> $b[i] * $b[i])) AS DOUBLE))))"""

  /** ann_pca_reduced twin: the PCA fit (pcaFitCtes), the milli-grid
    * reduction `floor(score/10⁶ + 0.5) × 1000` (×1000 is the serving
    * path's quantize of the exact-in-FLOAT reduced coordinate), the
    * ann_ivf_topk chain at dimension m over the reduced vectors, the
    * full-dimension brute-force truth (recallAuditSql's verbatim), and
    * one exact-ppm recall row.
    */
  private[queries] lazy val annPcaReducedSql: String = {
    val m = 8
    val rounds = 6
    val gate = md5GateSql("vec_id", 8)
    val gateA = md5GateSql("a.vec_id", 8)
    val compsUnion = (1 to m)
      .map(k =>
        s"""SELECT CAST($k AS BIGINT) AS pc,
           (SELECT list(v ORDER BY i) FROM pcv${k}_$rounds) AS vl FROM pclam$k""")
      .mkString("\n          UNION ALL\n")
    covPairsCtes + pcaFitCtes(m, rounds) + s"""
    , pccomps AS MATERIALIZED ($compsUnion)
    , pcred AS MATERIALIZED (
      SELECT z.vec_id,
        list(CAST(floor(CAST(CAST(list_sum(list_transform(range(1, 65), d -> z.q[d] * c.vl[d])) AS BIGINT) AS DOUBLE)
                  / 1000000 + 0.5) AS BIGINT) * 1000 ORDER BY c.pc) AS q
      FROM qz z CROSS JOIN pccomps c GROUP BY z.vec_id)
    , r_cent AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, q AS cq
      FROM (SELECT vec_id, q FROM pcred ORDER BY vec_id LIMIT 16))
    , r_cdist AS (
      SELECT z.vec_id, c.cell,
             list_sum(list_transform(range(1, ${m + 1}), i -> (z.q[i] - c.cq[i]) * (z.q[i] - c.cq[i]))) AS d
      FROM pcred z CROSS JOIN r_cent c)
    , r_assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM r_cdist) WHERE rn = 1)
    , r_qprobe AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
        FROM r_cdist WHERE $gate) WHERE rn <= 4)
    , r_cand AS (
      SELECT DISTINCT p.query_id, a.vec_id AS cand_id
      FROM r_qprobe p JOIN r_assign a ON a.cell = p.cell
      WHERE a.vec_id <> p.query_id)
    , r_scored AS (
      SELECT u.query_id, u.cand_id, ${cosSqlDim("qa.q", "qb.q", m)} AS sim
      FROM r_cand u
      JOIN pcred qa ON qa.vec_id = u.query_id
      JOIN pcred qb ON qb.vec_id = u.cand_id)
    , r_top AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
        FROM r_scored) WHERE rank <= 5)
    , t_pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS cand_id
      FROM qz a CROSS JOIN qz b
      WHERE $gateA AND a.vec_id <> b.vec_id)
    , t_scored AS (
      SELECT p.query_id, p.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
      FROM t_pairs p
      JOIN qz qa ON qa.vec_id = p.query_id
      JOIN qz qb ON qb.vec_id = p.cand_id)
    , truth AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
        FROM t_scored) WHERE rank <= 5)
    , rb AS (
      SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
             CAST(count(*) AS BIGINT) AS n_truth
      FROM truth)
    SELECT 'ivf_pca_m8' AS ranker, b.n_queries, b.n_truth, h.n_hits,
           h.n_hits * 1000000 // b.n_truth AS recall_ppm
    FROM rb b CROSS JOIN
      (SELECT CAST(count(*) AS BIGINT) AS n_hits
       FROM r_top x JOIN truth t USING (query_id, cand_id)) h"""
  }

  /** EmbAlgebra.jlDistortion twin: the SAME md5-derived SRP coefficients
    * the LSH buckets use (recomputed in SQL, no literals), per-plane
    * integer projections, gated-pair exact dots, the shared
    * cosineOfSums double formula for both spaces, and the 1%-wide ppm
    * bucket histogram.
    */
  private[queries] lazy val embJlDistortionSql: String = {
    def coef(p: Int) =
      s"(CAST(concat('0x', substr(md5(concat('${p}_', CAST(i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) % 1000 - 500)"
    val projs = (0 until 6)
      .map(p => s"list_sum(list_transform(range(1, 65), i -> q[i] * ${coef(p)}))")
      .mkString("[", ",\n            ", "]")
    qzCte + s"""
    , gated AS (
      SELECT vec_id, q, $projs AS p
      FROM qz WHERE ${md5GateSql("vec_id", 4)}
    ), gp AS (
      SELECT vec_id, q, p,
        CAST(list_sum(list_transform(range(1, 65), i -> q[i] * q[i])) AS BIGINT) AS qq,
        CAST(list_sum(list_transform(range(1, 7), k -> p[k] * p[k])) AS BIGINT) AS pp
      FROM gated
    ), jprs AS (
      SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
        CAST(list_sum(list_transform(range(1, 65), i -> a.q[i] * b.q[i])) AS BIGINT) AS sq,
        CAST(list_sum(list_transform(range(1, 7), k -> a.p[k] * b.p[k])) AS BIGINT) AS sp,
        a.qq AS qqa, b.qq AS qqb, a.pp AS ppa, b.pp AS ppb
      FROM gp a CROSS JOIN gp b
      WHERE a.vec_id < b.vec_id AND a.qq > 0 AND b.qq > 0 AND a.pp > 0 AND b.pp > 0
    ), dd AS (
      SELECT CAST(floor((CAST(sp AS DOUBLE) / (sqrt(CAST(ppa AS DOUBLE)) * sqrt(CAST(ppb AS DOUBLE)))
                   - CAST(sq AS DOUBLE) / (sqrt(CAST(qqa AS DOUBLE)) * sqrt(CAST(qqb AS DOUBLE))))
                  * 1000000 + 0.5) AS BIGINT) AS d_ppm
      FROM jprs)
    SELECT CAST(floor(CAST(d_ppm AS DOUBLE) / 10000.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM dd GROUP BY 1"""
  }

  private[queries] def srpBucketSql(planes: Int, offset: Int = 0): String =
    (0 until planes)
      .map { j =>
        val p = offset + j
        s"""(CASE WHEN list_sum(list_transform(range(1, 65), i -> q[i] *
           (CAST(concat('0x', substr(md5(concat('${p}_', CAST(i - 1 AS VARCHAR))), 1, 8)) AS BIGINT)
            % 1000 - 500))) >= 0 THEN ${1 << j} ELSE 0 END)"""
      }
      .mkString(" + ")

  /** Twin of Similarity.cosine over quantized vectors. */
  /** DSIR oracle prefix shared by the score and selection twins: hashed
    * token buckets (md5 first-8-hex mod 256, the Hashing.md5Long gate),
    * raw/target bucket counts, and the integer-ratio weight table —
    * Curation.dsirBucketWeights replayed verbatim. DuckDB sums BIGINT
    * into HUGEINT, so consumers cast the final sum back to BIGINT.
    */
  private[queries] val dsirCtesSql: String = """
    WITH toks AS (
      SELECT doc_id, lang, t AS tok FROM (
        SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        FROM documents) u
      WHERE t <> ''
    ), tb AS (
      SELECT doc_id, lang,
        CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 256 AS bucket
      FROM toks
    ), cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM tb GROUP BY bucket
    ), ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM tb WHERE lang = 'en' GROUP BY bucket
    ), tot AS (
      SELECT CAST((SELECT count(*) FROM tb) AS BIGINT) AS r_tot,
             CAST((SELECT count(*) FROM tb WHERE lang = 'en') AS BIGINT) AS t_tot
    ), wt AS (
      SELECT g.range AS bucket,
        (1000000 * (COALESCE(ct.ct, 0) + 1) * (tot.r_tot + 256))
          // ((COALESCE(cr.cr, 0) + 1) * (tot.t_tot + 256)) AS w
      FROM range(0, 256) g
      LEFT JOIN ct ON ct.bucket = g.range
      LEFT JOIN cr ON cr.bucket = g.range
      CROSS JOIN tot
    )"""

  /** The full DSIR scoring twin — shared verbatim by the batch query and
    * the streaming parity surface (layout differs, meaning must not).
    */
  private[queries] val dsirScoresSql: String = dsirCtesSql + """
         SELECT tb.doc_id, CAST(sum(wt.w) AS BIGINT) AS score
         FROM tb JOIN wt USING (bucket) GROUP BY tb.doc_id"""

  /** Temperature-mix twin — shared verbatim by the batch query and the
    * streaming serving-gate parity surface. Mirrors Curation.keepRates:
    * per-stratum keep rate computed once on the tiny counts table in
    * HUGEINT (exact — the old per-row BIGINT triple product overflowed
    * past √n̅_b·n_s ≈ 9·10¹²), per-row gate a single compare. The
    * null-safe join and `s NULLS FIRST` tie-break match Spark's `<=>`
    * join and NULLS-FIRST ascending sort.
    */
  private[queries] val tempMixSql: String =
    """WITH c AS (SELECT source AS s, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         u AS (SELECT s, n,
                 CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS u
               FROM c),
         b AS (SELECT n AS nb, u AS ub FROM (
                 SELECT *, row_number() OVER (
                   ORDER BY CAST(n AS DOUBLE) / CAST(u AS DOUBLE), s NULLS FIRST) AS rk
                 FROM u) WHERE rk = 1),
         r AS (SELECT u.s,
                 CAST(CAST(b.nb AS HUGEINT) * u.u * 1000000
                      // (CAST(b.ub AS HUGEINT) * u.n) AS BIGINT) AS r
               FROM u CROSS JOIN b)
         SELECT d.doc_id, d.source
         FROM documents d JOIN r ON r.s IS NOT DISTINCT FROM d.source
         WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
               < r.r"""

  /** Shared by text_nb_confusion and stream_nb_classify_parity: the full
    * multinomial-NB fit + per-held-out-doc argmax (millinat log-probs,
    * class-asc tiebreak) up to the ranked `prd` CTE — the two consumers
    * differ only in the final select (confusion rollup vs per-doc
    * predictions).
    */
  private[queries] val nbPrdCte: String =
    """WITH base AS (
           SELECT doc_id, lang AS label,
                  regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w,
                  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 800 AS is_train
           FROM documents),
         pd AS (SELECT doc_id, label, is_train, tok, CAST(count(*) AS BIGINT) AS m
                FROM (SELECT doc_id, label, is_train, unnest(w) AS tok FROM base)
                WHERE length(tok) > 0 GROUP BY 1, 2, 3, 4),
         vocab AS (SELECT tok FROM (
             SELECT tok, sum(m) AS c FROM pd WHERE is_train GROUP BY tok
             ORDER BY c DESC, tok ASC LIMIT 64)),
         classes AS (SELECT label AS cls, CAST(count(*) AS BIGINT) AS n_docs
                     FROM base WHERE is_train GROUP BY 1),
         ntr AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM classes),
         vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
         cnt AS (SELECT label AS cls, tok, CAST(sum(m) AS BIGINT) AS c
                 FROM pd JOIN vocab USING (tok) WHERE is_train GROUP BY 1, 2),
         tot AS (SELECT cls, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
         ll AS (SELECT v.tok, cl.cls,
                  CAST(round(1000.0 * ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) /
                                         CAST(t.t + vs.v AS DOUBLE)), 0) AS BIGINT) AS ll
                FROM vocab v
                CROSS JOIN (SELECT cls FROM classes) cl
                LEFT JOIN cnt c ON c.tok = v.tok AND c.cls = cl.cls
                JOIN tot t ON t.cls = cl.cls
                CROSS JOIN vs),
         pri AS (SELECT cls, CAST(round(1000.0 * ln(CAST(n_docs AS DOUBLE) / CAST(n.n AS DOUBLE)), 0) AS BIGINT) AS pr
                 FROM classes CROSS JOIN ntr n),
         trm AS (SELECT pd.doc_id, ll.cls, CAST(sum(pd.m * ll.ll) AS BIGINT) AS s
                 FROM pd JOIN ll USING (tok) WHERE NOT pd.is_train GROUP BY 1, 2),
         sc AS (SELECT b.doc_id, b.label, p.cls, p.pr + coalesce(t.s, 0) AS score
                FROM (SELECT doc_id, label FROM base WHERE NOT is_train) b
                CROSS JOIN pri p
                LEFT JOIN trm t ON t.doc_id = b.doc_id AND t.cls = p.cls),
         prd AS (SELECT doc_id, label, cls,
                   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rk
                 FROM sc)"""

  private[queries] val nbConfusionSql: String = nbPrdCte + """
         SELECT label, cls AS predicted, CAST(count(*) AS BIGINT) AS n_docs
         FROM prd WHERE rk = 1 GROUP BY 1, 2"""

  private[queries] val nbPredictionsSql: String = nbPrdCte + """
         SELECT doc_id, label, cls AS predicted FROM prd WHERE rk = 1"""

  /** Shared by ingest_json_quarantine and its streaming twin: the same
    * deterministic payload synthesis + json_valid routing.
    */
  private[queries] val ingestQuarantineSql: String =
    """WITH raw AS (SELECT doc_id,
             concat('{"id":', CAST(doc_id AS VARCHAR), ',"lang":"', coalesce(lang, 'xx'),
                    '","n":', CAST(n_chars AS VARCHAR), '}') AS p0
           FROM documents),
         j AS (SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN substr(p0, 2)
                  WHEN doc_id % 11 = 5 THEN concat('garbage-', CAST(doc_id AS VARCHAR))
                  ELSE p0 END AS payload FROM raw),
         p AS (SELECT doc_id, payload,
             CASE WHEN json_valid(payload)
                  THEN json_extract(payload, '$.id') IS NOT NULL
                       AND json_extract_string(payload, '$.lang') IS NOT NULL
                       AND json_extract(payload, '$.n') IS NOT NULL
                  ELSE false END AS ok
           FROM j)
         SELECT doc_id, ok AS ingest_ok,
           CASE WHEN ok THEN json_extract_string(payload, '$.lang') END AS lang_parsed,
           CASE WHEN ok THEN CAST(json_extract(payload, '$.n') AS BIGINT) END AS n_parsed
         FROM p"""

  /** Shared by ev_asof_join and stream_asof_parity: the DuckDB ASOF LEFT
    * JOIN with the engine's greatest-tie rule pre-applied per instant.
    */
  private[queries] val evAsofJoinSql: String =
    """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
       p0 AS (SELECT user_id, ts, value,
                row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
              FROM events WHERE event_type = 'purchase'),
       p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
       SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
              epoch_us(p.ts) AS purchase_us, p.value AS purchase_value
       FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts"""

  /** Shared by ev_asof_nearest and stream_nearest_parity: backward +
    * forward DuckDB ASOF joins combined with the same strict-< forward
    * pick and backward tie rule the engine applies.
    */
  private[queries] val evAsofNearestSql: String =
    """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
       p0 AS (SELECT user_id, ts, value,
                row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
              FROM events WHERE event_type = 'purchase'),
       p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1),
       b AS (SELECT c.event_id, c.user_id, c.ts, p.ts AS bts, p.value AS bval
             FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts),
       f AS (SELECT c.event_id, p.ts AS fts, p.value AS fval
             FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts),
       j AS (SELECT b.event_id, b.user_id, b.ts, b.bts, b.bval, f.fts, f.fval,
               (b.bts IS NULL OR (f.fts IS NOT NULL AND
                  epoch_us(f.fts) - epoch_us(b.ts) < epoch_us(b.ts) - epoch_us(b.bts)))
                 AS pick_f
             FROM b JOIN f USING (event_id))
       SELECT event_id, user_id, epoch_us(ts) AS ts_us,
              CASE WHEN pick_f THEN epoch_us(fts) ELSE epoch_us(bts) END AS purchase_us,
              CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
                   WHEN pick_f THEN 'F' ELSE 'B' END AS asof_dir,
              CASE WHEN pick_f THEN fval ELSE bval END AS purchase_value
       FROM j"""

  /** Shared by ev_attribution_linear and stream_lookback_parity: 3-day
    * lookback join + integer-cent linear split, remainder to the most
    * recent touch.
    */
  private[queries] val evAttributionLinearSql: String =
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
              CAST(cents // n_touches +
                   CASE WHEN rn = 1 THEN cents % n_touches ELSE 0 END AS BIGINT) AS credit_cents
       FROM w"""

  private[queries] def cosSql(a: String, b: String): String =
    s"""(CAST(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i])) AS DOUBLE) /
        (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i])) AS DOUBLE)) *
         sqrt(CAST(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i])) AS DOUBLE))))"""

  /** The Hashing.md5Long eval-stratum gate as SQL: md5 first-8-hex mod m. */
  private[queries] def md5GateSql(x: String, m: Int): String =
    s"CAST(concat('0x', substr(md5(CAST($x AS VARCHAR)), 1, 8)) AS BIGINT) % $m = 0"

  /** ann_recall_audit twin: brute-force truth plus all three approximate
    * ranker chains (the ann_lsh_topk / ann_ivf_topk / ann_pq_topk oracle
    * CTEs verbatim, re-gated to the md5 eval stratum and CTE-prefixed so
    * they compose), then recall as exact integer ppm per ranker.
    */
  private[queries] lazy val recallAuditSql: String = {
    val gate = md5GateSql("vec_id", 8)
    val gateA = md5GateSql("a.vec_id", 8)
    def hitRow(name: String, top: String): String =
      s"""SELECT '$name' AS ranker, b.n_queries, b.n_truth, h.n_hits,
            h.n_hits * 1000000 // b.n_truth AS recall_ppm
          FROM rb b CROSS JOIN
            (SELECT CAST(count(*) AS BIGINT) AS n_hits
             FROM $top x JOIN truth t USING (query_id, cand_id)) h"""
    qzCte + pqSubspaceCtesSql(4, 4, 16) + s"""
        -- exact truth on the stratum (bruteForceTopK's separate-sqrt cosine)
        , t_pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id
          FROM qz a CROSS JOIN qz b
          WHERE $gateA AND a.vec_id <> b.vec_id
        ), t_scored AS (
          SELECT p.query_id, p.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM t_pairs p
          JOIN qz qa ON qa.vec_id = p.query_id
          JOIN qz qb ON qb.vec_id = p.cand_id
        ), truth AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
            FROM t_scored) WHERE rank <= 5
        )
        -- SRP-LSH chain (ann_lsh_topk verbatim, l_-prefixed)
        , l_bkt AS (
${(0 until 4).map(t => s"          SELECT vec_id, q, $t AS tbl, ${srpBucketSql(6, t * 6)} AS bucket FROM qz").mkString("\n          UNION ALL\n")}
        ), l_probes AS (
          SELECT vec_id AS query_id, tbl,
                 unnest(list_distinct([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
                                       xor(bucket, 8), xor(bucket, 16), xor(bucket, 32)])) AS bucket
          FROM l_bkt WHERE $gate
        ), l_cand AS (
          SELECT DISTINCT p.query_id, c.vec_id AS cand_id
          FROM l_probes p JOIN l_bkt c ON c.tbl = p.tbl AND c.bucket = p.bucket
          WHERE c.vec_id <> p.query_id
        ), l_scored AS (
          SELECT u.query_id, u.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM l_cand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        ), l_top AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
            FROM l_scored) WHERE rank <= 5
        )
        -- IVF chain (ann_ivf_topk verbatim, i_-prefixed)
        , i_cent AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, q AS cq
          FROM (SELECT vec_id, q FROM qz ORDER BY vec_id LIMIT 16)
        ), i_cdist AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, 65), i -> (z.q[i] - c.cq[i]) * (z.q[i] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN i_cent c
        ), i_assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM i_cdist) WHERE rn = 1
        ), i_qprobe AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM i_cdist WHERE $gate) WHERE rn <= 4
        ), i_cand AS (
          SELECT DISTINCT p.query_id, a.vec_id AS cand_id
          FROM i_qprobe p JOIN i_assign a ON a.cell = p.cell
          WHERE a.vec_id <> p.query_id
        ), i_scored AS (
          SELECT u.query_id, u.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM i_cand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        ), i_top AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rank
            FROM i_scored) WHERE rank <= 5
        )
        -- PQ/ADC chain (ann_pq_topk's subspace CTEs above, p_-prefixed tail)
        , p_pairs AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand_id
          FROM qz a CROSS JOIN qz b
          WHERE $gateA AND a.vec_id <> b.vec_id
        ), p_scored AS (
          SELECT p.query_id, p.cand_id,
                 CAST(${pqAdcSumSql(4)} AS BIGINT) AS adc
          FROM p_pairs p
          ${pqAdcJoinsSql(4, "p")}
        ), p_top AS (
          SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY adc, cand_id) AS rk
            FROM p_scored) WHERE rk <= 5
        )
        , rb AS (
          SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n_queries,
                 CAST(count(*) AS BIGINT) AS n_truth
          FROM truth
        )
        ${hitRow("ivf_16_4", "i_top")}
        UNION ALL
        ${hitRow("lsh_srp_4t", "l_top")}
        UNION ALL
        ${hitRow("pq_adc_4x4", "p_top")}"""
  }

}
