package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** Layout & mutation family: compaction, z-order, manifests, point
  * lookups, SCD/MERGE/changelog maintenance, salted/bloom joins.
  *
  * Split out of Extensions.scala (round 15): same entries, same maps —
  * [[Extensions]] aggregates the families, so the driver contract
  * (SparkEntry.queries / oracleSql) is unchanged.
  */
private[queries] object QLayout {
  import QShared._
  import OracleSql._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // shuffle total (see ChangeOps.applyChangelog)
    "scd_changelog_apply" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val upserts = base
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
        .withColumn("seq", lit(1L))
      val deletes = base
        .filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D"))
        .withColumn("seq", lit(2L))
      graft.ops.ChangeOps.applyChangelog(
        base, upserts.unionByName(deletes), Seq("o_orderkey"), "op", "seq")
    },
    // SCD Type-2 history from the same deterministic changelog: base rows
    // enter as seq-0 upserts; every 7th order re-priced at seq 1, every
    // 11th deleted at seq 2 — one validity interval per upsert, deletes
    // close their predecessor's interval
    // time travel: the table AS OF sequence time 2 — upserted keys show
    // their seq-1 version, keys deleted at seq 2 are absent (an interval
    // filter, not a join; the snapshot is a scan predicate)
    // snapshot DIFF — the inverse of the apply: derive I/U/D between two
    // full extracts when the source has no CDC feed; one full-outer join,
    // null-safe payload compare, change-proportional output
    // incremental VIEW maintenance: the per-(event_type, day) count+sum
    // view maintained from a signed delta batch (inserts +1, retractions
    // −1) — cost O(|delta|+touched groups), NO join, no base rescan; the,
    // oracle proves the invariant by full recompute over the net row set
    "mv_delta_maintain" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir).select(
        col("event_type"),
        to_date(col("ts")).as("day"),
        col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      val inBase = col("event_id") % 3 =!= 0
      val baseView = ev
        .filter(inBase)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), sum(coalesce(col("cents"), lit(0L))).as("sum_v"))
      val inserts = ev.filter(!inBase).withColumn("w", lit(1L))
      val retractions = ev.filter(inBase && col("event_id") % 11 === 0)
        .withColumn("w", lit(-1L))
      graft.ops.ChangeOps
        .maintainAggView(
          baseView, inserts.unionByName(retractions),
          Seq("event_type", "day"), col("w"), col("cents"))
        .select(
          col("event_type"), col("day"),
          col("cnt").cast("long").as("cnt"),
          col("sum_v").cast("long").as("sum_cents"))
    },
    "scd_snapshot_diff" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val prev = base.filter(col("o_orderkey") % 7 =!= 0)
      val next = base
        .filter(col("o_orderkey") % 5 =!= 0)
        .withColumn(
          "o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      graft.ops.ChangeOps.snapshotDiff(prev, next, "o_orderkey")
    },
    // clause-driven MERGE INTO (the lakehouse upsert API): matched+flag →
    // delete, matched → source payload wins, unmatched source → insert
    // (suppressed when delete-flagged), unmatched target passes through;,
    // ONE null-safe full-outer join, change-proportional with a small src
    "scd_merge_into" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = base
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      val deletes = base.filter(col("o_orderkey") % 11 === 0)
      val inserts = base
        .filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 11000000L)
      graft.ops.ChangeOps.mergeInto(
        base, updates.unionByName(deletes).unionByName(inserts),
        "o_orderkey", col("o_orderkey") % 11 === 0)
    },
    // merge admission gate: duplicate-key source rows multiply matched
    // target rows through the merge's full-outer join, so the conflict
    // audit runs BEFORE a merge — one summary row (0/0 on this
    // contract-respecting source; nonzero = abort). Same source frame as,
    // scd_merge_into, one partial-agg'd count.
    "merge_conflicts" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = base
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      val deletes = base.filter(col("o_orderkey") % 11 === 0)
      val inserts = base
        .filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 11000000L)
      graft.ops.ChangeOps
        .mergeConflicts(updates.unionByName(deletes).unionByName(inserts), "o_orderkey")
        .agg(
          count(lit(1)).as("n_conflict_keys"),
          coalesce(sum(col("n_rows")), lit(0L)).as("n_conflict_rows"))
    },
    "scd_snapshot_at" -> { (s, dir) =>
      val base = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val asInserts = base.withColumn("op", lit("U")).withColumn("seq", lit(0L))
      val upserts = base
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
        .withColumn("seq", lit(1L))
      val deletes = base
        .filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D"))
        .withColumn("seq", lit(2L))
      graft.ops.ChangeOps.snapshotAt(
        graft.ops.ChangeOps.changelogHistory(
          asInserts.unionByName(upserts).unionByName(deletes),
          Seq("o_orderkey"), "op", "seq"),
        t = 2L)
    },
    "scd_history" -> { (s, dir) =>
      val base = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val asInserts = base.withColumn("op", lit("U")).withColumn("seq", lit(0L))
      val upserts = base
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
        .withColumn("seq", lit(1L))
      val deletes = base
        .filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D"))
        .withColumn("seq", lit(2L))
      graft.ops.ChangeOps.changelogHistory(
        asInserts.unionByName(upserts).unionByName(deletes),
        Seq("o_orderkey"), "op", "seq")
    },
    // deterministic training-order shuffle: md5-derived (shard, pos)
    // coordinates — the reproducible global interleave a training run,
    // group, no per-group sort); oracle is the window-rank truth
    "w4_topk_per_group" -> { (s, dir) =>
      graft.ops.ReshapeOps.topKPerGroup(
        t(s, dir, "documents"), col("source"), col("n_chars"), col("doc_id"), k = 3)
    },
    // EXACT set-similarity join (Jaccard ≥ 19/20) by prefix filtering —
    // recall by theorem, precision by verify: the output IS the truth,
    // so the oracle computes it directly with no pruning replay,
    // the file-count drop itself is asserted in LayoutOpsSpec
    "layout_compact" -> { (s, dir) =>
      val frag = Scratch.dir("layout_frag", dir)
      Scratch.once(frag) {
        t(s, dir, "orders")
          .repartition(12)
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(frag)
      }
      val compacted = Scratch.dir("layout_compacted", dir)
      Scratch.once(compacted) {
        graft.ops.LayoutOps.compact(
          s, frag, compacted, "o_orderpriority", targetRowsPerFile = 4096)
      }
      s.read.parquet(compacted)
    },
    // file-level data skipping (the lakehouse manifest read path): a
    // range-clustered unpartitioned layout + its min/max manifest answer
    // a key-range predicate opening only the files that can match — the
    // oracle (the plain filtered table) proves no row is lost or invented;,
    // the file-count drop itself is asserted in LayoutOpsSpec
    "layout_skipping_scan" -> { (s, dir) =>
      val ranged = Scratch.dir("layout_ranged", dir)
      Scratch.once(ranged) {
        t(s, dir, "orders")
          .repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite").parquet(ranged)
      }
      val m = graft.ops.LayoutOps.manifest(s, ranged, Seq("o_orderkey"))
      // one-row scalar collect: the global max is table metadata, the
      // probe bound is its lowest decile (floor division, engine-exact)
      val maxKey = m.agg(max(col("max_o_orderkey"))).collect()(0).getLong(0)
      graft.ops.LayoutOps.skippingScan(
        s, ranged, m, "o_orderkey", lo = 1L, hi = maxKey / 10)
    },
    // incremental manifest maintenance: half the layout's files seed the
    // manifest, manifestAppend folds in the rest scanning ONLY them; the
    // maintained manifest's global rollup must equal the table's own,
    // stats — which is what the oracle checks without seeing file paths
    "layout_manifest_maintain" -> { (s, dir) =>
      val ranged = Scratch.dir("layout_ranged", dir)
      Scratch.once(ranged) {
        t(s, dir, "orders")
          .repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite").parquet(ranged)
      }
      // driver-side listing diff — metadata, like a transaction-log read
      val all = s.read.parquet(ranged).inputFiles.sorted
      val prior = graft.ops.LayoutOps.manifestOf(
        s.read.parquet(all.take(all.length / 2).toIndexedSeq: _*), Seq("o_orderkey"))
      graft.ops.LayoutOps
        .manifestAppend(s, ranged, prior, Seq("o_orderkey"))
        .agg(
          sum(col("n_rows")).cast("long").as("n_rows"),
          min(col("min_o_orderkey")).as("min_key"),
          max(col("max_o_orderkey")).as("max_key"))
    },
    // the full OPTIMIZE story: a Z-ORDERED layout + the min/max manifest
    // skip files on a predicate over EITHER interleaved dimension — the
    // reason lakehouses z-order at all (a linear sort only bounds its,
    // leading column; the Morton curve bounds both per file)
    "layout_zorder_skip" -> { (s, dir) =>
      val zdir = Scratch.dir("layout_z2d", dir)
      Scratch.once(zdir) {
        graft.ops.ZOrderOps
          .zorderLayout(
            t(s, dir, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity")),
            "l_partkey", "l_suppkey", bits = 15, partitions = 8)
          .drop("zval")
          .write.mode("overwrite").parquet(zdir)
      }
      val m = graft.ops.LayoutOps.manifest(s, zdir, Seq("l_partkey", "l_suppkey"))
      // one-row scalar collect (table metadata); probe the lowest 5% of
      // one dimension — the z-curve bounds BOTH dims per file, so either
      // dimension prunes (LayoutOpsSpec asserts both)
      val maxPart = m.agg(max(col("max_l_partkey"))).collect()(0).getLong(0)
      graft.ops.LayoutOps.skippingScan(s, zdir, m, "l_partkey", lo = 1L, hi = maxPart / 20)
    },
    // file-level point lookup (the equality twin of the min/max skip):
    // a hash-bucket posting index over the SAME range-clustered layout
    // routes an IN-list probe to the files that can hold those keys; the,
    // residual filter makes collisions an I/O cost, never a wrong row
    "layout_point_lookup" -> { (s, dir) =>
      val ranged = Scratch.dir("layout_ranged", dir)
      Scratch.once(ranged) {
        t(s, dir, "orders")
          .repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite").parquet(ranged)
      }
      val idx = graft.ops.LayoutOps.bucketIndex(s, ranged, "o_orderkey", buckets = 4096)
      graft.ops.LayoutOps.pointLookupScan(
        s, ranged, idx, "o_orderkey", keys = Seq(1L, 2L, 3L, 5L, 7L), buckets = 4096)
    },
    // Z-order (Morton) clustering value: the exact bit-interleave every
    // row would be laid out by — the layout itself is asserted in,
    // ZOrderSpec; the oracle checks the curve arithmetic per row
    "layout_zorder" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          ZOrderOps.zValue(col("l_partkey"), col("l_suppkey"), bits = 15).as("zval"))
    },
    // benchmark decontamination: every 50th doc plays the eval set; train,
    // to the direct aggregate (algebraic functions commute with sharding)
    "agg_salted_skew" -> { (s, dir) =>
      graft.ops.SkewOps.saltedAgg(
        t(s, dir, "documents"), col("source"), col("n_chars"), col("doc_id"), salts = 16)
    },
    // the join-side skew pattern: salted equi-join, result identical to
    // the plain join (each big row meets its dim rows in one shard); the,
    // salt count is auto-derived from a count-min key-frequency pre-pass
    "j8_salted_join" -> { (s, dir) =>
      graft.ops.SkewOps.saltedJoinAuto(
        t(s, dir, "lineitem").select(col("l_suppkey"), col("l_orderkey"), col("l_quantity")),
        t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"), col("s_name")),
        "l_suppkey", col("l_orderkey"))
    },
    // bloom-gated shuffle join: probe rows whose key can't be in the
    // build side are dropped MAP-SIDE before the exchange; no false
    // negatives → identical to the plain join the oracle runs, for any,
    // (m, k) — sketch sizing tunes shuffle bytes, never the answer
    "j9_bloom_gated_join" -> { (s, dir) =>
      graft.ops.LinkOps
        .bloomGatedJoin(
          t(s, dir, "lineitem").select(col("l_partkey"), col("l_quantity")),
          t(s, dir, "part").filter(col("p_size") === 10).select(col("p_partkey"), col("p_name")),
          "l_partkey", "p_partkey", m = 1L << 14, k = 4)
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
    },
    // exact-size-k deterministic sample — TakeOrdered over the md5 hash,
    // no global sort, retry-stable (vs rand()),
  )

  val oracles: Map[String, String] = Map(
    "scd_changelog_apply" -> changelogApplySql,
    // merge twin: the clause outcomes enumerated over the key arithmetic,
    "scd_merge_into" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
                       FROM orders)
         SELECT k AS o_orderkey, st AS o_orderstatus, tp AS o_totalprice
         FROM base WHERE k % 11 <> 0 AND NOT (k % 7 = 0)
         UNION ALL
         SELECT k, st, tp + 1000 FROM base WHERE k % 7 = 0 AND k % 11 <> 0
         UNION ALL
         SELECT k + 11000000, st, tp FROM base
         WHERE k % 13 = 0 AND (k + 11000000) % 11 <> 0""",
    // merge source-uniqueness audit: replay the same source union, count,
    // keys with multiplicity > 1 (none on fixtures)
    "merge_conflicts" ->
      """WITH src AS (
           SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
           UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 11 = 0
           UNION ALL SELECT o_orderkey + 11000000 FROM orders WHERE o_orderkey % 13 = 0),
         c AS (SELECT k, count(*) AS n FROM src GROUP BY k HAVING count(*) > 1)
         SELECT CAST(count(*) AS BIGINT) AS n_conflict_keys,
                CAST(coalesce(sum(n), 0) AS BIGINT) AS n_conflict_rows
         FROM c""",
    // IVM invariant twin: the maintained view must equal a FULL recompute
    // over the net row set (base minus retracted plus inserted) — the,
    // oracle does that recompute directly, never seeing the delta path
    "mv_delta_maintain" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS BIGINT)
                  AS sum_cents
         FROM events
         WHERE event_id % 3 = 0 OR event_id % 11 <> 0
         GROUP BY 1, 2""",
    // snapshot twin: the history CTE filtered to intervals covering t=2,
    "scd_snapshot_diff" ->
      """WITH p AS (SELECT o_orderkey k, o_orderstatus s, o_totalprice t
                    FROM orders WHERE o_orderkey % 7 <> 0),
         n AS (SELECT o_orderkey k, o_orderstatus s,
                      CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1 ELSE o_totalprice END t
               FROM orders WHERE o_orderkey % 5 <> 0),
         j AS (SELECT p.k pk, p.s ps, p.t pt, n.k nk, n.s ns, n.t nt
               FROM p FULL OUTER JOIN n ON p.k = n.k),
         c AS (SELECT *, CASE WHEN pk IS NULL THEN 'I' WHEN nk IS NULL THEN 'D'
                              WHEN NOT (ps IS NOT DISTINCT FROM ns AND pt IS NOT DISTINCT FROM nt)
                              THEN 'U' END AS op
               FROM j)
         SELECT coalesce(nk, pk) AS o_orderkey,
                CASE WHEN op = 'D' THEN ps ELSE ns END AS o_orderstatus,
                CASE WHEN op = 'D' THEN pt ELSE nt END AS o_totalprice,
                op
         FROM c WHERE op IS NOT NULL""",
    "scd_snapshot_at" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
         rows AS (
           SELECT o_orderkey, o_totalprice, 0 AS vf,
             CASE WHEN o_orderkey % 7 = 0 THEN 1
                  WHEN o_orderkey % 11 = 0 THEN 2 END AS vt
           FROM base
           UNION ALL
           SELECT o_orderkey, o_totalprice + 1000, 1,
             CASE WHEN o_orderkey % 11 = 0 THEN 2 END
           FROM base WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_totalprice, CAST(vf AS BIGINT) AS valid_from
         FROM rows WHERE vf <= 2 AND (vt IS NULL OR 2 < vt)""",
    "scd_history" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
         rows AS (
           SELECT o_orderkey, o_totalprice, 0 AS vf,
             CASE WHEN o_orderkey % 7 = 0 THEN 1
                  WHEN o_orderkey % 11 = 0 THEN 2 END AS vt
           FROM base
           UNION ALL
           SELECT o_orderkey, o_totalprice + 1000, 1,
             CASE WHEN o_orderkey % 11 = 0 THEN 2 END
           FROM base WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_totalprice,
           CAST(vf AS BIGINT) AS valid_from,
           CAST(vt AS BIGINT) AS valid_to,
           (vt IS NULL) AS is_current
         FROM rows""",
    "w4_topk_per_group" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY n_chars DESC, doc_id DESC) AS rn
                    FROM documents)
         SELECT source AS grp, CAST(rn AS INTEGER) AS rank,
                CAST(n_chars AS BIGINT) AS value, doc_id AS id
         FROM r WHERE rn <= 3""",
    // exact operator → the oracle is the direct truth (any-token join +,
    // unique in the fixture, so a generate_series+GROUP BY would collapse rows
    "layout_zorder" ->
      s"""SELECT l_orderkey, l_linenumber,
                 CAST(${(0 until 15)
        .map(i => s"(((l_partkey >> $i) & 1) << ${2 * i}) + (((l_suppkey >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")} AS BIGINT) AS zval
         FROM lineitem""",
    // compaction is content-preserving by contract: the compacted layout,
    // must read back as exactly the source table, row for row
    "layout_compact" -> "SELECT * FROM orders",
    "layout_skipping_scan" ->
      """SELECT * FROM orders
         WHERE o_orderkey >= 1
           AND o_orderkey <= (SELECT max(o_orderkey) FROM orders) // 10""",
    "layout_point_lookup" ->
      "SELECT * FROM orders WHERE o_orderkey IN (1, 2, 3, 5, 7)",
    "layout_manifest_maintain" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders""",
    "layout_zorder_skip" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM lineitem
         WHERE l_partkey >= 1
           AND l_partkey <= (SELECT max(l_partkey) FROM lineitem) // 20""",
    "agg_salted_skew" ->
      """SELECT source AS key, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total,
                min(n_chars) AS vmin, max(n_chars) AS vmax
         FROM documents GROUP BY source""",
    "j8_salted_join" ->
      """SELECT l_suppkey, l_orderkey, l_quantity, s_name
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""",
    // the bloom gate is invisible to semantics — plain join truth,
    "j9_bloom_gated_join" ->
      """SELECT p_partkey, p_name, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 10 GROUP BY 1, 2""",
  )
}
