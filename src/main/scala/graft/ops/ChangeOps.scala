package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance over immutable files: apply a changelog of keyed
  * upserts/deletes to a base snapshot — the MERGE/CDC-apply primitive a
  * lakehouse pipeline runs per maintenance cycle (no Delta/Hudi dependency;
  * plain column algebra over parquet).
  */
object ChangeOps {

  private def requireWorkCols(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(n => df.columns.exists(_.equalsIgnoreCase(n)))
    require(
      clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with reserved working columns")
  }

  /** SNAPSHOT DIFF — derive the changelog BETWEEN two full snapshots: the
    * inverse of [[applyChangelog]], and the standard fallback when a
    * source system offers no CDC feed (nightly full extracts). For each
    * key: present only in `next` → `"I"`; present only in `prev` → `"D"`;
    * present in both with ANY payload column differing → `"U"` (carrying
    * the new payload); identical rows emit nothing, so the diff is
    * |changed| rows, not |table| rows.
    *
    * Null-safe on both the key and every payload column (`<=>`), so a
    * null payload flipping to a value — or the reverse — is a real `"U"`.
    * `applyChangelog(prev, snapshotDiff(prev, next), …)` reproduces `next`
    * row-for-row (spec-pinned round trip).
    *
    * Shape at 100 TB: ONE full-outer shuffle join on the key (both sides
    * pre-partitionable by the same key for an exchange-free cycle), the
    * payload compare is row-local, and the output is change-proportional
    * — the whole point of diffing before shipping downstream.
    *
    * @return `next`'s schema plus `op` ∈ {I, U, D}; `"D"` rows carry the
    *         key with `prev`'s payload
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, keyCol: String): DataFrame = {
    require(
      prev.columns.map(_.toLowerCase).sorted.sameElements(
        next.columns.map(_.toLowerCase).sorted),
      "snapshots must share a schema")
    requireWorkCols(prev, "op", "__pk", "__nk")
    val payload = next.columns.filter(_ != keyCol).toSeq
    val p = prev.select(
      col(keyCol).as("__pk") +: payload.map(c => col(c).as(s"__p_$c")): _*)
    val n = next.select(
      col(keyCol).as("__nk") +: payload.map(c => col(c).as(s"__n_$c")): _*)
    val joined = p.join(n, col("__pk") <=> col("__nk"), "full_outer")
    val changed = payload
      .map(c => !(col(s"__p_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    joined
      .withColumn(
        "op",
        when(col("__pk").isNull, lit("I"))
          .when(col("__nk").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(
        coalesce(col("__nk"), col("__pk")).as(keyCol) +:
          payload.map(c =>
            when(col("op") === "D", col(s"__p_$c")).otherwise(col(s"__n_$c")).as(c)) :+
          col("op"): _*)
  }

  /** Apply `changes` to `base`: for every key, the highest-`seqCol` change
    * wins; a winning `"D"` removes the row, a winning `"U"` replaces it
    * (or inserts it when the key is absent from base); keys with no change
    * keep their base row. Output schema = base schema.
    *
    * Determinism: base rows rank below every change (`Long.MinValue`
    * sequence), and a seq tie between changes resolves `"U"` over `"D"`
    * (op descending) — document-stable, engine-reproducible ordering, so
    * retried jobs and any SQL twin agree row-for-row. Precondition: per
    * key, (seq, op) pairs must be UNIQUE — two changes sharing
    * (key, seq, op) with different payloads would leave the winner to an
    * arbitrary `row_number` tiebreak. A well-formed CDC feed (one
    * sequence per source transaction) satisfies this by construction.
    *
    * Shape at 100 TB: ONE shuffle — the union is exchange-free, and the
    * per-key window partitions on the key (AQE splits skewed keys). The
    * changelog side is typically a day's CDC against a full snapshot; no
    * broadcast is assumed, no driver state exists, and the output is
    * ready to write back hash-partitioned by the same key for the next
    * cycle's co-partitioned apply.
    *
    * @param keys   row identity (must exist in both frames)
    * @param opCol  change operation column in `changes`: "U" upsert, "D" delete
    * @param seqCol change ordering column in `changes` (castable to long;
    *               higher = later)
    */
  /** Declarative form of [[applyChangelog]] that is legal on a STREAM:
    * one `max_by` aggregation per key, ordered by (seq, op) — the same
    * lexicographic winner (higher seq, then U over D) the window picks in
    * the batch form. Feed base rows as `Long.MinValue`-sequence upserts to
    * reproduce the batch semantics exactly.
    *
    * Precondition: per key, (seq, op) pairs must be UNIQUE. Two changes
    * sharing (key, seq, op) with different payloads would make the
    * `max_by` winner arbitrary — retried jobs or the SQL twin could then
    * disagree. A well-formed CDC feed (one sequence per source
    * transaction) satisfies this by construction.
    *
    * On a streaming frame this is a standard stateful aggregation —
    * no watermark needed in update/complete mode, state is one row per
    * key, and every micro-batch revises the key's winner — i.e. a
    * continuously-maintained CDC snapshot with NO custom state code
    * (Catalyst plans the state store). On a batch frame it returns the
    * identical rows to [[applyChangelog]]; the stream/batch parity query
    * shares one oracle.
    *
    * @param dataCols output payload columns (the snapshot schema)
    */
  def applyChangelogAgg(
      changes: DataFrame,
      keys: Seq[String],
      opCol: String,
      seqCol: String,
      dataCols: Seq[String]
  ): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(dataCols.nonEmpty, "dataCols must be non-empty")
    val ord = struct(col(seqCol).cast("long").as("s"), col(opCol).as("o"))
    changes
      .groupBy(keys.map(col): _*)
      .agg(
        max_by(struct(dataCols.map(col): _*), ord).as("__w"),
        max(ord).as("__m"))
      .filter(col("__m.o") =!= "D")
      .select(col("__w.*"))
  }

  /** SCD Type-2 history from a changelog: one validity interval per
    * upsert — `valid_from` = the change's sequence, `valid_to` = the
    * key's NEXT change sequence (null = still open), `is_current` =
    * open-interval flag. Delete rows emit no interval of their own; they
    * close their predecessor's (the `lead` sees them before they are
    * filtered). Feed the base snapshot in as sequence-0 upserts to get
    * full-lineage history.
    *
    * Within a key, equal sequences order upserts before deletes (op
    * descending) — a same-seq U+D pair yields a degenerate [s, s)
    * interval rather than nondeterminism; sequences SHOULD be unique per
    * key. Output: payload columns + (valid_from, valid_to, is_current).
    *
    * Shape: one shuffle (the per-key window); same posture as
    * [[applyChangelog]] — nothing broadcast, nothing driver-side.
    */
  def changelogHistory(
      changes: DataFrame,
      keys: Seq[String],
      opCol: String,
      seqCol: String
  ): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    requireWorkCols(changes, "__vt", "valid_from", "valid_to", "is_current")
    val dataCols = changes.columns.toSeq.filterNot(c => c == opCol || c == seqCol)
    val missing = keys.filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing key columns: ${missing.mkString(", ")}")
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).cast("long").asc, col(opCol).desc)
    changes
      .withColumn("__vt", lead(col(seqCol).cast("long"), 1).over(w))
      .filter(col(opCol) === "U")
      .select(
        dataCols.map(col)
          :+ col(seqCol).cast("long").as("valid_from")
          :+ col("__vt").as("valid_to")
          :+ col("__vt").isNull.as("is_current"): _*)
  }

  /** Point-in-time reconstruction (time travel) from a [[changelogHistory]]
    * frame: the version of each key valid AT sequence time `t` —
    * `valid_from <= t < valid_to` with an open `valid_to` meaning
    * still-current. A key deleted before `t` (no interval covers it) is
    * simply absent, exactly as the live table at `t` would show. Pure
    * map-side filter: time travel over a versioned table is a scan
    * predicate, never a join — at scale the history sits partitioned or
    * sorted on `valid_from`, so the predicate also prunes files.
    *
    * @return the history's data columns + `valid_from` (the version id)
    */
  def snapshotAt(history: DataFrame, t: Long): DataFrame = {
    require(
      Seq("valid_from", "valid_to", "is_current").forall(history.columns.contains),
      "history must be a changelogHistory frame (valid_from/valid_to/is_current)")
    history
      .filter(col("valid_from") <= t && (col("valid_to").isNull || lit(t) < col("valid_to")))
      .drop("valid_to", "is_current")
  }

  def applyChangelog(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String,
      seqCol: String
  ): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    requireWorkCols(base, "__op", "__seq", "__rk")
    val dataCols = base.columns.toSeq
    val missing = (keys ++ dataCols).distinct.filterNot(changes.columns.contains)
    require(missing.isEmpty, s"changes is missing columns: ${missing.mkString(", ")}")
    val taggedBase = base
      .select(
        dataCols.map(col) :+ lit("U").as("__op") :+ lit(Long.MinValue).as("__seq"): _*)
    val taggedChanges = changes
      .select(
        dataCols.map(col) :+ col(opCol).as("__op") :+ col(seqCol).cast("long").as("__seq"): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__seq").desc, col("__op").desc)
    taggedBase
      .unionByName(taggedChanges)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && col("__op") =!= "D")
      .select(dataCols.map(col): _*)
  }

  /** MERGE INTO — the lakehouse upsert API ([[applyChangelog]] is the
    * op-column-driven CDC form; this is the clause-driven form every
    * table format exposes): for each source row matching a target row on
    * `key`, WHEN MATCHED AND `deleteCond` → the target row disappears,
    * WHEN MATCHED otherwise → the source payload replaces the target's;
    * WHEN NOT MATCHED (and not delete-flagged) → insert. Unmatched target
    * rows pass through untouched.
    *
    * Source must be unique per key (a duplicate-key source multiplies its
    * matched target row once per duplicate — [[mergeConflicts]] is the
    * audit that makes a violation a queryable row set instead of silent
    * growth). ONE null-safe full-outer join on the key (`<=>` — a NULL
    * target key and a NULL source key DO merge, like [[snapshotDiff]]) —
    * change-proportional when the source is the small side (broadcast),
    * shuffle-on-key otherwise; no window, no second pass.
    *
    * A `deleteCond` that evaluates to NULL on a source row means "keep"
    * (coalesced to false at build time) — source presence is tracked by a
    * dedicated `lit(true)` marker, never by the delete flag's nullability,
    * so a NULL flag can neither drop an update nor insert an all-NULL row.
    */
  def mergeInto(
      target: DataFrame,
      source: DataFrame,
      key: String,
      deleteCond: Column
  ): DataFrame = {
    val payload = target.columns.filterNot(_ == key).toSeq
    val missing = payload.filterNot(source.columns.contains)
    require(missing.isEmpty, s"source is missing payload columns: ${missing.mkString(", ")}")
    val t = target.select(col(key).as("__tk") +: payload.map(c => col(c).as(s"__t_$c")): _*)
    val s = source
      .withColumn("__del", coalesce(deleteCond, lit(false)))
      .select(
        col(key).as("__sk") +: lit(true).as("__src") +: col("__del") +:
          payload.map(c => col(c).as(s"__s_$c")): _*)
    t.join(s, col("__tk") <=> col("__sk"), "full_outer")
      // delete-flagged source rows vanish (matched → target row removed;
      // unmatched → insert suppressed); target-only rows (__del null) stay
      .filter(!coalesce(col("__del"), lit(false)))
      .select(
        coalesce(col("__tk"), col("__sk")).as(key) +:
          payload.map(c =>
            when(col("__src").isNotNull, col(s"__s_$c")) // source present → its payload
              .otherwise(col(s"__t_$c"))
              .as(c)): _*)
  }

  /** Audit for [[mergeInto]]'s source-uniqueness contract: the keys that
    * appear more than once in a merge source, with their row counts. A
    * duplicate-key source makes the merge's full-outer join emit one row
    * per duplicate — target rows silently multiply — so run this (one
    * partial-agg'd count, cheap) as the admission gate before a merge, or
    * alert on it in a pipeline. Null-safe: a repeated NULL key reports
    * like any other (groupBy groups NULLs together).
    */
  def mergeConflicts(source: DataFrame, key: String): DataFrame =
    source
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Incremental MATERIALIZED-VIEW maintenance for an algebraic aggregate
    * (count + sum — the decomposable core every avg/ratio view derives
    * from): fold a signed delta batch into the stored view state without
    * touching the base data. `base` is the persisted view
    * (keys…, cnt, sum_v); `delta` is raw changed rows carrying a weight
    * column (+1 insert, −1 retraction) and a value column. The maintained
    * view is IDENTICAL to a full recompute over (base-rows − retracted +
    * inserted) — the invariant the oracle checks by doing exactly that
    * full recompute.
    *
    * Scale shape — the entire point of IVM at 100 TB: cost is
    * O(|delta| + |touched groups|), never O(|base data|). The delta
    * partial-aggregates map-side to |touched groups| rows, the union with
    * the view state partial-aggregates again, and no join appears anywhere
    * (a join-based merge would shuffle the full view; the union+agg
    * re-merges only colliding keys). Groups whose count reaches zero drop
    * from the view exactly as a recompute would drop them.
    */
  def maintainAggView(
      base: DataFrame,
      delta: DataFrame,
      keys: Seq[String],
      weightCol: Column,
      valueCol: Column
  ): DataFrame = {
    val deltaAgg = delta
      .select(keys.map(col) :+ weightCol.cast("long").as("__w") :+
        valueCol.cast("long").as("__v"): _*)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__w")).as("cnt"),
        sum(col("__w") * coalesce(col("__v"), lit(0L))).as("sum_v"))
    base
      .select(keys.map(col) :+ col("cnt") :+ col("sum_v"): _*)
      .unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_v")).as("sum_v"))
      .filter(col("cnt") > 0)
  }
}
