package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation aggregation (SURVEY §4 scale posture): the explicit
  * two-stage salted form of a grouped aggregate, for when one hot key
  * (the boilerplate language, the dominant source, the null bucket) would
  * otherwise funnel most of the corpus through a single reducer. AQE's
  * skew handling covers joins; skewed AGGREGATES are on the query author,
  * and this is the standard shape: shard each key across `salts`
  * sub-groups, partial-aggregate per shard, then combine the shards.
  *
  * Correctness is unconditional for the algebraic aggregates exposed here
  * (count / sum / min / max): any partition of a key's rows combines to
  * the same result, so the salted plan is bit-identical to the direct
  * group-by — which is exactly what the DuckDB oracle checks.
  */
object SkewOps {

  /** Salted equi-join: the join-side analog of [[saltedAgg]], for a big
    * side whose join key is hot (one supplier/source dominating the rows)
    * against a dim side too large to broadcast. Big rows draw a
    * deterministic salt from `saltSourceCol`; the dim side replicates
    * ×`salts`; joining on (key, salt) spreads the hot key's rows over
    * `salts` reducers instead of one. Result set is EXACTLY the plain
    * join's (each big row meets its key's dim rows in exactly one shard) —
    * the oracle checks that. AQE's skew-join split covers the common case
    * at runtime; this is the explicit form for when the skew is known and
    * the dim side must shuffle anyway.
    *
    * This is the canonical salted join (md5 salts are stable under task
    * retry; `hash()`-of-nondeterministic-input or `rand()` salts re-draw
    * under speculative execution). [[LinkOps.saltedJoin]] delegates here.
    */
  def saltedJoin(
      big: DataFrame,
      dim: DataFrame,
      key: String,
      saltSourceCol: Column,
      salts: Int
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("__salt", Hashing.md5Mod(saltSourceCol.cast("string"), salts.toLong))
    val d = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    b.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-key form of [[saltedJoin]] for sides whose join columns are named
    * differently; both key columns survive into the output (mirroring a
    * plain `a(bk) === b(sk)` join).
    */
  def saltedJoin(
      big: DataFrame,
      dim: DataFrame,
      bigKey: String,
      dimKey: String,
      saltSourceCol: Column,
      salts: Int
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("__salt", Hashing.md5Mod(saltSourceCol.cast("string"), salts.toLong))
    val d = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    b.join(d, b(bigKey) === d(dimKey) && b("__salt") === d("__salt")).drop("__salt")
  }

  /** Derive a salt count from the data instead of a caller constant: a
    * count-min pre-pass ([[graft.ext.Sketches.countMinCells]], O(depth·width)
    * sketch state — skew-proof by construction, unlike an exact per-key
    * count whose output is the vocabulary) upper-bounds the hottest key's
    * row count as min over depth rows of that row's max cell. Salts =
    * ceil(hotUpper / balancedTaskRows) where balancedTaskRows is
    * total/shuffle-partitions — i.e. just enough shards that the hot key's
    * heaviest shard is a normal-sized task — clamped to [1, maxSalts].
    * The two scalars are sketch aggregates (one driver row), not data.
    */
  def autoSalts(big: DataFrame, key: String, maxSalts: Int = 64): Int = {
    require(maxSalts > 0, "maxSalts must be positive")
    val s = big.sparkSession
    val row = graft.ext.Sketches
      .countMinCells(big, col(key), depth = 3, width = 1024)
      .groupBy(col("j"))
      .agg(max(col("cnt")).as("row_max"), sum(col("cnt")).as("row_total"))
      .agg(min(col("row_max")).as("hot_upper"), max(col("row_total")).as("total"))
      .collect()(0)
    // empty input ⇒ the min/max aggregate yields a null row; one salt is
    // the only sensible sizing for zero rows
    if (row.isNullAt(0) || row.isNullAt(1)) return 1
    val hotUpper = row.getLong(0)
    val total = row.getLong(1)
    val parallelism = s.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val balanced = math.max(1L, total / math.max(1, parallelism))
    math.max(1L, math.min(maxSalts.toLong, (hotUpper + balanced - 1) / balanced)).toInt
  }

  /** [[saltedJoin]] with [[autoSalts]] sizing — the form to reach for when
    * the skew is suspected but not measured.
    */
  def saltedJoinAuto(
      big: DataFrame,
      dim: DataFrame,
      key: String,
      saltSourceCol: Column,
      maxSalts: Int = 64
  ): DataFrame =
    saltedJoin(big, dim, key, saltSourceCol, autoSalts(big, key, maxSalts))

  /** count(*), sum / min / max of `valueCol` per `keyCol`, computed as
    * groupBy(key, salt) → groupBy(key). The salt is the engine's md5 gate
    * over `saltSourceCol` (a row-level column, e.g. the row id), so shard
    * assignment is deterministic under task retry — `rand()` salts re-draw
    * under speculative execution and double-count.
    *
    * Plan shape: two exchanges, but the FIRST carries at most
    * |keys|·salts partially-aggregated rows out of each map task and the
    * SECOND only |keys|·salts rows total — the hot key's input never
    * converges on one task.
    */
  def saltedAgg(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      saltSourceCol: Column,
      salts: Int
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.select(
        keyCol.as("key"),
        valueCol.cast("long").as("v"),
        Hashing.md5Mod(saltSourceCol.cast("string"), salts.toLong).as("__salt")
      )
      .groupBy(col("key"), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("v")).as("__s"),
        min(col("v")).as("__mn"),
        max(col("v")).as("__mx")
      )
      .groupBy(col("key"))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).as("total"),
        min(col("__mn")).as("vmin"),
        max(col("__mx")).as("vmax")
      )
  }

  /** Hot-key audit — the DIAGNOSTIC that decides whether a join/agg needs
    * [[saltedJoin]]/[[saltedAgg]] at all: per-key row counts, reported as
    * the top-K heaviest keys with their exact share of the table
    * (parts-per-million) and how many × the mean key they weigh
    * (milli-units: 1000 = a perfectly uniform key). All-integer — shares
    * come from exact `div` on decimal cross-products, so the audit itself
    * is oracle-checkable, unlike a sampled profiler.
    *
    * Scale shape: ONE partial-agg'd per-key count (the raw table never
    * shuffles as rows), a one-row scalar totals frame broadcast back, and
    * a TakeOrdered top-K — no sort of the key universe. This is the probe
    * you run cheaply at 100 TB before paying for a salting rewrite.
    */
  def keySkewAudit(df: DataFrame, keyCol: Column, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val counts = df
      .select(keyCol.cast("string").as("key"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("__tot"),
      count(lit(1)).as("__keys"))
    val dec = "decimal(38,0)"
    counts
      .crossJoin(broadcast(totals)) // one-row frame: the cross join is a scalar
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topK)
      .select(
        col("key"),
        col("cnt"),
        col("__keys").as("n_keys"),
        expr(s"CAST(cnt AS $dec) * 1000000 div CAST(__tot AS $dec)")
          .cast("long").as("share_ppm"),
        expr(s"CAST(cnt AS $dec) * 1000 * CAST(__keys AS $dec) div CAST(__tot AS $dec)")
          .cast("long").as("hot_x_milli"))
  }
}
