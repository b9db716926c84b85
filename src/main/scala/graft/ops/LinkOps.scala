package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3). All reference joins are equi-joins with
  * lookup-sized right sides — the idiomatic Spark plan is a broadcast hash
  * join, so every helper here hints `broadcast` on the small side. At 100 TB
  * the big side streams through map tasks with zero shuffle.
  */
object LinkOps {

  /** J1/J3: left lookup join against a small dimension, broadcast.
    * (chicago/permit_cleaning.py:762-767; crosswalk joins
    * legacy_permits/2023/format_legacy_2023.R:40-43).
    */
  def lookupLeft(df: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    df.join(broadcast(dim), cond, "left")

  /** J3 with fallback: left join then `coalesce(mapped, original)` —
    * crosswalk PIN remap (2023/format_legacy_2023.R:40-43).
    */
  def lookupRemap(
      df: DataFrame,
      dim: DataFrame,
      dfKey: String,
      dimKey: String,
      dimValue: String
  ): DataFrame =
    df.join(broadcast(dim.select(col(dimKey), col(dimValue))), col(dfKey) === col(dimKey), "left")
      .withColumn(dfKey, coalesce(col(dimValue), col(dfKey)))
      .drop(dimKey, dimValue)

  /** J5: membership semi-join — keep rows whose key exists in the universe
    * (the reference's in-memory `set` probe, chicago/permit_cleaning.py:438-448).
    * Broadcast left-semi hash join: the probe never shuffles the big side.
    */
  def semiMembership(df: DataFrame, universe: DataFrame, cond: Column): DataFrame =
    df.join(broadcast(universe), cond, "left_semi")

  /** Complement of [[semiMembership]] — rows whose key is NOT in the universe
    * (J6, verify_legacy_uploads.R:6-34).
    */
  def antiMembership(df: DataFrame, universe: DataFrame, cond: Column): DataFrame =
    df.join(broadcast(universe), cond, "left_anti")

  /** Skew-mitigating equi-join (SURVEY §4 scale posture): when one join key
    * carries a disproportionate share of the big side, a plain shuffle join
    * sends that key's rows to one reducer. Salting splits each key into
    * `salts` sub-keys: the big side gets a deterministic salt derived from a
    * high-cardinality column, the small side is replicated once per salt.
    * Shuffle balance improves by ~`salts`× on the hot key for `salts`× small
    * side volume. AQE's skew-join handles moderate skew automatically; this
    * is for the pathological key you know about.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltSource: Column,
      salts: Int
  ): DataFrame =
    // delegates to the canonical md5-deterministic implementation
    // (SkewOps) so there is exactly one salting discipline in the engine
    SkewOps.saltedJoin(big, small, bigKey, smallKey, saltSource, salts)

  /** J4: multi-key anti-join dedupe against an existing-rows table
    * (chicago/permit_cleaning.py:838-883). The right side is deduplicated
    * first (reference `drop_duplicates`, :877 — semantics-preserving for an
    * anti-join but keeps the broadcast small). Keys must already be
    * canonicalized by the caller (decimal/date/string canon, :848-871).
    *
    * Null semantics: pandas `merge` matches NaN==NaN; for an ANTI join the
    * observable difference is only that a left row with a null key matches a
    * null-keyed right row in pandas (dropped) but never matches in Spark
    * (kept). `nullSafe = true` reproduces pandas exactly via `<=>`.
    */
  def antiDedupe(
      df: DataFrame,
      existing: DataFrame,
      keys: Seq[String],
      nullSafe: Boolean = true
  ): DataFrame = {
    val right = broadcast(existing.select(keys.map(col): _*).dropDuplicates())
    val cond = keys
      .map { k =>
        if (nullSafe) df(k) <=> right(k) else df(k) === right(k)
      }
      .reduce(_ && _)
    df.join(right, cond, "left_anti")
  }
}
