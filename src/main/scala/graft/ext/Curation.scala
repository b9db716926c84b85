package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines (north-star
  * extension, SURVEY.md §7.5): rebalancing a corpus by downsampling
  * over-represented strata (languages, sources, quality bands).
  */
object Curation {

  /** Deterministic per-stratum downsampling: keep a row iff
    * md5(id) mod 1000 < rate(stratum) × 1000.
    *
    * Hash-gated rather than `rand()`-gated on purpose:
    *   - reproducible — the same corpus always yields the same sample, so
    *     downstream runs, retried tasks, and AQE re-executions agree
    *     (rand() re-draws per task attempt, silently changing the sample
    *     under speculative execution or stage retry);
    *   - engine-neutral — any SQL engine with md5 verifies the exact rows;
    *   - map-side only — a pure filter, no shuffle, scales linearly.
    *
    * Rates are millage-quantized (0.1% granularity) so the gate is exact
    * integer arithmetic.
    *
    * @param idCol       stable row identity (the hash input)
    * @param stratumCol  stratum key (e.g. language id)
    * @param rates       keep-fraction per stratum value, in [0, 1]
    * @param defaultRate keep-fraction for strata not in `rates`
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: Column,
      stratumCol: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0
  ): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1), "rates must be in [0,1]")
    val gate = graft.ops.Hashing.md5Mod(idCol.cast("string"), 1000L)
    val rateCol = rates.foldLeft(lit(math.round(defaultRate * 1000)): Column) {
      case (acc, (k, v)) => when(stratumCol === k, lit(math.round(v * 1000))).otherwise(acc)
    }
    df.filter(gate < rateCol)
  }
}
