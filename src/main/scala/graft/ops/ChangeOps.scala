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

  /** Apply `changes` to `base`: for every key, the highest-`seqCol` change
    * wins; a winning `"D"` removes the row, a winning `"U"` replaces it
    * (or inserts it when the key is absent from base); keys with no change
    * keep their base row. Output schema = base schema.
    *
    * Determinism: base rows rank below every change (`Long.MinValue`
    * sequence), and a seq tie between changes resolves `"U"` over `"D"`
    * (op descending) — document-stable, engine-reproducible ordering, so
    * retried jobs and any SQL twin agree row-for-row.
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
}
