package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-maintenance POLICY: compose the observability signals the
  * persisted-index lifecycles emit (tombstone load, append-era count,
  * quantizer drift, file amplification) into a none/compact/rebuild
  * decision per index — the loop-closer over the per-family actions
  * ([[graft.ext.Dedup.compactLshIndex]], [[Similarity.compactAnnIndex]],
  * [[Similarity.rebuildAnnIndex]], …). The reference's pipelines encode
  * the same shape manually (re-pull cache vs reuse, chicago
  * permit_cleaning.py's per-year CSV memo); at 100 TB the decision has to
  * be an operator, not an operator's operator.
  *
  * Everything here is declarative column logic over a CENSUS frame, so
  * the decision replays exactly in any engine given the same census —
  * the driver's `index_maintenance_plan` oracle does precisely that. The
  * one census signal that does NOT port to another engine is the physical
  * file count (Spark's bucket hash decides which buckets are non-empty),
  * so the file-amplification branch is spec-pinned (MaintenanceSpec)
  * rather than oracle-checked.
  */
object Maintenance {

  /** One census row for a persisted index table: distinct indexed ids,
    * live tombstone entries, distinct append eras — all table-derived,
    * aggregation-only (the scan is one column set; no collect). The
    * tombstone side is its own tiny aggregate cross-joined in (both sides
    * are one row).
    *
    * @param idColName the stored id column (`cand_id` / `corpus_id`)
    */
  def indexCensus(
      s: SparkSession,
      table: String,
      idColName: String,
      name: String
  ): DataFrame = {
    val idx = s.table(Similarity.servingTable(s, table))
    val base = idx.agg(
      countDistinct(col(idColName)).as("index_docs"),
      countDistinct(col("seq")).as("append_eras"))
    val tombT = Similarity.tombTable(table)
    val tomb =
      if (s.catalog.tableExists(tombT))
        s.table(tombT).agg(count(lit(1)).as("tomb_entries"))
      else s.range(1).select(lit(0L).as("tomb_entries"))
    base
      .crossJoin(tomb)
      .select(
        lit(name).as("index_name"),
        col("index_docs"),
        col("tomb_entries"),
        col("append_eras"))
  }

  /** Physical file amplification of a bucketed index table — the
    * compaction-pressure signal [[graft.sources.Sources.tableFileCount]]
    * exposes, normalized per bucket (each append cycle adds up to one
    * file per bucket). Driver-side catalog listing; spec-pinned, not
    * oracle-portable (see object doc).
    */
  def filesPerBucket(s: SparkSession, table: String, buckets: Int): Long = {
    val n = graft.sources.Sources.tableFileCount(s, Similarity.servingTable(s, table))
    (n + buckets - 1L) / buckets
  }

  /** The POLICY: per census row emit `rebuild` / `compact` / `none`, with
    * every threshold a PLAN LITERAL (visible in explain, replayable in
    * any engine):
    *
    *   - `rebuild` when the quantizer drift ratio (`drift_ppm`, appended
    *     batch's mean PQ quantization error vs the training population's,
    *     in ppm — [[Similarity.pqQuantError]] is the measurement) is at
    *     least `rebuildDriftPpm`: append-only maintenance under a pinned
    *     model can only drift, and past this point the model, not the
    *     layout, is the problem.
    *   - else `compact` when tombstones hide at least `compactTombPpm`
    *     ppm of the indexed ids (every probe pays the anti-join over
    *     them), or the index has accumulated `compactAppendEras`+ append
    *     eras (listing/open cost grows per cycle), or the caller-supplied
    *     `files_per_bucket` column reaches `compactFilesPerBucket`.
    *   - else `none`.
    *
    * Required census columns: `index_name`, `index_docs`,
    * `tomb_entries`, `append_eras` ([[indexCensus]]); `drift_ppm`
    * (caller-measured; 0 for modalities without a trained quantizer) and
    * optionally `files_per_bucket` ([[filesPerBucket]] as a literal).
    *
    * @return (index_name, index_docs, tomb_entries, append_eras,
    *         tomb_ppm, drift_ppm, decision)
    */
  def indexMaintenancePlan(
      census: DataFrame,
      rebuildDriftPpm: Long,
      compactTombPpm: Long,
      compactAppendEras: Long = Long.MaxValue,
      compactFilesPerBucket: Long = Long.MaxValue
  ): DataFrame = {
    val withFiles =
      if (census.columns.contains("files_per_bucket")) census
      else census.withColumn("files_per_bucket", lit(0L))
    // exact integer floor-div (long `/` is double division in Spark — the
    // remainder subtraction makes the quotient exact, so the ppm value
    // hash-matches an integer-division oracle bit-for-bit)
    val tombNum: Column = col("tomb_entries") * lit(1000000L)
    val tombDen: Column = greatest(col("index_docs"), lit(1L))
    val tombPpm: Column = ((tombNum - pmod(tombNum, tombDen)) / tombDen).cast("long")
    withFiles
      .withColumn("tomb_ppm", tombPpm)
      .withColumn(
        "decision",
        when(col("drift_ppm") >= rebuildDriftPpm, lit("rebuild"))
          .when(
            col("tomb_ppm") >= compactTombPpm
              || col("append_eras") >= compactAppendEras
              || col("files_per_bucket") >= compactFilesPerBucket,
            lit("compact"))
          .otherwise(lit("none")))
      .select(
        col("index_name"), col("index_docs"), col("tomb_entries"),
        col("append_eras"), col("tomb_ppm"), col("drift_ppm"), col("decision"))
  }

  /** The EXECUTOR's handle on one managed index: where it lives, which
    * stored column carries the indexed id (for the post-action census),
    * and the two maintenance actions the policy can demand — `compact`
    * (fold tombstones + merge per-bucket files, e.g.
    * [[graft.ext.Dedup.compactLshIndex]]) and `rebuild` (versioned
    * probe-safe re-encode, e.g. [[Similarity.rebuildAnnIndex]]). The
    * thunks close over the family-specific parameters (bucket count,
    * model, corpus) so the executor stays family-agnostic.
    */
  final case class ManagedIndex(
      table: String,
      idColName: String,
      compact: () => Unit,
      rebuild: () => Unit)

  /** The EXECUTOR — closes the observability→decision→ACTION loop:
    * [[indexMaintenancePlan]] said what each index needs; this runs it.
    * The plan is one row per index (fleet-metadata-sized — the collect is
    * the same model-scale driver step every maintenance scheduler has,
    * never corpus-grain), applied in index-name order so a fixed fleet
    * yields a deterministic action sequence. Unknown index names fail
    * fast — a plan row with no registered actions is a fleet
    * misconfiguration, not a skippable row.
    *
    * @return the post-action AUDIT: the re-taken census per index
    *         ([[indexCensus]] after the action ran) plus the decision
    *         that drove it — `compact`/`rebuild` rows must show zero
    *         tombstones and a single append era (the healed state),
    *         `none` rows the untouched pre-state. The driver's
    *         `index_maintenance_apply` oracle replays exactly that
    *         contract in SQL.
    */
  def applyMaintenancePlan(
      s: SparkSession,
      plan: DataFrame,
      indexes: Map[String, ManagedIndex]
  ): DataFrame = {
    val decisions = plan
      .select(col("index_name"), col("decision"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1)
    val audits = decisions.map { case (name, decision) =>
      val ix = indexes.getOrElse(
        name,
        throw new IllegalArgumentException(
          s"plan names index '$name' but no ManagedIndex is registered for it"))
      decision match {
        case "compact" => ix.compact()
        case "rebuild" => ix.rebuild()
        case "none"    => ()
        case other =>
          throw new IllegalArgumentException(s"unknown decision '$other' for index '$name'")
      }
      indexCensus(s, ix.table, ix.idColName, name).withColumn("decision", lit(decision))
    }
    // an empty plan (empty fleet, or every index filtered out upstream)
    // audits as EMPTY, not as an error — reduce would throw on it
    if (audits.isEmpty)
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("index_name", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("index_docs", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("tomb_entries", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("append_eras", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("decision", org.apache.spark.sql.types.StringType))))
    else audits.reduce(_.unionByName(_))
  }
}
