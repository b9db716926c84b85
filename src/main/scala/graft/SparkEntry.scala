package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Queries live in graft.queries.Core (reference operator inventory,
  * SURVEY.md §2) and graft.queries.Extensions (LLM-data-pipeline operators,
  * SURVEY.md §7.5); each has a DuckDB oracle twin unless inherently
  * engine-specific (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship: the §2.10 validate-and-partition pipeline (upload side) on
    * sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("vp_upload")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §7.5. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Extensions.queries ++
      graft.queries.StreamQ.queries ++ graft.queries.PipelineQ.queries

  /** DuckDB twins for the driver's differential correctness gate. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracles ++ graft.queries.Extensions.oracles ++
      graft.queries.StreamQ.oracles ++ graft.queries.PipelineQ.oracles
}
