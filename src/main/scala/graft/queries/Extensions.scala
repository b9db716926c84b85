package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** LLM-training-data pipeline queries (north-star extensions, SURVEY.md
  * §7.5) over the `documents` / `embeddings` / `events` fixtures, with
  * DuckDB oracle twins. Hash-exactness tricks: shared md5-hex construction
  * for minhash/simhash/fingerprints (both engines have md5, neither shares
  * an integer hash), quantized integer dot products for cosine ranks, and
  * decimal-space sums cast to double at the end.
  */
object Extensions {

  /** Aggregation of the per-family query files (QAnn/QDedup/QText/QCorpus/
    * QStats/QEvents/QMultimodal/QLayout — split out round 15, zero
    * query-map diffs). Family objects are private[queries]; this object is
    * the single public surface SparkEntry composes.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    QAnn.queries ++
      QCorpus.queries ++
      QDedup.queries ++
      QEvents.queries ++
      QLayout.queries ++
      QMultimodal.queries ++
      QStats.queries ++
      QText.queries

  val oracles: Map[String, String] =
    QAnn.oracles ++
      QCorpus.oracles ++
      QDedup.oracles ++
      QEvents.oracles ++
      QLayout.oracles ++
      QMultimodal.oracles ++
      QStats.oracles ++
      QText.oracles
}
