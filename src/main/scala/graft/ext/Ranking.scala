package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relevance ranking over a document corpus (north-star extension,
  * SURVEY.md §7.5): BM25 scoring for a fixed query-term list — the shape a
  * training-data pipeline uses to mine topical subsets ("find the docs
  * about X") or weight sampling.
  *
  * Engine-reproducibility stance: the classic log-idf is replaced by its
  * rational core (N − df + ½)/(df + ½) — the same monotone ranking without
  * a transcendental function, because libm's log is NOT bit-identical
  * across engines while IEEE-754 +,·,/ are. Every double op here is a
  * correctly-rounded primitive over exactly-representable integer inputs,
  * so any SQL engine reproduces the scores bit-for-bit.
  */
object Ranking {

  /** Per-doc BM25 scores for `terms`, top `topK` by (score desc, id).
    *
    * Two scans composed in one plan: a map-side pass computing per-doc
    * term frequencies and length, a 1-row corpus-stats aggregate
    * (N, avgdl, per-term df) broadcast back over a cross join, then the
    * score arithmetic — no per-term join, no explode, shuffle = one
    * aggregate.
    *
    * @return (doc_id, score) — score rounded to 6 dp for output; ranking
    *         and the >0 filter run on the raw double
    */
  def bm25TopK(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20
  ): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val tf = df.select(
      idCol.as("doc_id") +:
        size(split(trim(coalesce(textCol, lit(""))), "\\s+")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (term, i) =>
          size(filter(split(trim(coalesce(textCol, lit(""))), "\\s+"), w => w === term))
            .cast("long")
            .as(s"tf$i")
        }: _*
    )
    val aggExprs = count(lit(1)).as("n") +:
      avg(col("dl")).as("avgdl") +:
      terms.indices.map(i => sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))
    val stats = tf.agg(aggExprs.head, aggExprs.tail: _*)
    // term scores summed in term-list order — the oracle writes the same
    // left-associated chain, so the double sum is bit-identical
    val score = terms.indices
      .map { i =>
        val idf = (col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5))
        val tfPart = col(s"tf$i") * lit(k1 + 1) /
          (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
        idf * tfPart
      }
      .reduce(_ + _)
    tf.crossJoin(broadcast(stats))
      .withColumn("__score", score)
      .filter(col("__score") > 0)
      .orderBy(col("__score").desc, col("doc_id"))
      .limit(topK)
      .select(col("doc_id"), round(col("__score"), 6).as("score"))
  }
}
