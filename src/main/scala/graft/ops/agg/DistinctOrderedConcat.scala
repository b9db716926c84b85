package graft.ops.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A1 (order-preserving distinct group-concat) as a typed [[Aggregator]] —
  * the scale path SURVEY.md §4.3 calls out: the built-in formulation
  * (`array_join(array_distinct(transform(array_sort(collect_list(struct)))))`
  * materializes the FULL value list per group before deduplicating, so a
  * dup-heavy group (one address seen millions of times) holds every copy in
  * the aggregation buffer. This buffer dedupes incrementally — it is bounded
  * by DISTINCT values per group, and merges map-side partials like any
  * hash aggregate.
  *
  * Semantics twin of chicago/permit_cleaning.py:754-759: values joined by
  * ", " in first-occurrence order, where "first" = smallest `orderKey`.
  */
object DistinctOrderedConcat extends Aggregator[(Long, String), Map[String, Long], String] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: (Long, String)): Map[String, Long] = {
    val (key, value) = in
    if (value == null) buf
    else
      buf.get(value) match {
        case Some(k) if k <= key => buf
        case _                   => buf + (value -> key)
      }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (v, k)) =>
      acc.get(v) match {
        case Some(k0) if k0 <= k => acc
        case _                   => acc + (v -> k)
      }
    }

  override def finish(buf: Map[String, Long]): String =
    buf.toSeq.sortBy { case (v, k) => (k, v) }.map(_._1).mkString(", ")

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Untyped column form: `concatDistinct(orderKey, value)`. */
  def column(orderKey: Column, value: Column): Column =
    udaf(this).apply(orderKey, value)
}
