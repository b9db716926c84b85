package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Rational-idf BM25 ranking (SURVEY.md §7.5 extension). */
class RankingSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark joins data"),  // high tf for one term
    (2L, "spark query"),                   // two distinct terms, short doc
    (3L, "a long document about nothing relevant at all with many words"),
    (4L, "query query query query query query")
  ).toDF("doc_id", "text")

  test("docs without any query term are excluded; hits rank by relevance") {
    val out = Ranking.bm25TopK(docs, $"doc_id", $"text", Seq("spark", "query"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSet == Set(1L, 2L, 4L)) // doc 3 has no term
    // scores ordered desc; doc 2 matches both terms in a short doc, so it
    // must beat the single-term docs
    assert(out.map(_._2).sameElements(out.map(_._2).sorted.reverse))
    assert(out.head._1 == 2L)
  }

  test("term saturation: tf 3 vs tf 6 of one term differ by less than 2x") {
    val two = Seq((1L, "x x x pad pad pad"), (2L, "x x x x x x")).toDF("doc_id", "text")
    val s = Ranking.bm25TopK(two, $"doc_id", $"text", Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(2L) > s(1L))
    assert(s(2L) < s(1L) * 2.0, s"BM25 must saturate tf: $s")
  }

  test("topK truncates deterministically (score desc, then doc_id)") {
    val many = spark.range(0, 50)
      .select($"id".as("doc_id"), lit("hit word").as("text"))
    val out = Ranking.bm25TopK(many, $"doc_id", $"text", Seq("hit"), topK = 20)
      .collect().map(_.getLong(0))
    // identical scores everywhere -> lowest 20 ids
    assert(out.sorted.toSeq == (0L until 20L).toSeq)
  }
}
