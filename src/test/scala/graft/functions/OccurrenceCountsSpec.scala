package graft.functions

import graft.SparkSpecBase
import graft.ext.TextStats
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native graft_occ_counts expression (registered via GraftExtensions). */
class OccurrenceCountsSpec extends SparkSpecBase {
  import spark.implicits._

  private def occ(text: String, terms: String*): Seq[Long] =
    Seq(Tuple1(text)).toDF("t")
      .select(call_function("graft_occ_counts", $"t", array(terms.map(lit): _*)).as("c"))
      .collect().head.getSeq[Long](0)

  test("counts non-overlapping left-to-right, exactly like the replace idiom") {
    assert(occ("the cat the dog the", "the", "cat", "missing") == Seq(3L, 1L, 0L))
    // overlap: "aaaa" holds TWO non-overlapping "aa" (not three) — the
    // replace idiom agrees: replace("aaaa","aa","") removes both
    assert(occ("aaaa", "aa") == Seq(2L))
    assert(occ("ababab", "abab") == Seq(1L))
  }

  test("multi-byte text: counting is codepoint-correct") {
    assert(occ("雪雪雪 et 雪", "雪", " et ") == Seq(4L, 1L))
    assert(occ("éé déjà éé", "éé") == Seq(2L))
    // byte-vs-char advance probe: 4 codepoints of 2 bytes each hold TWO
    // non-overlapping "éé" — a byte-stepped advance would miscount
    assert(occ("éééé", "éé") == Seq(2L))
  }

  test("null text yields null; empty terms count 0") {
    val out = Seq[Option[String]](None, Some("x y"))
      .toDF("t")
      .select(call_function("graft_occ_counts", $"t", array(lit("x"), lit(""))).as("c"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Long](0) == Seq(1L, 0L))
  }

  test("non-foldable terms are rejected at analysis time") {
    val err = intercept[AnalysisException] {
      Seq(("a", "a")).toDF("t", "u")
        .select(call_function("graft_occ_counts", $"t", array($"u")))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }

  test("interpreted eval agrees with the codegen path") {
    // direct companion call (the body both paths share) vs the full query
    val terms = Array("ab", "b", "zzz").map(t => UTF8String.fromString(t).getBytes)
    val direct = OccurrenceCounts.counts(UTF8String.fromString("ababb"), terms)
      .toLongArray().toSeq
    assert(direct == Seq(2L, 3L, 0L))
    assert(occ("ababb", "ab", "b", "zzz") == Seq(2L, 3L, 0L))
  }

  test("langScoresNativeDF values equal the replace-chain langScoreFrom values") {
    val df = Seq(
      (1L, "the cat and the dog of a house"),
      (2L, "el perro y la casa de madrid"),
      (3L, "la maison et le chat"),
      (4L, ""),
      (5L, "der und die das der und")
    ).toDF("doc_id", "text")
    val native = TextStats.langScoresNativeDF(df, $"doc_id", $"text")
    val hof = df
      .select($"doc_id", TextStats.padded($"text").as("__p"))
      .select(
        $"doc_id" +:
          TextStats.StopwordLexicons.map { case (lang, lex) =>
            TextStats.langScoreFrom($"__p", lex).as(s"s_$lang")
          }: _*
      )
    assert(rows(native) == rows(hof))
  }
}
