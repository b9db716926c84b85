package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Dataset curation (SURVEY.md §7.5). */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = spark.range(0, 2000)
    .select($"id".as("doc_id"),
      when($"id" % 4 === 0, "de").otherwise("en").as("lang"))

  test("stratified sample keeps ~rate per stratum, deterministically") {
    val out = Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 0.25), 1.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the non-targeted stratum survives whole
    assert(byLang("de") == 500L)
    // the md5 gate is uniform: 1500 en docs at 25% => ~375, well within 4σ
    assert(byLang("en") > 280 && byLang("en") < 470, s"en kept ${byLang("en")}")
    // deterministic: a second run selects the identical rows
    val again = Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 0.25), 1.0)
    assert(out.collect().map(_.getLong(0)).sorted sameElements again.collect().map(_.getLong(0)).sorted)
  }

  test("rate 0 drops the stratum entirely; default rate applies to unlisted strata") {
    val out = Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 0.0), 0.5)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("de"))
    val n = out.count()
    assert(n > 180 && n < 320, s"de at 50% of 500 => ~250, got $n")
  }

  test("rates outside [0,1] are rejected") {
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 1.5))
    }
  }
}
