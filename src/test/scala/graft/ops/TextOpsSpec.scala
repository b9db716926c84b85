package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** F7–F11, F20–F21 (SURVEY.md §2.9). */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("abbreviationFold applies rewrites sequentially in dict order") {
    // APARTMENT fires inside APARTMENTS (reference quirk: the APARTMENTS
    // entry is dead because APARTMENT precedes it, permit_cleaning.py:668-689)
    val df = Seq("BUILDING APARTMENTS OF ILLINOIS STREET COMPANY").toDF("t")
    val out = strings(df.select(TextOps.abbreviationFold($"t").as("v")), "v")
    assert(out == Seq("BLDG APTS OF IL ST CO"))
  }

  test("keywordTag matches case-insensitive substrings in lexicon order") {
    val df = Seq(
      "New garage construction with roof work",
      "nothing assessable here",
      "WRECK and demolition"
    ).toDF("t")
    val out = strings(df.select(TextOps.keywordTag($"t").as("v")), "v")
    assert(out(0) == "Construction, Garage, Roof, New")
    assert(out(1) == "")
    assert(out(2) == "Demolition, Wreck")
  }

  test("keywordTag on null text yields empty string") {
    val df = Seq(Option.empty[String]).toDF("t")
    assert(strings(df.select(TextOps.keywordTag($"t").as("v")), "v") == Seq(""))
  }

  test("addressConcat keeps empty slots (pandas ' '.join semantics)") {
    val df = Seq((Some("123"), Option.empty[String], Some("MAIN ST"))).toDF("a", "b", "c")
    val out = strings(df.select(TextOps.addressConcat($"a", $"b", $"c").as("v")), "v")
    assert(out == Seq("123  MAIN ST")) // double space where b is null
  }

  test("smartfileCanon strips special chars then truncates to 259") {
    val df = Seq("a(b)c:d;e+f#g*h&i'j\"k@l½m" + ("x" * 300)).toDF("t")
    val out = strings(df.select(TextOps.smartfileCanon($"t").as("v")), "v")
    assert(out.head.startsWith("abcdefghijklm"))
    assert(out.head.length == 259)
  }

  test("pinHyperlink: null → NO PIN FOUND, multi → plain, else formula (F12)") {
    val df = Seq(
      (Option.empty[String], false),
      (Some("12345678901234"), true),
      (Some("12345678901234"), false)
    ).toDF("pin", "multi")
    val out = strings(df.select(TextOps.pinHyperlink($"pin", $"multi").as("v")), "v")
    assert(out(0) == "NO PIN FOUND")
    assert(out(1) == "12345678901234")
    assert(out(2).startsWith("=HYPERLINK(\"https://maps.cookcountyil.gov") && out(2).endsWith("\"12345678901234\")"))
  }

  test("addrDedupeKey appends the literal warehouse suffix") {
    val df = Seq("100 W MADISON").toDF("t")
    assert(
      strings(df.select(TextOps.addrDedupeKey($"t").as("v")), "v") ==
        Seq("100 W MADISON,,CHICAGO, IL")
    )
  }
}
