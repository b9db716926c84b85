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

  test("pinHyperlink: null → NO PIN FOUND, 14-digit → formula keeping original text, else passthrough (F12)") {
    val df = Seq(
      Option.empty[String],
      Some("12-34-567-890-1234"),           // hyphens stripped for the URL, kept in display
      Some("12345678901234, 98765432109876") // multi-PIN list passes through
    ).toDF("pin")
    val out = strings(df.select(TextOps.pinHyperlink($"pin").as("v")), "v")
    assert(out(0) == "NO PIN FOUND")
    assert(out(1) == "=HYPERLINK(\"https://www.cookcountyassessoril.gov/pin/12345678901234\", \"12-34-567-890-1234\")")
    assert(out(2) == "12345678901234, 98765432109876")
  }

  test("addressHyperlink appends ', Chicago, IL' to the CookViewer search; null → empty") {
    val df = Seq(Some("100 W MADISON"), Option.empty[String]).toDF("a")
    val out = strings(df.select(TextOps.addressHyperlink($"a").as("v")), "v")
    assert(out(0) == "=HYPERLINK(\"https://maps.cookcountyil.gov/cookviewer/?search=100 W MADISON, Chicago, IL\", \"Click here to open CookViewer\")")
    assert(out(1) == "")
  }

  test("addrDedupeKey appends the literal warehouse suffix") {
    val df = Seq("100 W MADISON").toDF("t")
    assert(
      strings(df.select(TextOps.addrDedupeKey($"t").as("v")), "v") ==
        Seq("100 W MADISON,,CHICAGO, IL")
    )
  }
}
