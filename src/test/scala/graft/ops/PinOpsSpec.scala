package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** F1–F6 (SURVEY.md §2.9): PIN normalization column algebra.
  * Property: normalizePin is idempotent and emits 14 digits for the
  * reference's recognized shapes (9/10/13/14, with or without hyphens).
  */
class PinOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("stripHyphens is literal, not regex") {
    val out = strings(Seq("12-34-567", "a.b-c").toDF("p").select(PinOps.stripHyphens($"p").as("v")), "v")
    assert(out.sorted == Seq("1234567", "a.bc").sorted)
  }

  test("padPin: 10-digit appends 0000, null becomes empty, others unchanged") {
    val df = Seq(Some("1234567890"), None, Some("12345678901234"), Some("123")).toDF("p")
    val out = strings(df.select(PinOps.padPin($"p").as("v")), "v")
    assert(out.toSet == Set("12345678900000", "", "12345678901234", "123"))
  }

  test("normalizePin handles 9/10/13/14 and hyphenated input") {
    val cases = Seq(
      "123456789" -> "01234567890000",        // 9: prepend 0 + append 0000
      "1234567890" -> "12345678900000",       // 10: append 0000
      "1234567890123" -> "01234567890123",    // 13: prepend 0
      "12345678901234" -> "12345678901234",   // 14: unchanged
      "12-34-567-890-1234" -> "12345678901234", // hyphens stripped first
      "1234567" -> "1234567"                  // unrecognized length passes through
    )
    val df = cases.map(_._1).toDF("p")
    val out = strings(df.select(PinOps.normalizePin($"p").as("v")), "v")
    assert(out == cases.map(_._2))
  }

  test("normalizePin is idempotent on recognized shapes") {
    val ins = Seq("123456789", "1234567890", "1234567890123", "12345678901234")
    val df = ins.toDF("p")
    val once = df.select(PinOps.normalizePin($"p").as("v"))
    val twice = once.select(PinOps.normalizePin($"v").as("v"))
    assert(strings(once, "v") == strings(twice, "v"))
    assert(strings(once, "v").forall(_.matches("^\\d{14}$")))
  }

  test("normalizePinPy strips all non-digits and maps null to empty (py twin)") {
    val df = Seq(Some("12-34-567-890-1234"), Some("PIN:1234567890"), None).toDF("p")
    val out = strings(df.select(PinOps.normalizePinPy($"p").as("v")), "v")
    assert(out == Seq("12345678901234", "12345678900000", ""))
  }

  test("hyphenate produces XX-XX-XXX-XXX-XXXX and membershipKey round-trips") {
    val df = Seq("12345678901234").toDF("p")
    assert(strings(df.select(PinOps.hyphenate($"p").as("v")), "v") == Seq("12-34-567-890-1234"))
    val rt = df.select(PinOps.membershipKey(PinOps.hyphenate($"p")).as("v"))
    assert(strings(rt, "v") == Seq("12345678901234"))
  }

  test("membershipKey zero-fills short keys and maps null to all-zeros") {
    val df = Seq(Some("1234"), None).toDF("p")
    assert(
      strings(df.select(PinOps.membershipKey($"p").as("v")), "v").toSet ==
        Set("00000000001234", "00000000000000")
    )
  }
}
