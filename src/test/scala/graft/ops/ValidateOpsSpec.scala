package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** §2.10 — the flagship validate-and-partition operator. */
class ValidateOpsSpec extends SparkSpecBase {
  import spark.implicits._
  import ValidateOps._

  private val df = Seq(
    ("12345678901234", "PERMIT1", "100"),   // valid
    ("123", "PERMIT2", "100"),              // bad pin
    ("12345678901234", "", "0"),            // blank permit + bad amount
    (null, null, null)                      // everything fires
  ).toDF("pin", "permit_no", "amount")

  private val rules = Seq(
    Rules.pin14($"pin"),
    Rules.nonBlank($"pin", "pin"),
    Rules.nonBlank($"permit_no", "permit_no"),
    Rules.amountRange($"amount")
  )

  test("partition is a true partition: disjoint and union-complete") {
    val (up, rev) = ValidateOps.partition(df, rules)
    assert(up.count() + rev.count() == df.count())
    assert(up.columns.toSeq == df.columns.toSeq) // upload drops the errors col
    val upKeys = strings(up, "pin").toSet
    assert(upKeys == Set("12345678901234"))
  }

  test("errors array preserves rule order and collects every fired message") {
    val flagged = ValidateOps.withErrors(df, rules)
    val errs = flagged
      .select($"pin", array_join($"errors", "; ").as("e"))
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("NULL"), r.getString(1)))
      .toMap
    assert(errs("123") == "PIN is not 14 digits")
    assert(errs("NULL") == "Missing pin; Missing permit_no; Amount must be a whole number between 1 and 2,147,483,647")
  }

  test("amountRange: blank, non-numeric, <1, >2^31-1 all fire; boundary values pass") {
    val amounts = Seq("1", "2147483647", "0", "2147483648", "abc", "").toDF("a")
    val rule = Rules.amountRange($"a")
    val fired = amounts.select($"a", rule.fires.as("f")).collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!fired("1") && !fired("2147483647"))
    assert(fired("0") && fired("2147483648") && fired("abc") && fired(""))
  }

  test("excelErrorFormula renders the formula twin from the SAME rule list") {
    val formula = ValidateOps.excelErrorFormula(
      rules,
      Map("pin_not_14" -> "B2", "missing_pin" -> "B2",
          "missing_permit_no" -> "C2", "amount_invalid" -> "D2")
    )
    // every sheet-expressible rule appears with its exact message text
    assert(formula.contains("""LEN(SUBSTITUTE(B2,"-",""))<>14"""))
    assert(formula.contains("PIN is not 14 digits; "))
    assert(formula.contains("""OR(NOT(ISNUMBER(D2)),D2<1,D2>2147483647)"""))
    assert(formula.startsWith("""=TEXTJOIN("",TRUE,IF("""))
  }

  test("withFlags builds named booleans plus their conjunction (legacy twin)") {
    val flagged = ValidateOps.withFlags(
      df,
      Seq("valid_pin" -> (!Rules.pin14($"pin").fires && !Rules.nonBlank($"pin", "pin").fires),
          "valid_amount" -> !Rules.amountRange($"amount").fires)
    )
    val validRows = flagged.filter($"valid_row").count()
    assert(validRows == 1)
    assert(flagged.columns.contains("valid_pin") && flagged.columns.contains("valid_row"))
  }
}
