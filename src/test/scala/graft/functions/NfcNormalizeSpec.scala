package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** graft_nfc: Unicode NFC composition with the ASCII fast path. */
class NfcNormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  // explicit escapes so no editor/tool normalization can silently change
  // which form a literal is in
  private val eAcuteDecomposed = "e\u0301"      // -> \u00e9
  private val eAcuteComposed = "\u00e9"
  private val angstromDecomposed = "A\u030Angstro\u0308m"
  private val angstromComposed = "\u00C5ngstr\u00F6m"

  test("composes decomposed sequences and is identity on ASCII and already-NFC text") {
    val rows = Seq(
      "plain ascii",
      "caf" + eAcuteDecomposed,
      "caf" + eAcuteComposed,
      angstromDecomposed,
      ""
    ).toDF("t")
    val out = rows.select(expr("graft_nfc(t)").as("n")).collect().map(_.getString(0))
    assert(out(0) == "plain ascii")
    assert(out(1) == "caf" + eAcuteComposed && out(1).length == 4)
    assert(out(2) == "caf" + eAcuteComposed)
    assert(out(3) == angstromComposed)
    assert(out(4) == "")
  }

  test("null-safe and usable inside ordinary column algebra") {
    val df = Seq(Some(eAcuteDecomposed), None).toDF("t")
    val out = df.select(length(expr("graft_nfc(t)")).as("l")).collect()
    assert(out(0).getInt(0) == 1)
    assert(out(1).isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val inputs = Seq("x", eAcuteDecomposed + "y", "no\u0308")
    val viaExpr = inputs.toDF("t").select(expr("graft_nfc(t)")).collect().map(_.getString(0))
    val direct = inputs.map(s =>
      NfcNormalize.nfc(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(viaExpr.toSeq == direct)
  }
}
