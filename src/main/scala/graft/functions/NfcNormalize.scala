package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization: `graft_nfc(text)` → composed form.
  *
  * Text canonicalization before dedup/fingerprinting: the SAME visible
  * string can arrive composed (é = U+00E9) or decomposed (e + U+0301),
  * and every digest-keyed operator in the engine (exact dedup, minhash
  * shingles, fingerprints) would treat them as different documents.
  * Spark ships no normalization function, so this is the second rung of
  * the extension ladder — a native `Expression` over the JDK's
  * `java.text.Normalizer` with a zero-copy ASCII fast path (the common
  * case: an all-ASCII `UTF8String` is returned untouched, no String
  * round-trip). Codegen is a static call on the materialized
  * `UTF8String`, so the expression stays inside the surrounding
  * WholeStageCodegen span. DuckDB's `nfc_normalize` implements the same
  * Unicode algorithm, which is what makes the oracle byte-exact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be STRING, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by interpreted and generated paths. */
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: every ASCII string is already NFC — skip the
    // String round-trip entirely (byte < 0 ⇔ a non-ASCII UTF-8 byte)
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
