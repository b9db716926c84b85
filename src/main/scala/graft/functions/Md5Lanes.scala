package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5 lane extractor: `graft_md5_lanes(str)` → `array<bigint>` of
  * the digest's FOUR big-endian uint32 lanes — value-identical, lane for
  * lane, to the hex-string idiom
  * `conv(substring(md5(str), 1 + 8·g, 8), 16, 10)` for g = 0..3 (md5 hex
  * chars 8g+1..8g+8 are digest bytes 4g..4g+3 big-endian), so every DuckDB
  * oracle written against that idiom is unchanged.
  *
  * Why native (the extension-ladder placement of [[OccurrenceCounts]]):
  * the built-in path materializes a 32-char hex string per digest, then
  * per lane a substring copy and a `conv` parse through BigInteger —
  * measured as THE hotspot of the Poisson-bootstrap weight synthesis
  * (32 lanes/row = 2.0 s of stats_bootstrap_ci's 3.6 s at sf0.1). This
  * expression digests the raw bytes once and assembles the four longs
  * with shifts — no hex, no substring, no parse — and `doGenCode` keeps
  * it inside the surrounding WholeStageCodegen span.
  *
  * MessageDigest instances are NOT thread-safe; one per thread, reused
  * across rows (allocation-free steady state).
  */
case class Md5Lanes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_md5_lanes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"input must be STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    Md5Lanes.lanes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.Md5Lanes.lanes(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Lanes {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def lanes(s: UTF8String): ArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](4)
    var g = 0
    while (g < 4) {
      val b = 4 * g
      out(g) = ((d(b) & 0xffL) << 24) | ((d(b + 1) & 0xffL) << 16) |
        ((d(b + 2) & 0xffL) << 8) | (d(b + 3) & 0xffL)
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
