package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Pins the ingest-boundary routing contract: the `ingest_ok` flag must be
  * a pure function of the payload under the declared schema, malformed
  * rows must survive (routed, not dropped, never job-failing), and the
  * PERMISSIVE partial-parse trap — a truncated tail populating leading
  * fields — must be neutralized by the all-required-fields rule.
  */
class IngestOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lang", StringType), StructField("n", LongType)))

  private def route(payloads: Seq[String]) =
    IngestOps
      .parseWithQuarantine(
        payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("row", "payload"),
        col("payload"), schema, required = Seq("id", "lang", "n"))
      .select(col("row"), col("ingest_ok"))
      .as[(Long, Boolean)]
      .collect()
      .toMap

  test("well-formed rows pass; head-chopped, garbage, and empty rows route to quarantine") {
    val r = route(Seq(
      """{"id":1,"lang":"en","n":10}""", // ok
      """"id":2,"lang":"en","n":10}""", // head-chopped
      "garbage-3", // not JSON at all
      "", // empty
      """{"id":5,"lang":"en"}""" // missing required field
    ))
    assert(r === Map(0L -> true, 1L -> false, 2L -> false, 3L -> false, 4L -> false))
  }

  test("PERMISSIVE partial parse cannot leak a truncated row past the flag") {
    // tail truncation may populate id/lang before the parse dies — the
    // all-required rule must still quarantine it because n never lands
    val r = route(Seq("""{"id":7,"lang":"en","n":1"""))
    assert(r === Map(0L -> false))
  }

  test("typed fields surface for good rows and stay null for quarantined ones") {
    val out = IngestOps
      .parseWithQuarantine(
        Seq((1L, """{"id":9,"lang":"fr","n":42}"""), (2L, "nope")).toDF("row", "payload"),
        col("payload"), schema, required = Seq("id", "lang", "n"))
      .select(col("row"), col("parsed.lang"), col("parsed.n"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(out === Set((1L, Some("fr"), Some(42L)), (2L, None, None)))
  }

  test("a required field absent from the schema fails fast") {
    intercept[IllegalArgumentException] {
      IngestOps.parseWithQuarantine(
        Seq((1L, "{}")).toDF("row", "payload"), col("payload"), schema, required = Seq("missing"))
    }
  }
}
