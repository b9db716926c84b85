package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** F13–F17 (SURVEY.md §2.9): coercing parsers, renderers, Excel serials. */
class TimeOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("parseIsoMicros parses fractional-second ISO and coerces junk to null") {
    val df = Seq("2024-03-05T14:30:15.123456", "not-a-date").toDF("t")
    val out = df.select(TimeOps.parseIsoMicros($"t").cast("string").as("v")).collect().map(_.getString(0))
    assert(out(0) == "2024-03-05 14:30:15.123456")
    assert(out(1) == null)
  }

  test("parseFlexible: first matching format wins, junk coerces to null") {
    val df = Seq("2024-03-05", "03/05/2024", "3/5/2024", "2024-03-05 10:00:00", "nope").toDF("t")
    val out = df.select(TimeOps.parseFlexible($"t").cast("date").cast("string").as("v"))
      .collect().map(_.getString(0))
    assert(out.take(4).forall(_ == "2024-03-05"))
    assert(out(4) == null)
  }

  test("renderMDY has no zero padding; renderMDYPadded does") {
    val df = Seq("2024-03-05").toDF("t").select(to_timestamp($"t").as("ts"))
    assert(strings(df.select(TimeOps.renderMDY($"ts").as("v")), "v") == Seq("3/5/2024"))
    assert(strings(df.select(TimeOps.renderMDYPadded($"ts").as("v")), "v") == Seq("03/05/2024"))
  }

  test("excelSerialToDate uses origin 1899-12-30") {
    val df = Seq(0, 1, 45000).toDF("n")
    val out = strings(df.select(TimeOps.excelSerialToDate($"n").cast("string").as("v")), "v")
    assert(out == Seq("1899-12-30", "1899-12-31", "2023-03-15"))
  }

  test("renderPermdt renders millisecond precision") {
    val df = Seq("2024-03-05T14:30:15.123456").toDF("t")
    val out = strings(df.select(TimeOps.renderPermdt(TimeOps.parseIsoMicros($"t")).as("v")), "v")
    assert(out == Seq("2024-03-05 14:30:15.123"))
  }

  test("yearOf extracts the year through the flexible parser") {
    val df = Seq("03/05/2024").toDF("t")
    assert(df.select(TimeOps.yearOf($"t").as("v")).collect().head.getInt(0) == 2024)
  }
}
