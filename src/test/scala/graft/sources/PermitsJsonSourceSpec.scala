package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DSv2 S1 connector: pushdown honesty and schema pinning. */
class PermitsJsonSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("permits_json").toFile
    val lines = Seq(
      """{"permit_":"P1","issue_date":"1995-06-01T00:00:00.000000","pin_list":"111","work_description":"New roof"}""",
      """{"permit_":"P2","issue_date":"1996-06-01T00:00:00.000000","pin_list":"222","work_description":"Garage"}""",
      """{"permit_":"P3","issue_date":"1995-01-01T00:00:00.000000","pin_list":null,"work_description":null}"""
    )
    Files.write(new java.io.File(dir, "part-0.json").toPath, lines.mkString("\n").getBytes)
    dir.getAbsolutePath
  }

  private def load(path: String) =
    spark.read
      .format("graft.sources.PermitsJsonSource")
      .option("path", path)
      .schema(Sources.permitsRawSchema)
      .load()

  test("reads JSON lines with the pinned all-string schema, null-safe") {
    val df = load(writeFixture())
    assert(df.schema == Sources.permitsRawSchema)
    assert(df.count() == 3)
    assert(df.filter($"pin_list".isNull).count() == 1)
    // absent fields read as null, not error
    assert(df.filter($"street_name".isNull).count() == 3)
  }

  test("date-range filter is pushed into the scan and rows are skipped at the reader") {
    val df = load(writeFixture())
      .filter($"issue_date" >= "1995-01-01" && $"issue_date" < "1996-01-01")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushed="),
      s"expected pushed filters in plan:\n$plan")
    assert(strings(df, "permit_").sorted == Seq("P1", "P3"))
  }

  test("column pruning reaches the scan (only requested fields materialize)") {
    val df = load(writeFixture()).select($"permit_")
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("permit_"))
    assert(!scanDesc.contains("work_description"), s"pruned column still in scan: $scanDesc")
    assert(strings(df, "permit_").sorted == Seq("P1", "P2", "P3"))
  }

  test("unsupported predicates stay Spark-side residuals and still evaluate correctly") {
    val df = load(writeFixture()).filter(length($"work_description") > 5)
    assert(strings(df, "permit_").sorted == Seq("P1", "P2"))
  }
}
