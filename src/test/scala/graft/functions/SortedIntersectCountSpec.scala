package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SortedIntersectCountSpec extends SparkSpecBase {
  import spark.implicits._

  test("graft_inter_sorted equals size(array_intersect) on sorted distinct arrays") {
    // pseudo-random distinct token sets, sorted in sort_array order —
    // the operator's contract — across overlap regimes incl. empty/identical
    val df = spark.range(0, 200)
      .select(
        $"id",
        sort_array(array_distinct(transform(
          sequence(lit(0), (pmod($"id" * 7, lit(12))).cast("int")),
          i => concat(lit("t"), pmod($"id" * 13 + i * 29, lit(40)))))).as("a"),
        sort_array(array_distinct(transform(
          sequence(lit(0), (pmod($"id" * 11, lit(12))).cast("int")),
          i => concat(lit("t"), pmod($"id" * 17 + i * 23, lit(40)))))).as("b"))
    val out = df.select(
      call_function("graft_inter_sorted", $"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).cast("long").as("builtin"))
    assert(out.filter($"native" =!= $"builtin").count() == 0L)
  }

  test("null array yields null; null elements never match; unsorted input is the caller's bug") {
    val df = Seq(
      (Seq("a", "b"), null.asInstanceOf[Seq[String]]),
      (Seq("a", null, "c"), Seq("a", "c", null))
    ).toDF("a", "b")
    val got = df.select(call_function("graft_inter_sorted", $"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getLong(0) == 2L) // a, c match; nulls skipped
  }

  test("the verify stage stays inside WholeStageCodegen (no CodegenFallback)") {
    val df = spark.range(0, 10).select(
      array(concat(lit("x"), $"id".cast("string")), lit("a")).as("a"),
      array(lit("a"), lit("b")).as("b"))
    val plan = df.select(call_function("graft_inter_sorted", $"a", $"b").as("n"))
      .queryExecution.executedPlan.toString
    // the `*(n)` operator prefix is the WholeStageCodegen marker; a
    // CodegenFallback expression would strip it from the Project
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("graft_inter_sorted")),
      s"expected the projection inside a codegen span:\n$plan")
  }
}
