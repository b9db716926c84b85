package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SortedIntersectCountLongSpec extends SparkSpecBase {
  import spark.implicits._

  test("graft_inter_sorted_l equals size(array_intersect) on sorted distinct long arrays") {
    val df = spark.range(0, 200)
      .select(
        $"id",
        sort_array(array_distinct(transform(
          sequence(lit(0), (pmod($"id" * 7, lit(12))).cast("int")),
          i => pmod($"id" * 13 + i * 29, lit(40))))).as("a"),
        sort_array(array_distinct(transform(
          sequence(lit(0), (pmod($"id" * 11, lit(12))).cast("int")),
          i => pmod($"id" * 17 + i * 23, lit(40))))).as("b"))
    val out = df.select(
      call_function("graft_inter_sorted_l", $"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).cast("long").as("builtin"))
    assert(out.filter($"native" =!= $"builtin").count() == 0L)
  }

  test("null array yields null; null elements never match") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), null.asInstanceOf[Seq[java.lang.Long]]),
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 3L, null))
    ).toDF("a", "b")
    val out = df.select(call_function("graft_inter_sorted_l", $"a", $"b").as("c")).collect()
    assert(out(0).isNullAt(0), "null array must propagate null")
    assert(out(1).getLong(0) == 2L, "null elements must be skipped, values matched")
  }
}
