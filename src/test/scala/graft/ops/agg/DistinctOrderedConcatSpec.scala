package graft.ops.agg

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The typed-Aggregator A1 path (buffer bounded by distinct values). */
class DistinctOrderedConcatSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupes incrementally, keeps first-occurrence (min orderKey) order") {
    val df = Seq(
      ("g1", 3L, "b"), ("g1", 1L, "a"), ("g1", 2L, "b"), // b first seen at 2
      ("g1", 4L, "c"),
      ("g2", 1L, "z")
    ).toDF("g", "k", "v")
    val out = df
      .groupBy($"g")
      .agg(DistinctOrderedConcat.column($"k", $"v").as("names"))
    assert(rows(out) == Seq(Seq("g1", "a, b, c"), Seq("g2", "z")))
  }

  test("null values are skipped, empty group yields empty string") {
    val df = Seq(("g1", 1L, Option.empty[String]), ("g1", 2L, Some("x"))).toDF("g", "k", "v")
    val out = df.groupBy($"g").agg(DistinctOrderedConcat.column($"k", $"v").as("names"))
    assert(strings(out, "names") == Seq("x"))
  }

  test("matches the built-in groupConcatDistinct formulation on fixture data") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val builtin = graft.ops.ReshapeOps
      .groupConcatDistinct(c, Seq(col("c_nationkey")), col("c_name"), col("c_custkey"), "names")
    val agg = c.groupBy(col("c_nationkey"))
      .agg(DistinctOrderedConcat.column(col("c_custkey"), col("c_name")).as("names"))
    assert(rows(builtin) == rows(agg))
  }
}
