package graft.functions

import graft.SparkSpecBase
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Exactness contract of the native dot product: [[ArrayDot]] must be
  * bit-identical to the built-in HOF fold it replaced ([[Similarity.dotHof]])
  * — every recorded oracle hash depends on it.
  */
class ArrayDotSpec extends SparkSpecBase {
  import spark.implicits._

  test("graft_dot is bit-identical to the HOF fold across fixture pair products") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", Similarity.quantize($"embedding").as("q"))
    val a = e.select($"vec_id".as("ia"), $"q".as("qa"))
    val b = e.select($"vec_id".as("ib"), $"q".as("qb"))
    // a 50×N slice of real cross pairs (plus every self pair via ia == ib)
    val pairs = a.filter($"ia" < 50).join(b)
    val diff = pairs
      .select(
        Similarity.dot($"qa", $"qb").as("native"),
        Similarity.dotHof($"qa", $"qb").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff == 0, s"$diff pair products diverge from the HOF fold")
  }

  test("graft_dotl is bit-identical to the long HOF fold across fixture pair products") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", Similarity.quantize($"embedding").as("q"))
    val a = e.select($"vec_id".as("ia"), $"q".as("qa"))
    val b = e.select($"vec_id".as("ib"), $"q".as("qb"))
    val diff = a
      .filter($"ia" < 50)
      .join(b)
      .select(
        call_function("graft_dotl", $"qa", $"qb").as("native"),
        aggregate(zip_with($"qa", $"qb", (x, y) => x * y), lit(0L), (acc, v) => acc + v)
          .as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff == 0, s"$diff integer pair products diverge from the HOF fold")
  }

  test("graft_dot handles raw float embeddings bit-identically to the HOF fold") {
    // the unquantized cosine path: array<float> inputs, float→double exact widening
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val diff = a
      .filter($"ia" < 50)
      .join(b)
      .select(
        Similarity.dot($"va", $"vb").as("native"),
        Similarity.dotHof($"va", $"vb").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff == 0, s"$diff float pair products diverge from the HOF fold")
  }

  test("length mismatch and null elements yield NULL, like the padded fold") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),       // length mismatch
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)), // null element
      (Seq[java.lang.Long](2L, 3L), Seq[java.lang.Long](4L, 5L))    // clean: 8 + 15
    ).toDF("a", "b")
    val out = df
      .select(Similarity.dot($"a", $"b").as("native"), Similarity.dotHof($"a", $"b").as("hof"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1), "length mismatch must be NULL on both")
    assert(out(1).isNullAt(0) && out(1).isNullAt(1), "null element must be NULL on both")
    assert(out(2).getDouble(0) == 23.0 && out(2).getDouble(1) == 23.0)
  }
}
