package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The Catalyst `nullable` contract on the native kernels: `graft_dot`,
  * `graft_dotl` and `graft_adc` can return NULL from NON-NULL inputs
  * (length mismatch / null element), so they must declare `nullable = true`
  * even when both children are non-nullable. If they don't, codegen emits a
  * constant-false `isNull` slot that the generated `${ev.isNull} = true`
  * branch can't assign — invalid Java, and Spark silently falls back to
  * interpreted mode in exactly the ANN hot loops these kernels exist for.
  *
  * These tests force the failure to be LOUD instead of silent:
  * `factoryMode=CODEGEN_ONLY` makes projection codegen errors throw, and
  * `codegen.fallback=false` makes whole-stage compile errors throw. The
  * input columns are built from `spark.range` + `sequence`/`transform`
  * (non-nullable AND non-foldable — literal arrays would be constant-folded
  * away before codegen ever ran, proving nothing).
  */
class KernelNullableSpec extends SparkSpecBase {
  import spark.implicits._

  private def strictCodegen(f: => Unit): Unit =
    withSQLConf(
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false"
    )(f)

  test("graft_dot nullable=true is declared") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    assert(ArrayDot(Literal(1), Literal(2)).nullable)
    assert(ArrayDotLong(Literal(1), Literal(2)).nullable)
    assert(ArrayAdcSum(Literal(1), Literal(2)).nullable)
  }

  test("graft_dot compiles and evaluates under codegen with non-nullable inputs") {
    strictCodegen {
      // a = [1..id+2] as doubles, b = same length — aligned, non-null result
      val df = spark
        .range(4)
        .select(
          transform(sequence(lit(1L), $"id" + 2), x => x.cast("double")).as("a"),
          transform(sequence(lit(1L), $"id" + 2), x => (x * 2).cast("double")).as("b"))
      val out = df.select(call_function("graft_dot", $"a", $"b").as("d")).collect()
      // id=0: [1,2]·[2,4] = 10 ; id=3: [1..5]·[2..10] = 2*(1+4+9+16+25) = 110
      assert(out(0).getDouble(0) == 10.0)
      assert(out(3).getDouble(0) == 110.0)
    }
  }

  test("graft_dot returns NULL under codegen when non-nullable inputs misalign") {
    strictCodegen {
      val df = spark
        .range(3)
        .select(
          transform(sequence(lit(1L), $"id" + 1), x => x.cast("double")).as("a"),
          transform(sequence(lit(1L), $"id" + 2), x => x.cast("double")).as("b"))
      val out = df.select(call_function("graft_dot", $"a", $"b").as("d")).collect()
      assert(out.forall(_.isNullAt(0)), "misaligned non-nullable arrays must yield NULL")
    }
  }

  test("graft_dotl compiles and evaluates under codegen with non-nullable inputs") {
    strictCodegen {
      val df = spark
        .range(4)
        .select(
          sequence(lit(1L), $"id" + 2).as("a"),
          transform(sequence(lit(1L), $"id" + 2), x => x * 3).as("b"))
      val out = df.select(call_function("graft_dotl", $"a", $"b").as("d")).collect()
      // id=0: [1,2]·[3,6] = 15 ; id=3: 3*(1+4+9+16+25) = 165
      assert(out(0).getLong(0) == 15L)
      assert(out(3).getLong(0) == 165L)

      val mis = spark
        .range(3)
        .select(
          sequence(lit(1L), $"id" + 1).as("a"),
          sequence(lit(1L), $"id" + 2).as("b"))
        .select(call_function("graft_dotl", $"a", $"b").as("d"))
        .collect()
      assert(mis.forall(_.isNullAt(0)), "misaligned non-nullable arrays must yield NULL")
    }
  }

  test("graft_adc compiles and evaluates under codegen with non-nullable inputs") {
    strictCodegen {
      // tbl = [[id, id+1], [2id, id]] (non-nullable nested), codes = [0, 1]
      val df = spark
        .range(4)
        .select(
          array(array($"id", $"id" + 1), array($"id" * 2, $"id")).as("tbl"),
          array(lit(0), lit(1)).as("codes"))
      val out = df.select(call_function("graft_adc", $"tbl", $"codes").as("d")).collect()
      // Σ = tbl[0][0] + tbl[1][1] = id + id = 2*id
      (0 until 4).foreach(i => assert(out(i).getLong(0) == 2L * i))

      // length mismatch: 2 subspaces vs 1 code → NULL, still under codegen
      val mis = spark
        .range(3)
        .select(
          array(array($"id"), array($"id")).as("tbl"),
          array(lit(0)).as("codes"))
        .select(call_function("graft_adc", $"tbl", concat($"codes", array(lit(0), lit(0)))).as("d"))
        .collect()
      assert(mis.forall(_.isNullAt(0)), "subspace/code count mismatch must yield NULL")
    }
  }

  test("IsNull over a kernel on non-nullable inputs is not constant-folded away") {
    // With nullable=false the optimizer's NullPropagation would fold
    // IsNull(graft_dotl(a, b)) to literal false — a wrong answer whenever the
    // lengths mismatch. Assert the real nullability survives optimization.
    val df = spark
      .range(3)
      .select(
        sequence(lit(1L), $"id" + 1).as("a"),
        sequence(lit(1L), $"id" + 2).as("b"))
    val n = df.filter(call_function("graft_dotl", $"a", $"b").isNull).count()
    assert(n == 3L, s"expected all 3 misaligned rows to survive the IsNull filter, got $n")
  }
}
