package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** J1–J6 (SURVEY.md §2.3). */
class LinkOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("lookupRemap: crosswalk hit remaps, miss keeps original (J3)") {
    val df = Seq("p1", "p2").toDF("pin")
    val cw = Seq(("p1", "meta1")).toDF("original_pin", "meta_pin")
    val out = LinkOps.lookupRemap(df, cw, "pin", "original_pin", "meta_pin")
    assert(strings(out, "pin").sorted == Seq("meta1", "p2"))
  }

  test("semiMembership keeps only rows in the universe; antiMembership the complement (J5/J6)") {
    val df = Seq(1, 2, 3).toDF("k")
    val uni = Seq(2, 3).toDF("u")
    assert(rows(LinkOps.semiMembership(df, uni, $"k" === $"u")) == Seq(Seq(2), Seq(3)))
    assert(rows(LinkOps.antiMembership(df, uni, $"k" === $"u")) == Seq(Seq(1)))
  }

  test("antiDedupe drops rows whose canonical keys exist; nullSafe matches pandas NaN==NaN (J4)") {
    val left = Seq(
      (1L, Some("a"), Some("x")),
      (2L, Some("b"), Some("y")),
      (3L, Option.empty[String], Some("z"))
    ).toDF("id", "k1", "k2")
    val existing = Seq(
      (Some("a"), Some("x")),
      (Option.empty[String], Some("z"))
    ).toDF("k1", "k2")

    // nullSafe=true (pandas semantics): null key matches null key → row 3 dropped
    val strict = LinkOps.antiDedupe(left, existing, Seq("k1", "k2"), nullSafe = true)
    assert(strings(strict, "id") == Seq("2"))

    // nullSafe=false (plain SQL =): null never matches → row 3 kept
    val loose = LinkOps.antiDedupe(left, existing, Seq("k1", "k2"), nullSafe = false)
    assert(strings(loose, "id").sorted == Seq("2", "3"))
  }

  test("saltedJoin produces exactly the plain-join result while splitting hot keys") {
    val big = Seq((1, "a1"), (1, "a2"), (1, "a3"), (2, "b1")).toDF("k", "payload")
    val small = Seq((1, "dim1"), (2, "dim2")).toDF("sk", "attr")
    val plain = big.join(small, $"k" === $"sk").select($"k", $"payload", $"attr")
    val salted = LinkOps.saltedJoin(big, small, "k", "sk", $"payload", salts = 4)
      .select($"k", $"payload", $"attr")
    assert(rows(salted) == rows(plain))
    // the hot key's rows spread across distinct salt values
    val saltSpread = big.filter($"k" === 1)
      .select(pmod(hash($"payload"), lit(4)).as("s")).distinct().count()
    assert(saltSpread > 1)
  }

  test("antiDedupe dedupes the broadcast side (duplicate existing rows are harmless)") {
    val left = Seq((1L, "a")).toDF("id", "k")
    val existing = Seq("a", "a", "a").toDF("k")
    assert(LinkOps.antiDedupe(left, existing, Seq("k")).count() == 0)
  }

  test("bloomGatedJoin equals the plain inner join for any sketch sizing") {
    val big = (1L to 200L).map(i => (i % 50, i)).toDF("k", "payload")
    val build = Seq((7L, "x"), (13L, "y"), (49L, "z")).toDF("bk", "attr")
    val plain = big.join(build, $"k" === $"bk").select($"k", $"payload", $"attr")
    // tiny m forces false positives THROUGH the gate; the join removes them
    for (m <- Seq(64L, 1L << 12)) {
      val gated = LinkOps
        .bloomGatedJoin(big, build, "k", "bk", m = m, k = 3)
        .select($"k", $"payload", $"attr")
      assert(rows(gated) == rows(plain), s"m=$m diverges from the plain join")
    }
  }

  test("bloomGatedJoin plans the gate as a map-side filter on the probe side") {
    // spark.range, not a local Seq: ConvertToLocalRelation would evaluate
    // the (deterministic) gate at optimization time and hide it
    val big = spark.range(1L, 1001L).select($"id".as("k"), $"id".as("payload"))
    val build = Seq((5L, "x")).toDF("bk", "attr")
    val plan = LinkOps
      .bloomGatedJoin(big, build, "k", "bk", m = 1L << 14, k = 3)
      .queryExecution.executedPlan.toString
    // the literal-mask bit arithmetic must appear in the plan (the gate
    // survives optimization and runs before the join, not inside it)
    assert(plan.contains("shiftright"), s"bloom gate missing from the plan:\n$plan")
  }
}
