package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation (skew mitigation). */
class SkewOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedAgg is bit-identical to the direct group-by, hot key included") {
    // one hot key holding 90% of rows — the shape that motivates salting
    val df = ((0 until 900).map(i => ("hot", i.toLong)) ++
      (0 until 100).map(i => (s"k${i % 7}", i.toLong * 3)))
      .zipWithIndex
      .map { case ((k, v), id) => (id.toLong, k, v) }
      .toDF("id", "k", "v")
    val salted = SkewOps.saltedAgg(df, $"k", $"v", $"id", salts = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("t"), min($"v").as("mn"), max($"v").as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(salted == direct)
    // deterministic under re-execution (md5 salt, not rand())
    val again = SkewOps.saltedAgg(df, $"k", $"v", $"id", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again == salted.view.mapValues(_._2).toMap)
  }

  test("autoSalts sizes shards so the hot key balances within 2x, and the auto join stays exact") {
    // 9000-row hot key + 1000 rows over 7 cold keys, 4 shuffle partitions
    // in the test session → balanced task ≈ 2500 rows → expect ~4 salts
    val big = ((0 until 9000).map(i => (i.toLong, "hot")) ++
      (0 until 1000).map(i => (10000L + i, s"k${i % 7}")))
      .toDF("id", "k")
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "v")
    val salts = SkewOps.autoSalts(big, "k")
    assert(salts > 1, s"skewed fixture should derive >1 salt, got $salts")
    // shard balance on the hot key under the derived salt count
    val shardCounts = big
      .filter($"k" === "hot")
      .withColumn("salt", Hashing.md5Mod($"id".cast("string"), salts.toLong))
      .groupBy($"salt").count()
      .collect().map(_.getLong(1))
    assert(shardCounts.length == salts)
    assert(shardCounts.max <= 2 * shardCounts.min,
      s"hot-key shards unbalanced: ${shardCounts.mkString(",")}")
    // and the auto-sized join is still exactly the plain join
    val got = SkewOps.saltedJoinAuto(big, dim, "k", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    val want = big.join(dim, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("autoSalts returns 1 on an empty big side instead of NPE-ing on the null aggregate") {
    val empty = Seq.empty[(Long, String)].toDF("id", "k")
    assert(SkewOps.autoSalts(empty, "k") == 1)
  }

  test("saltedJoin returns exactly the plain join's rows, dim multiplicity included") {
    val big = ((0 until 800).map(i => (i.toLong, "hot")) ++
      (0 until 200).map(i => (800L + i, s"k${i % 5}")))
      .toDF("id", "k")
    // one dim key carries TWO rows — every matching big row must meet both
    val dim = (Seq(("hot", "H1"), ("hot", "H2")) ++ (0 until 5).map(i => (s"k$i", s"D$i")))
      .toDF("k", "name")
    val salted = SkewOps.saltedJoin(big, dim, "k", $"id", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = big.join(dim, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 1600) // 800 rows × 2 dim rows
  }

  test("saltedAgg's first stage really shards the hot key across sub-groups") {
    val df = (0 until 1000).map(i => (i.toLong, "hot", 1L)).toDF("id", "k", "v")
    // the stage-1 group domain is (key, salt): with 8 salts the hot key's
    // rows must land in >1 shard, or the salting does nothing
    val shards = df
      .select($"k", Hashing.md5Mod($"id".cast("string"), 8L).as("s"))
      .groupBy($"k", $"s").count()
      .collect()
    assert(shards.length > 1, "hot key not sharded")
    assert(shards.map(_.getLong(2)).sum == 1000L)
  }

  test("keySkewAudit reports exact integer shares, ordered, tie-broken, truncated to K") {
    // a:6 b:2 c:1 d:1 → total 10, 4 keys; mean key = 2.5 rows
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val out = SkewOps.keySkewAudit(df, $"k", topK = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      ("a", 6L, 4L, 600000L, 2400L), // 6/10 = 60% of the table, 2.4× the mean key
      ("b", 2L, 4L, 200000L, 800L),
      ("c", 1L, 4L, 100000L, 400L)   // tie with d broken by key asc, d truncated
    ), s"got ${out.toList}")
  }
}
