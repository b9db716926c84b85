package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** X1/X2, A1/A5/A6, W2/S8 (SURVEY.md §2.4/2.5/2.8). */
class ReshapeOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("explodeDelimited: split, first-occurrence dedupe, 1-based pos, null rows survive") {
    val df = Seq(
      (1L, "a | b | a | c"), // dup "a" dropped, order kept
      (2L, null)             // survives with null value/pos
    ).toDF("id", "pins")
    val out = ReshapeOps.explodeDelimited(df, $"pins", " \\| ", "pin", "pos")
      .select($"id", $"pos", $"pin")
    assert(
      rows(out) == Seq(
        Seq(1L, 1, "a"), Seq(1L, 2, "b"), Seq(1L, 3, "c"),
        Seq(2L, null, null)
      ).sortBy(_.mkString("|"))
    )
  }

  test("ensureColumns adds missing columns as null and fixes the order (P2)") {
    val df = Seq((1, "x")).toDF("b", "c")
    val out = ReshapeOps.ensureColumns(df, Seq("a", "b", "c"))
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(rows(out) == Seq(Seq(null, 1, "x")))
  }

  test("unpivotWide drops null values (pivot_longer values_drop_na)") {
    val df = Seq((1L, Some("x"), Option.empty[String])).toDF("id", "PIN1", "PIN2")
    val out = ReshapeOps.unpivotWide(df, Seq("id"), Seq("PIN1", "PIN2"), "attr", "val")
    assert(rows(out) == Seq(Seq(1L, "PIN1", "x")))
  }

  test("groupConcatDistinct joins unique values in explicit first-occurrence order") {
    val df = Seq(
      ("addr1", "p2", 2), ("addr1", "p1", 1), ("addr1", "p2", 3), // dup p2
      ("addr2", "p9", 1)
    ).toDF("addr", "pin", "ord")
    val out = ReshapeOps.groupConcatDistinct(df, Seq($"addr"), $"pin", $"ord", "pins")
    assert(rows(out) == Seq(Seq("addr1", "p1, p2"), Seq("addr2", "p9")))
  }

  test("dupFlag marks ALL members of duplicate groups (pandas keep=False)") {
    val df = Seq((1, "a"), (1, "a"), (2, "b")).toDF("k1", "k2")
    val out = df.transform(d => ReshapeOps.dupFlag(d, Seq("k1", "k2"), "dup"))
    assert(out.filter($"dup").count() == 2 && out.filter(!$"dup").count() == 1)
  }

  test("firstPerGroup picks exactly one row per key under the explicit order") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "z", 30)).toDF("k", "v", "x")
    val out = ReshapeOps.firstPerGroup(df, Seq("k"), Seq($"v"))
    assert(rows(out.select($"k", $"v")) == Seq(Seq(1, "a"), Seq(2, "z")))
  }

  test("property: explode ∘ group-concat round-trips a delimited list") {
    // SURVEY §5: explode×group-concat round-trip — rebuild the pin_list from
    // its exploded rows and recover the original (deduped) list
    val df = Seq((1L, "a | b | c"), (2L, "x | y"), (3L, "q | q | r")).toDF("id", "pins")
    val exploded = ReshapeOps.explodeDelimited(df, $"pins", " \\| ", "pin", "pos")
    val rebuilt = ReshapeOps.groupConcatDistinct(
      exploded.filter($"pin".isNotNull), Seq($"id"), $"pin", $"pos", "pins"
    ).withColumn("pins", regexp_replace($"pins", ", ", " | "))
    val expected = Seq(Seq(1L, "a | b | c"), Seq(2L, "x | y"), Seq(3L, "q | r"))
    assert(rows(rebuilt) == expected.sortBy(_.mkString("|")))
  }

  test("property: partition outputs are disjoint and union-complete on fixture data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    import graft.ops.ValidateOps
    val rules = Seq(
      ValidateOps.Rules.maxLen($"l_returnflag", 0, "returnflag"),
      ValidateOps.Rules.amountRange($"l_quantity")
    )
    val (up, rev) = ValidateOps.partition(li, rules)
    assert(up.count() + rev.count() == li.count())
    assert(up.join(rev, Seq("l_orderkey", "l_partkey", "l_linenumber"), "inner").count() == 0 ||
      // duplicate fixture rows can legitimately land on both sides only as
      // exact copies — verify via full-row intersection instead
      up.intersect(rev.drop("errors")).count() == 0)
  }

  test("numberedBuckets: global numbering chunked and renumbered per bucket") {
    val df = (1 to 7).toDF("n")
    val out = ReshapeOps.numberedBuckets(df, Seq($"n"), 3, "bucket", "line")
    assert(
      rows(out) == Seq(
        Seq(1, 0L, 1L), Seq(2, 0L, 2L), Seq(3, 0L, 3L),
        Seq(4, 1L, 1L), Seq(5, 1L, 2L), Seq(6, 1L, 3L),
        Seq(7, 2L, 1L)
      ).sortBy(_.mkString("|"))
    )
  }

  test("numberedBucketsDistributed: per-bucket 1..n numbering across many tasks") {
    import org.apache.spark.sql.functions.spark_partition_id
    val df = (1 to 5000).toDF("n")
    val out = ReshapeOps
      .numberedBucketsDistributed(df, Seq($"n".cast("string")), Seq($"n"), 64, "bucket", "line")
    val collected = out.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // every bucket numbers 1..|bucket| contiguously, ordered by n
    collected.groupBy(_._2).foreach { case (b, rs) =>
      val lines = rs.sortBy(_._1).map(_._3).toSeq
      assert(lines == (1L to rs.length.toLong), s"bucket $b numbering broken")
    }
    assert(collected.map(_._2).distinct.length > 32, "content hash should spread buckets")
    // the numbering work really distributes: more than one task emits rows
    // (the global-sort variant serializes everything through a single task).
    // AQE rightly coalesces this KB-scale shuffle to one partition, so pin
    // coalescing off for the assertion — at real scale the partitions stay.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      val tasks = out.withColumn("pid", spark_partition_id())
        .filter($"line" >= 1) // reference the window output so it isn't pruned
        .select("pid").distinct().count()
      assert(tasks > 1, s"expected >1 task to produce rows, got $tasks")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("topKPerGroup matches the window truth, id-tiebroken, repartition-invariant") {
    val df = Seq(
      ("a", 5L, 1L), ("a", 9L, 2L), ("a", 9L, 3L), ("a", 7L, 4L), ("a", 1L, 5L),
      ("b", 2L, 6L)
    ).toDF("g", "v", "id")
    val expected = Seq(
      Seq("a", 1, 9L, 3L), // value tie (9,9) → greater id first
      Seq("a", 2, 9L, 2L),
      Seq("a", 3, 7L, 4L),
      Seq("b", 1, 2L, 6L)
    ).map(_.mkString("|")).sorted
    // 7 partitions: partial heaps must merge across map tasks and still
    // produce the identical ranking
    val out = ReshapeOps
      .topKPerGroup(df.repartition(7), col("g"), col("v"), col("id"), k = 3)
      .collect()
      .map(r => Seq(r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)).mkString("|"))
      .sorted
    assert(out.toSeq == expected)
  }
}
