package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** CDC/MERGE apply (extension; see ChangeOps.applyChangelog). */
class ChangeOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0),
    (2L, "b", 20.0),
    (3L, "c", 30.0)
  ).toDF("id", "name", "amt")

  test("upsert replaces, delete removes, insert appears, untouched rows survive") {
    val changes = Seq(
      (2L, "b2", 22.0, "U", 1L), // update key 2
      (3L, "c", 30.0, "D", 1L),  // delete key 3
      (9L, "new", 90.0, "U", 1L) // insert key 9
    ).toDF("id", "name", "amt", "op", "seq")
    val out = ChangeOps.applyChangelog(base, changes, Seq("id"), "op", "seq")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out == Map(
      1L -> (("a", 10.0)),   // untouched
      2L -> (("b2", 22.0)),  // updated
      9L -> (("new", 90.0))  // inserted
    ))
  }

  test("highest seq wins per key; a seq tie resolves U over D") {
    val changes = Seq(
      (1L, "v1", 1.0, "U", 1L),
      (1L, "v2", 2.0, "U", 5L), // latest update wins
      (1L, "v3", 3.0, "U", 3L),
      (2L, "x", 0.0, "D", 4L),
      (2L, "x2", 9.0, "U", 4L) // tie at seq 4: U beats D
    ).toDF("id", "name", "amt", "op", "seq")
    val out = ChangeOps.applyChangelog(base, changes, Seq("id"), "op", "seq")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(out(1L) == (("v2", 2.0)))
    assert(out(2L) == (("x2", 9.0)))
    assert(out(3L) == (("c", 30.0)))
  }

  test("a delete then a later re-insert of the same key leaves the new row") {
    val changes = Seq(
      (2L, "gone", 0.0, "D", 1L),
      (2L, "back", 5.0, "U", 2L)
    ).toDF("id", "name", "amt", "op", "seq")
    val out = ChangeOps.applyChangelog(base, changes, Seq("id"), "op", "seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(2L) == "back")
  }

  test("exactly one exchange: union is free, only the key window shuffles") {
    val changes = Seq((1L, "z", 0.0, "U", 1L)).toDF("id", "name", "amt", "op", "seq")
    val plan = ChangeOps.applyChangelog(base, changes, Seq("id"), "op", "seq")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length - "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one exchange:\n$plan")
  }

  test("changelogHistory: intervals chain per key, deletes close without emitting") {
    val changes = Seq(
      (1L, "v0", 10.0, "U", 0L),
      (1L, "v1", 11.0, "U", 3L),
      (1L, "v2", 12.0, "U", 7L), // open
      (2L, "w0", 20.0, "U", 0L),
      (2L, "w0", 20.0, "D", 5L), // closes w0, emits nothing
      (3L, "x0", 30.0, "U", 2L)  // open
    ).toDF("id", "name", "amt", "op", "seq")
    val out = ChangeOps.changelogHistory(changes, Seq("id"), "op", "seq")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))))
      .toMap
    assert(out((1L, "v0")) == ((0L, Some(3L), false)))
    assert(out((1L, "v1")) == ((3L, Some(7L), false)))
    assert(out((1L, "v2")) == ((7L, None, true)))
    assert(out((2L, "w0")) == ((0L, Some(5L), false)))
    assert(out((3L, "x0")) == ((2L, None, true)))
    assert(out.size == 5, "delete rows must not emit intervals")
  }

  test("changelogHistory agrees with applyChangelog on the current rows") {
    val changes = Seq(
      (1L, "a2", 11.0, "U", 1L),
      (2L, "b", 20.0, "D", 1L),
      (9L, "new", 90.0, "U", 1L)
    ).toDF("id", "name", "amt", "op", "seq")
    val full = base.withColumn("op", lit("U")).withColumn("seq", lit(0L))
      .unionByName(changes)
    val current = ChangeOps.changelogHistory(full, Seq("id"), "op", "seq")
      .filter($"is_current")
      .select($"id", $"name", $"amt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val applied = ChangeOps.applyChangelog(base, changes, Seq("id"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(current == applied, s"history current rows $current != applied snapshot $applied")
  }

  test("applyChangelogAgg equals applyChangelog when base enters as MinValue upserts") {
    val changes = Seq(
      (1L, "a2", 11.0, "U", 1L),
      (1L, "a3", 12.0, "U", 3L),
      (2L, "b", 20.0, "D", 1L),
      (9L, "new", 90.0, "U", 1L),
      (9L, "new", 0.0, "D", 1L) // tie at seq 1: U beats D
    ).toDF("id", "name", "amt", "op", "seq")
    val full = base.withColumn("op", lit("U")).withColumn("seq", lit(Long.MinValue))
      .unionByName(changes)
    val cols = Seq("id", "name", "amt")
    val agg = ChangeOps.applyChangelogAgg(full, Seq("id"), "op", "seq", cols)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val win = ChangeOps.applyChangelog(base, changes, Seq("id"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(agg == win, s"agg form $agg != window form $win")
    assert(agg.contains((9L, "new", 90.0)), "U must beat D on a sequence tie")
  }

  test("applyChangelogAgg runs as a streaming aggregation and drains the same snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows: Seq[(Long, String, Double, String, Long)] = Seq(
      (1L, "a", 10.0, "U", Long.MinValue),
      (2L, "b", 20.0, "U", Long.MinValue),
      (1L, "a2", 11.0, "U", 1L),
      (2L, "b", 20.0, "D", 2L),
      (9L, "new", 90.0, "U", 1L)
    )
    val mem = MemoryStream[(Long, String, Double, String, Long)]
    val snap = ChangeOps.applyChangelogAgg(
      mem.toDF().toDF("id", "name", "amt", "op", "seq"),
      Seq("id"), "op", "seq", Seq("id", "name", "amt"))
    val q = snap.writeStream.format("memory").queryName("cdc_agg_test")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cdc_agg_test").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    spark.catalog.dropTempView("cdc_agg_test")
    assert(got == Set((1L, "a2", 11.0), (9L, "new", 90.0)))
  }

  test("snapshotAt reconstructs the table as of each sequence time; deletes vanish") {
    // key 1: insert@0, update@1; key 2: insert@0, delete@2; key 3: insert@0
    val changes = Seq(
      (1L, "a1", "U", 0L), (1L, "a2", "U", 1L),
      (2L, "b1", "U", 0L), (2L, "b1", "D", 2L),
      (3L, "c1", "U", 0L)
    ).toDF("id", "name", "op", "seq")
    val hist = ChangeOps.changelogHistory(changes, Seq("id"), "op", "seq")
    def at(t: Long) = ChangeOps.snapshotAt(hist, t)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at(0L) == Map(1L -> "a1", 2L -> "b1", 3L -> "c1"), s"t=0: ${at(0L)}")
    assert(at(1L) == Map(1L -> "a2", 2L -> "b1", 3L -> "c1"), s"t=1: ${at(1L)}")
    assert(at(2L) == Map(1L -> "a2", 3L -> "c1"), s"deleted key must vanish at t=2: ${at(2L)}")
    intercept[IllegalArgumentException] { ChangeOps.snapshotAt(changes, 0L) }
  }

  test("snapshotDiff classifies I/U/D, skips identical rows, null-safe on payload") {
    val prev = Seq(
      (1L, Option("a"), Option(10.0)),
      (2L, Option("b"), Option(20.0)),
      (3L, Option("c"), Option.empty[Double]),
      (4L, Option("d"), Option(40.0))
    ).toDF("id", "name", "amt")
    val next = Seq(
      (1L, Option("a"), Option(10.0)),          // identical → silent
      (2L, Option("b"), Option(21.0)),          // changed → U
      (3L, Option("c"), Option(33.0)),          // null → value is a real U
      (5L, Option("e"), Option(50.0))           // new key → I; 4 vanishes → D
    ).toDF("id", "name", "amt")
    val out = ChangeOps.snapshotDiff(prev, next, "id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(3), Option(r.get(2)))))
      .toMap
    assert(out.keySet == Set(2L, 3L, 4L, 5L), s"identical rows must be silent: ${out.keySet}")
    assert(out(2L) == (("U", Some(21.0))))
    assert(out(3L) == (("U", Some(33.0))), "null→value must diff as U")
    assert(out(4L) == (("D", Some(40.0))), "a delete carries prev's payload")
    assert(out(5L) == (("I", Some(50.0))))
  }

  test("snapshotDiff round-trips: applying the diff to prev reproduces next") {
    val rng = new scala.util.Random(31)
    val prev = (1 to 300).map(i => (i.toLong, s"n$i", rng.nextInt(50).toDouble))
      .toDF("id", "name", "amt")
    val next = (1 to 350).filter(_ % 7 != 0)
      .map(i => (i.toLong, s"n$i", if (i % 3 == 0) 999.0 else rng.nextInt(50).toDouble))
      .toDF("id", "name", "amt")
    val diff = ChangeOps.snapshotDiff(prev, next, "id").withColumn("seq", lit(1L))
    val replayed = ChangeOps.applyChangelog(prev, diff, Seq("id"), "op", "seq")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted.toSeq
    assert(canon(replayed) == canon(next), "diff-then-apply must reproduce the next snapshot")
  }

  test("mergeInto: update wins, delete removes, insert lands, flagged-absent is a no-op") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val source = Seq(
      (1L, "a2", false), // matched update
      (2L, "b", true),   // matched delete
      (4L, "d", false),  // unmatched insert
      (5L, "e", true)    // unmatched + delete flag → suppressed insert, no row
    ).toDF("k", "v", "del")
    val out = ChangeOps.mergeInto(target, source, "k", col("del"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 3L -> "c", 4L -> "d"), s"got $out")
  }

  test("mergeInto: NULL deleteCond means keep — update still lands, insert carries payload") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // del column nullable: null on the matched update AND on the unmatched
    // insert — both must behave exactly like del=false (the presence flag,
    // not __del nullability, decides whose payload wins)
    val source = Seq(
      (1L, "a2", None: Option[Boolean]),
      (3L, "c", None: Option[Boolean]),
      (2L, "b", Some(true))
    ).toDF("k", "v", "del")
    val out = ChangeOps.mergeInto(target, source, "k", col("del"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a2", 3L -> "c"), s"got $out")
  }

  test("mergeInto: NULL keys merge null-safely (one row out, source payload wins)") {
    val target = Seq((Some(1L), "a"), (None: Option[Long], "x")).toDF("k", "v")
    val source = Seq((None: Option[Long], "x2", false)).toDF("k", "v", "del")
    val out = ChangeOps.mergeInto(target, source, "k", col("del"))
      .collect().map(r => (if (r.isNullAt(0)) -99L else r.getLong(0)) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", -99L -> "x2"), s"got $out")
  }

  test("mergeConflicts flags duplicate-key source rows; a clean source reports none") {
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "e"), (3L, "f"))
      .toDF("k", "v")
    val got = ChangeOps.mergeConflicts(dup, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 3L -> 3L), s"got $got")
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(ChangeOps.mergeConflicts(clean, "k").count() == 0)
  }

  test("mergeInto rejects a source missing payload columns") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, true)).toDF("k", "del")
    intercept[IllegalArgumentException] {
      ChangeOps.mergeInto(target, bad, "k", col("del"))
    }
  }

  test("maintainAggView equals full recompute; zero-count groups drop; null values count") {
    // base rows per (g): g1 ×3 (v 10,20,30), g2 ×2 (v 5, null), g3 ×1 (v 7)
    val baseRows = Seq(
      ("g1", Some(10L)), ("g1", Some(20L)), ("g1", Some(30L)),
      ("g2", Some(5L)), ("g2", None), ("g3", Some(7L)))
    val base = baseRows.toDF("g", "v")
      .groupBy($"g")
      .agg(count(lit(1)).as("cnt"), sum(coalesce($"v", lit(0L))).as("sum_v"))
    // delta: insert g1 +40 and new group g4 +1; retract one g1 row (v 20),
    // the g2 null row (must subtract 0, count −1), and ALL of g3
    val delta = Seq(
      ("g1", Some(40L), 1L), ("g4", Some(1L), 1L),
      ("g1", Some(20L), -1L), ("g2", None: Option[Long], -1L), ("g3", Some(7L), -1L))
      .toDF("g", "v", "w")
    val out = ChangeOps.maintainAggView(base, delta, Seq("g"), $"w", $"v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // full recompute of the net row set
    assert(out == Map(
      "g1" -> ((3L, 80L)),  // 10+30+40
      "g2" -> ((1L, 5L)),   // null row retracted: count falls, sum unchanged
      "g4" -> ((1L, 1L))    // g3 fully retracted → absent, as a recompute would have it
    ), s"got $out")
  }

  test("missing payload columns in changes and work-column collisions are rejected") {
    val noAmt = Seq((1L, "z", "U", 1L)).toDF("id", "name", "op", "seq")
    intercept[IllegalArgumentException] {
      ChangeOps.applyChangelog(base, noAmt, Seq("id"), "op", "seq")
    }
    val clash = Seq((1L, "z", 0.0, 1)).toDF("id", "name", "amt", "__seq")
    intercept[IllegalArgumentException] {
      ChangeOps.applyChangelog(clash, clash.withColumn("op", lit("U")).withColumn("seq", lit(1L)),
        Seq("id"), "op", "seq")
    }
  }
}
