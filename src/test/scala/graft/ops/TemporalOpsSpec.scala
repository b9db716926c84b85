package graft.ops

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** As-of and range joins (TemporalOps). */
class TemporalOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("asofJoin picks the latest right row at-or-before each left row, nulls when none") {
    val left = Seq(
      (1L, 10L, ts(100)),
      (2L, 10L, ts(205)),
      (3L, 10L, ts(50)), // before every right row
      (4L, 20L, ts(100)) // key with no right rows at all
    ).toDF("event_id", "k", "lts")
    val right = Seq(
      (10L, ts(100), 1.0, 7L), // same instant as left #1 → matches (>= semantics)
      (10L, ts(200), 2.0, 8L),
      (30L, ts(90), 9.0, 9L) // other key, never visible
    ).toDF("k", "rts", "value", "tie")

    val out = TemporalOps
      .asofJoin(left, right, "k", "lts", "rts", Seq("value"), "tie")
      .select($"event_id", unix_micros($"asof_ts"), $"asof_value")
    assert(
      rows(out) == Seq(
        Seq(1L, 100000000L, 1.0),
        Seq(2L, 200000000L, 2.0),
        Seq(3L, null, null),
        Seq(4L, null, null)
      )
    )
  }

  test("asofJoinNearest picks the closer side, ties go backward, one-sided and no-match are sane") {
    val left = Seq(
      (1L, 10L, ts(100)), // b at 90 (d=10) vs f at 105 (d=5) → F
      (2L, 10L, ts(95)),  // b at 90 (d=5) vs f at 105 (d=10) → B
      (3L, 10L, ts(98)),  // equidistant not possible here; use key 11 below
      (4L, 10L, ts(90)),  // same instant as a right row → d=0 → B
      (5L, 11L, ts(100)), // b at 95 (d=5) vs f at 105 (d=5) → tie → B
      (6L, 12L, ts(50)),  // only a forward row exists → F
      (7L, 13L, ts(50))   // key with no right rows → null, dir null
    ).toDF("event_id", "k", "lts")
    val right = Seq(
      (10L, ts(90), 1.0, 1L),
      (10L, ts(105), 2.0, 2L),
      (11L, ts(95), 3.0, 3L),
      (11L, ts(105), 4.0, 4L),
      (12L, ts(60), 5.0, 5L)
    ).toDF("k", "rts", "value", "tie")
    val out = TemporalOps
      .asofJoinNearest(left, right, "k", "lts", "rts", Seq("value"), "tie")
      .select($"event_id", unix_micros($"asof_ts"), $"asof_dir", $"asof_value")
    assert(
      rows(out) == Seq(
        Seq(1L, 105000000L, "F", 2.0),
        Seq(2L, 90000000L, "B", 1.0),
        Seq(3L, 105000000L, "F", 2.0), // d back 8, d fwd 7 → F
        Seq(4L, 90000000L, "B", 1.0),
        Seq(5L, 95000000L, "B", 3.0), // equidistant → backward wins
        Seq(6L, 60000000L, "F", 5.0),
        Seq(7L, null, null, null)
      ), rows(out).toString)
  }

  test("asofJoinNearest same-instant right ties resolve to the greatest tie both directions") {
    val left = Seq((1L, 10L, ts(100))).toDF("event_id", "k", "lts")
    val right = Seq(
      (10L, ts(100), 1.0, 1L),
      (10L, ts(100), 2.0, 9L) // same instant, greater tie → must win
    ).toDF("k", "rts", "value", "tie")
    val out = TemporalOps
      .asofJoinNearest(left, right, "k", "lts", "rts", Seq("value"), "tie")
      .select($"asof_dir", $"asof_value")
    assert(rows(out) == Seq(Seq("B", 2.0)))
  }

  test("asofJoinNearest shuffles once: the two window sorts share one exchange") {
    val left = Seq((1L, 10L, ts(100))).toDF("event_id", "k", "lts")
    val right = Seq((10L, ts(90), 1.0, 1L)).toDF("k", "rts", "value", "tie")
    val plan = TemporalOps
      .asofJoinNearest(left, right, "k", "lts", "rts", Seq("value"), "tie")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one key shuffle, got $exchanges:\n$plan")
  }

  test("growthAccounting: new/retained/resurrected classes, churn right-censored") {
    def day(d: Int) = ts(86400L * d)
    val ev = Seq(
      (1L, day(1)), (1L, day(2)), (1L, day(10)), // new, retained, resurrected (gap 8 > 7)
      (2L, day(1))                               // new; churns at day 1 (no return)
    ).toDF("u", "t")
    val out = TemporalOps.growthAccounting(ev, $"u", $"t", gapDays = 7)
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out("1970-01-02") == ((2L, 0L, 0L, 1L)), s"day1: ${out}")  // both new; 2 churns
    assert(out("1970-01-03") == ((0L, 1L, 0L, 1L)), s"day2: ${out}")  // 1 retained; 1's streak ends
    // day 10 = the max day: resurrection counts, churn is CENSORED
    assert(out("1970-01-11") == ((0L, 0L, 1L, 0L)), s"day10: ${out}")
  }

  test("cumulativeUniques: first-seen collapse, daily actives, running total") {
    def day(d: Int, sec: Long = 0L) = ts(86400L * d + sec)
    val ev = Seq(
      (1L, day(0)), (1L, day(1)), (2L, day(1)), (3L, day(2)), (1L, day(2, 60))
    ).toDF("u", "t")
    val out = TemporalOps.cumulativeUniques(ev, $"u", $"t")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
      .toSeq
    assert(out == Seq(
      ("1970-01-01", 1L, 1L, 1L),
      ("1970-01-02", 2L, 1L, 2L), // u1 returns (active, not new), u2 is new
      ("1970-01-03", 2L, 1L, 3L)  // u1 + u3; only u3 is new
    ), s"got $out")
  }

  test("seasonalBaseline: dow-mean baseline, residuals, engine-neutral mod-7 dow, null values") {
    // 1970-01-01 is a Thursday → dow 0 under epoch_days mod 7
    def day(d: Int, sec: Long = 0L) = ts(86400L * d + sec)
    val ev = Seq(
      ("k", day(0), Some(4L)), ("k", day(0), Some(6L)),   // Thu week 1: total 10
      ("k", day(7), Some(20L)),                            // Thu week 2: total 20
      ("k", day(1), Some(7L)), ("k", day(1), None)         // Fri: null adds 0 → total 7
    ).toDF("k", "t", "v")
    val out = TemporalOps.seasonalBaseline(ev, $"k", $"t", $"v")
      .collect()
      .map(r => (r.getDate(1).toString, r.getInt(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
      .toSeq
    assert(out == Seq(
      ("1970-01-01", 0, 10L, 15.0, -5.0),
      ("1970-01-02", 1, 7L, 7.0, 0.0),
      ("1970-01-08", 0, 20L, 15.0, 5.0)
    ), s"got $out")
  }

  test("resampleLocf fills gaps with the last observation and marks observed buckets") {
    val ev = Seq(
      (1L, 10L, ts(86400 * 10 + 5), 1.5), // day 10
      (2L, 10L, ts(86400 * 10 + 9), 2.5), // day 10, later → wins the bucket
      (3L, 10L, ts(86400 * 13), 7.0), // day 13 → days 11,12 are gaps
      (4L, 20L, ts(86400 * 11), 4.0) // other key, single bucket
    ).toDF("event_id", "k", "t", "v")
    val out = TemporalOps.resampleLocf(ev, "k", "t", "event_id", "v", stepSec = 86400L)
    assert(
      rows(out) == Seq(
        Seq(10L, 10L, 2.5, true),
        Seq(10L, 11L, 2.5, false),
        Seq(10L, 12L, 2.5, false),
        Seq(10L, 13L, 7.0, true),
        Seq(20L, 11L, 4.0, true)
      ))
  }

  test("resampleLocf breaks same-instant ties by the tie column, micros-exact") {
    val ev = Seq(
      (5L, 1L, ts(86400), 9.0), // same microsecond as below
      (6L, 1L, ts(86400), 3.0) // greater tie → wins
    ).toDF("event_id", "k", "t", "v")
    val out = TemporalOps.resampleLocf(ev, "k", "t", "event_id", "v", stepSec = 86400L)
    assert(rows(out) == Seq(Seq(1L, 1L, 3.0, true)))
  }

  test("asofJoin resolves same-instant right ties to the greatest tie value") {
    val left = Seq((1L, 10L, ts(100))).toDF("event_id", "k", "lts")
    val right = Seq(
      (10L, ts(100), 1.0, 7L),
      (10L, ts(100), 2.0, 9L),
      (10L, ts(100), 3.0, 8L)
    ).toDF("k", "rts", "value", "tie")
    val out = TemporalOps.asofJoin(left, right, "k", "lts", "rts", Seq("value"), "tie")
    assert(rows(out.select($"asof_value")) == Seq(Seq(2.0)))
  }

  test("rangeJoin equals the naive theta join, including across bucket boundaries") {
    // tolerance 60 s → bucket width 60 s; pairs straddling a bucket edge
    // (59 vs 61, 100 vs 159) must still match, and pairs just past the
    // tolerance (100 vs 161 for key 20) must not
    val left = Seq((1L, 10L, ts(59)), (2L, 10L, ts(100)), (3L, 20L, ts(100)))
      .toDF("lid", "k", "lts")
    val right = Seq(
      (10L, ts(61), 101L),
      (10L, ts(159), 102L),
      (10L, ts(0), 103L),
      (20L, ts(161), 104L)
    ).toDF("k", "rts", "rid")

    val got = TemporalOps
      .rangeJoin(left, right, "k", "lts", "rts", tolSec = 60)
      .select($"lid", $"rid")
    val naive = left
      .join(right, Seq("k"))
      .filter(abs(unix_micros($"lts") - unix_micros($"rts")) <= 60000000L)
      .select($"lid", $"rid")
    assert(rows(got) == rows(naive))
    // sanity on content, not just self-consistency
    assert(rows(got) == Seq(Seq(1L, 101L), Seq(1L, 103L), Seq(2L, 101L), Seq(2L, 102L)))
  }

  test("rollingZOutliers flags a planted spike, keeps the flat tail unflagged, all-Long") {
    // five flat values (100) then a spike (2000), window 6, k=2. At the
    // spike row S=2500, Q=4 050 000: (6·2000−2500)² = 9.025e7 exceeds
    // k²·(6Q−S²) = 7.22e7 → flags. (A lone spike inflates the window's own
    // σ — with n=6 the largest attainable z is √5 ≈ 2.24, so k=2 is the
    // right sensitivity for this window size and k=3 could never fire.)
    val df = (1 to 5).map(i => (10L, ts(i), i.toLong, 100L)) :+ ((10L, ts(6), 6L, 2000L))
    val out = TemporalOps
      .rollingZOutliers(df.toDF("k", "t", "id", "v"), "k", "t", "id", "v", nRows = 6, k = 2)
      .select($"id", $"flagged")
    val flags = out.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(6L), "the planted spike must flag")
    assert((1L to 5L).forall(!flags(_)), s"flat prefix must not flag: $flags")
  }

  test("rollingSum sums the trailing n rows per key in order") {
    val df = Seq(
      (10L, ts(1), 1L, 1.0),
      (10L, ts(2), 2L, 2.0),
      (10L, ts(3), 3L, 4.0),
      (20L, ts(1), 4L, 8.0)
    ).toDF("k", "t", "id", "value")
    val out = TemporalOps
      .rollingSum(df, "k", "t", "id", "value", nRows = 2)
      .select($"id", $"roll_sum", $"n_window")
    assert(
      rows(out) == Seq(
        Seq(1L, 1.0, 1L),
        Seq(2L, 3.0, 2L),
        Seq(3L, 6.0, 2L),
        Seq(4L, 8.0, 1L)
      )
    )
  }

  test("ewmaSmooth: closed forms hold — constants pass through, recency dominates, nulls drop") {
    // α=1/4, N=8 → lag weights 16384,12288,… ; partial windows renormalize
    val df = Seq(
      (1L, ts(1), 1L, Option(10.0)),
      (1L, ts(2), 2L, Option(20.0)),
      (2L, ts(1), 3L, Option(7.0)),
      (2L, ts(2), 4L, Option(7.0)),
      (2L, ts(3), 5L, Option(7.0)),
      (3L, ts(1), 6L, Option(5.0)),
      (3L, ts(2), 7L, Option.empty[Double]),
      (3L, ts(3), 8L, Option(9.0))
    ).toDF("k", "t", "id", "value")
    val out = TemporalOps.ewmaSmooth(df, "k", "t", "id", "value", nRows = 8)
      .select($"id", $"n_window", $"ewma")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // single-observation window: the value itself
    assert(out(1L) == ((1, 10.0)))
    // (1000·12288 + 2000·16384) / ((12288+16384)·100) = 15.714286
    assert(out(2L) == ((2, 15.714286)), s"got ${out(2L)}")
    // a constant series is a fixpoint of any normalized weighting
    assert(out(3L) == ((1, 7.0)) && out(4L) == ((2, 7.0)) && out(5L) == ((3, 7.0)))
    // null rows vanish from output AND windows: id=8's window is (5, 9)
    assert(!out.contains(7L), "null-valued row must not be scored")
    assert(out(8L) == ((2, math.rint((500 * 12288 + 900 * 16384).toDouble / 28672 / 100 * 1e6) / 1e6)),
      s"got ${out(8L)}")
    // recency check: the newest value carries the largest weight, so the
    // EWMA of (10, 20) sits above their plain mean
    assert(out(2L)._2 > 15.0)
  }

  test("ewmaSmooth matches a plain-Scala model on random series with ts collisions") {
    val rng = new scala.util.Random(17)
    val rows = (1 to 400).map { i =>
      (rng.nextInt(5).toLong, ts(rng.nextInt(40).toLong), i.toLong,
        math.rint(rng.nextDouble() * 10000) / 100)
    }
    val out = TemporalOps
      .ewmaSmooth(rows.toDF("k", "t", "id", "value"), "k", "t", "id", "value", nRows = 8)
      .collect()
      .map(r => r.getLong(2) -> ((r.getInt(4), r.getDouble(5))))
      .toMap
    // model: the same integer weight algebra folded in plain Scala
    val weights = (0 until 8).map(j => math.pow(3, j).toLong * math.pow(4, 7 - j).toLong)
    for ((k, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(r => (r._2.getTime, r._3))
      for ((row, idx) <- ordered.zipWithIndex) {
        val window = ordered.slice(math.max(0, idx - 7), idx + 1)
        val qs = window.map(r => math.floor(r._4 * 100 + 0.5).toLong)
        val num = qs.reverse.zipWithIndex.map { case (q, j) => q * weights(j) }.sum
        val den = qs.indices.map(weights(_)).sum * 100L
        // Spark's Round: IEEE division first, then HALF_UP at 6 dp
        val expect = java.math.BigDecimal.valueOf(num.toDouble / den.toDouble)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        assert(out(row._3) == ((window.size, expect)),
          s"key $k id ${row._3}: got ${out(row._3)}, want (${window.size}, $expect)")
      }
    }
  }

  test("asofJoin matches a plain-Scala model on random data with heavy ts collisions") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // ts drawn from 0..30 over 6 keys → many same-instant collisions
      val left = (0 until 80).map(i => (i.toLong, rnd.nextInt(6).toLong, ts(rnd.nextInt(31).toLong)))
      val right = (0 until 60).map(i =>
        (rnd.nextInt(6).toLong, ts(rnd.nextInt(31).toLong), rnd.nextInt(1000).toDouble, i.toLong))
      val lDf = left.toDF("event_id", "k", "lts")
      val rDf = right.toDF("k", "rts", "value", "tie")

      val got = TemporalOps
        .asofJoin(lDf, rDf, "k", "lts", "rts", Seq("value"), "tie")
        .select($"event_id", unix_micros($"asof_ts"), $"asof_value")
      val expected = left.map { case (id, k, lts) =>
        val cands = right.filter(r => r._1 == k && !r._2.after(lts))
        if (cands.isEmpty) Seq[Any](id, null, null)
        else {
          val best = cands.maxBy(r => (r._2.getTime, r._4))
          Seq[Any](id, best._2.getTime * 1000L, best._3)
        }
      }
      assert(rows(got) == expected.sortBy(_.mkString("|")), s"seed $seed")
    }
  }

  test("rangeJoin matches a plain-Scala model on random data") {
    for (seed <- Seq(7, 8)) {
      val rnd = new scala.util.Random(seed)
      val left = (0 until 60).map(i => (i.toLong, rnd.nextInt(4).toLong, ts(rnd.nextInt(100).toLong)))
      val right = (0 until 60).map(i => (rnd.nextInt(4).toLong, ts(rnd.nextInt(100).toLong), i.toLong))
      val got = TemporalOps
        .rangeJoin(left.toDF("lid", "k", "lts"), right.toDF("k", "rts", "rid"), "k", "lts", "rts", tolSec = 7)
        .select($"lid", $"rid")
      val expected = for {
        (lid, lk, lt) <- left
        (rk, rt, rid) <- right
        if lk == rk && math.abs(lt.getTime - rt.getTime) <= 7000L
      } yield Seq[Any](lid, rid)
      assert(rows(got) == expected.sortBy(_.mkString("|")), s"seed $seed")
    }
  }

  test("cohortRetention buckets by first-seen Monday week and counts distinct returners") {
    // 2024-01-01 is a Monday. user 1 first seen week 0, returns weeks 0
    // (twice — distinct!) and 2; user 2 first seen week 1, never returns;
    // user 3 first seen week 0, returns week 2
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 10:00:00")), // same week 0
      (1L, java.sql.Timestamp.valueOf("2024-01-16 10:00:00")), // week 2
      (2L, java.sql.Timestamp.valueOf("2024-01-09 10:00:00")), // cohort wk 1
      (3L, java.sql.Timestamp.valueOf("2024-01-05 10:00:00")),
      (3L, java.sql.Timestamp.valueOf("2024-01-18 10:00:00"))  // week 2
    ).toDF("user_id", "ts")
    val out = TemporalOps.cohortRetention(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, // users 1 and 3, duplicates collapsed
      ("2024-01-01", 2L) -> 2L, // both return in week 2
      ("2024-01-08", 0L) -> 1L  // user 2's own cohort week
    ))
    // no per-user window: the plan must broadcast the cohort side
    val plan = TemporalOps.cohortRetention(ev, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("transitionMatrix counts consecutive per-user pairs, never across users") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: view -> click -> view  => (view,click), (click,view)
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "view"),
      // user 2: click alone => no pairs; user boundary must not pair with user 1
      (2L, ts("2024-01-01 10:03:00"), 4L, "click"),
      // user 3: same-ts tie broken by event_id: view(5) -> click(6)
      (3L, ts("2024-01-01 11:00:00"), 5L, "view"),
      (3L, ts("2024-01-01 11:00:00"), 6L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = TemporalOps.transitionMatrix(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("view", "click") -> 2L, // user 1 and user 3
      ("click", "view") -> 1L
    ))
  }

  test("rangeJoin emits each qualifying pair exactly once") {
    // identical timestamps land in the same bucket; the ±1 probes must not duplicate the pair
    val left = Seq((1L, 10L, ts(100))).toDF("lid", "k", "lts")
    val right = Seq((10L, ts(100), 7L)).toDF("k", "rts", "rid")
    val out = TemporalOps.rangeJoin(left, right, "k", "lts", "rts", tolSec = 60)
    assert(out.count() == 1L)
  }

  test("lookbackJoin equals the naive theta join, boundaries inclusive both ends") {
    // horizon 60 s: rts ∈ [lts-60, lts]. Exercise the exact edges (both
    // inclusive), the just-outside rows (61 s back, 1 s forward), and a
    // pair straddling a bucket boundary (anchor at 100 reaches back into
    // bucket 0 for rts=59)
    val left = Seq((1L, 10L, ts(100)), (2L, 10L, ts(160)), (3L, 20L, ts(100)))
      .toDF("lid", "k", "lts")
    val right = Seq(
      (10L, ts(40), 101L), // 60 s before anchor 1 → in (inclusive lower)
      (10L, ts(39), 102L), // 61 s before anchor 1 → out
      (10L, ts(100), 103L), // same instant as anchor 1 → in (inclusive upper)
      (10L, ts(101), 104L), // 1 s AFTER anchor 1 → out for it, in for anchor 2
      (10L, ts(59), 105L), // bucket 0, reached by anchor 1's bucket-1 probe
      (20L, ts(161), 106L) // after its anchor → out
    ).toDF("k", "rts", "rid")

    val got = TemporalOps
      .lookbackJoin(left, right, "k", "lts", "rts", horizonSec = 60)
      .select($"lid", $"rid")
    val naive = left
      .join(right, Seq("k"))
      .filter(
        unix_micros($"rts") <= unix_micros($"lts") &&
          unix_micros($"rts") >= unix_micros($"lts") - 60000000L)
      .select($"lid", $"rid")
    assert(rows(got) == rows(naive))
    assert(
      rows(got) == Seq(
        Seq(1L, 101L), Seq(1L, 103L), Seq(1L, 105L),
        Seq(2L, 103L), Seq(2L, 104L)))
  }

  test("lookbackJoin bounds heavy-key fanout by the horizon, not by lifetime history") {
    // the attribution skew case: ONE bot-scale user with 1 000 clicks at
    // 60 s spacing and 4 purchases. Unbounded attribution would emit
    // Σ clicks-before-purchase ≈ 3 400 pairs; a 5-minute lookback emits
    // exactly 6 per purchase (minutes 0..5 inclusive) — output scales
    // with the horizon while the history grows without bound
    val clicks = (0 until 1000).map(i => (1L, ts(60L * i), i.toLong))
    val purchases = Seq(
      (1L, ts(60L * 500), 9500L),
      (1L, ts(60L * 700), 9700L),
      (1L, ts(60L * 900), 9900L),
      (1L, ts(60L * 999), 9999L))
    val out = TemporalOps.lookbackJoin(
      purchases.toDF("k", "lts", "pid"),
      clicks.toDF("k", "rts", "cid"),
      "k", "lts", "rts", horizonSec = 300)
    assert(out.count() == 4L * 6L)
    // and each purchase credits exactly the 6 clicks in its own window
    val per = out.groupBy($"pid").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(per == Map(9500L -> 6L, 9700L -> 6L, 9900L -> 6L, 9999L -> 6L))
  }
}
