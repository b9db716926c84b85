package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** KMV distinct sketch (SURVEY.md §7.5 extension). */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  test("degenerate domain (fewer than k hashes) reports the exact count") {
    val df = Seq("a", "b", "c", "a", "b").toDF("t")
    val r = Sketches.kmvDistinct(df, $"t", k = 16).collect().head
    assert(r.getAs[Long]("k") == 16L)
    assert(r.getAs[Long]("k_actual") == 3L)
    assert(r.getAs[Long]("est_distinct") == 3L)
  }

  test("estimation path: |est/exact - 1| within the KMV error bound") {
    // the EXACT distinct count is computed here, in the spec — the operator
    // itself is single-pass by contract (the full distinct shuffle it
    // avoids is the audit's job, not the hot path's)
    val df = spark.range(0, 2000).select(concat(lit("item"), $"id").as("t"))
    val r = Sketches.kmvDistinct(df, $"t", k = 64).collect().head
    assert(r.getAs[Long]("k_actual") == 64L)
    val est = r.getAs[Long]("est_distinct")
    val exact = df.distinct().count()
    assert(exact == 2000L)
    // KMV relative error ~ 1/sqrt(k-1) ≈ 12.6% at k=64; assert within 4 s.d.
    val bound = 4.0 / math.sqrt(63.0)
    assert(
      math.abs(est.toDouble / exact - 1.0) <= bound,
      s"estimate $est vs exact $exact exceeds ±${(bound * 100).round}%")
    // the sketch is a pure function of the domain: same input, same output
    val again = Sketches.kmvDistinct(df, $"t", k = 64).collect().head
    assert(again.getAs[Long]("est_distinct") == est)
  }

  test("kmvSetOps: identical sets give Jaccard 1, disjoint sets give overlap 0") {
    val a = spark.range(0, 500).select(concat(lit("i"), $"id").as("t"))
    val same = Sketches.kmvSetOps(a, $"t", a, $"t", k = 64).collect().head
    assert(same.getAs[Long]("overlap") == same.getAs[Long]("k_actual"))
    assert(same.getAs[Long]("jaccard_bp") == 10000L)
    assert(same.getAs[Long]("est_intersect") == same.getAs[Long]("est_union"))
    val b = spark.range(500, 1000).select(concat(lit("i"), $"id").as("t"))
    val disj = Sketches.kmvSetOps(a, $"t", b, $"t", k = 64).collect().head
    assert(disj.getAs[Long]("overlap") == 0L)
    assert(disj.getAs[Long]("est_intersect") == 0L)
  }

  test("kmvSetOps degrades to EXACT set algebra when the union fits in k") {
    val a = spark.range(0, 30).select(concat(lit("i"), $"id").as("t"))
    val b = spark.range(20, 50).select(concat(lit("i"), $"id").as("t"))
    val r = Sketches.kmvSetOps(a, $"t", b, $"t", k = 64).collect().head
    assert(r.getAs[Long]("k_actual") == 50L, "union of 50 hashes fits in k=64")
    assert(r.getAs[Long]("est_union") == 50L)
    assert(r.getAs[Long]("overlap") == 10L)
    assert(r.getAs[Long]("est_intersect") == 10L)
    assert(r.getAs[Long]("jaccard_bp") == 2000L)
  }

  test("kmvSetOps estimation path: intersection within the composed KMV bound") {
    // |A| = |B| = 1500, |A ∩ B| = 1000, |A ∪ B| = 2000
    val a = spark.range(0, 1500).select(concat(lit("i"), $"id").as("t"))
    val b = spark.range(500, 2000).select(concat(lit("i"), $"id").as("t"))
    val r = Sketches.kmvSetOps(a, $"t", b, $"t", k = 64).collect().head
    val estU = r.getAs[Long]("est_union")
    val estI = r.getAs[Long]("est_intersect")
    // union: plain KMV bound; intersection: ratio-estimator noise on top —
    // assert loose sanity envelopes, not distributional luck
    assert(math.abs(estU / 2000.0 - 1.0) <= 0.5, s"union estimate $estU vs 2000")
    assert(estI > 200 && estI < 2000, s"intersection estimate $estI vs 1000")
    // deterministic: same inputs, same sketch, same estimates
    val again = Sketches.kmvSetOps(a, $"t", b, $"t", k = 64).collect().head
    assert(again.getAs[Long]("est_intersect") == estI)
  }

  test("kmvDistinct plan has a single aggregation path (no exact-count companion)") {
    val df = spark.range(0, 100).select(concat(lit("x"), $"id").as("t"))
    val plan = Sketches.kmvDistinct(df, $"t", k = 16).queryExecution.optimizedPlan
    // a hidden exact count_distinct would show up as a join/cross of two
    // aggregation branches; the single-pass contract means no join at all
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"unexpected join in KMV plan:\n$plan")
  }

  test("count-min estimates are one-sided (>= exact) and exact without collisions") {
    import org.apache.spark.sql.functions.col
    // 50 distinct items with skewed counts; width 1024 >> 50 makes
    // collisions across all 4 rows effectively impossible, so est == exact
    val items = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"tok$i"))
    val df = items.toDF("t")
    val cells = Sketches.countMinCells(df, col("t"), depth = 4, width = 1024)
    val probes = Seq("tok0", "tok49", "absent").toDF("p")
    val est = Sketches
      .countMinEstimate(cells, probes, col("p"), depth = 4, width = 1024)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(est("tok0") == 1L)
    assert(est("tok49") == 50L)
    assert(est("absent") == 0L)
    // tight width forces collisions: estimates stay one-sided
    val tight = Sketches.countMinCells(df, col("t"), depth = 2, width = 4)
    val e2 = Sketches
      .countMinEstimate(tight, probes, col("p"), depth = 2, width = 4)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(e2("tok0") >= 1L && e2("tok49") >= 50L)
  }

  test("count-min cells aggregate identically over a stream (state bounded by depth x width)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // streaming aggregation in complete mode needs NO watermark here
    // precisely because the sketch's group-by domain (j, cell) is bounded
    // by depth x width — the whole point of sketching frequency state
    val items = (0 until 40).flatMap(i => Seq.fill(i % 5 + 1)(s"w$i"))
    val mem = MemoryStream[String]
    val cells = Sketches.countMinCellsStream(mem.toDF().toDF("t"), col("t"), depth = 3, width = 64)
    mem.addData(items.take(60): _*)
    mem.addData(items.drop(60): _*)
    val q = cells.writeStream
      .format("memory").queryName("cms_stream").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Sketches.countMinCells(items.toDF("t"), col("t"), depth = 3, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("approx_count_distinct (the built-in 100 TB path) and kmvDistinct both land within their error bounds") {
    // 5000 true distincts observed 4x each
    val df = spark.range(0, 20000).select(concat(lit("item_"), $"id" % 5000).as("x"))
    val exact = df.select(count_distinct($"x")).collect()(0).getLong(0)
    assert(exact == 5000L)
    // HyperLogLog++ at rsd=0.02: gate at 3 standard deviations
    val approx = df.select(approx_count_distinct($"x", 0.02)).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx_count_distinct $approx vs exact $exact")
    // KMV at k=1024: relative error ~1/sqrt(k) ≈ 3.1%; gate at 3 sigma
    val kmv = Sketches.kmvDistinct(df, $"x", k = 1024).collect().head
    val est = kmv.getAs[Long]("est_distinct")
    assert(math.abs(est - exact).toDouble / exact < 0.1, s"kmv $est vs exact $exact")
  }

  test("bloom filter: no false negatives, and any errors are false positives only") {
    val build = spark.range(0, 500).select(concat(lit("k"), $"id").as("key"))
    val bits = Sketches.bloomBits(build, $"key", m = 8192L, k = 3)
    // probe half members, half non-members
    val probes = spark
      .range(250, 750)
      .select(concat(lit("k"), $"id").as("key"), ($"id" < 500).as("is_member"))
    val got = Sketches
      .bloomProbe(bits, probes, $"key", m = 8192L, k = 3)
      .join(probes.select($"key".as("item"), $"is_member"), Seq("item"))
      .collect()
    assert(got.length == 500)
    got.foreach { r =>
      if (r.getAs[Boolean]("is_member"))
        assert(r.getAs[Boolean]("maybe"), s"false negative on ${r.getAs[String]("item")}")
    }
    // at 500·3 bits in 8192 (fill ≈ 0.17) the fp rate is ~0.4% — the
    // non-member half must not be all-maybe (that would mean a saturated
    // or broken filter)
    val fp = got.count(r => !r.getAs[Boolean]("is_member") && r.getAs[Boolean]("maybe"))
    assert(fp < 25, s"implausible false-positive count $fp / 250")
  }

  test("bloom filter state is bounded by m and duplicates never change it") {
    val once = spark.range(0, 200).select(concat(lit("v"), $"id").as("key"))
    val thrice = once.union(once).union(once)
    val a = Sketches.bloomBits(once, $"key", m = 1024L, k = 3).collect().map(_.getLong(0)).sorted
    val b = Sketches.bloomBits(thrice, $"key", m = 1024L, k = 3).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "duplicate rows changed the bit set")
    assert(a.length <= 600, s"more set bits (${a.length}) than k·distinct")
    assert(a.forall(p => p >= 0 && p < 1024), "position out of [0, m)")
  }

  test("bloomProbe broadcasts the bit set (no shuffle of the probe stream)") {
    val build = spark.range(0, 100).select(concat(lit("k"), $"id").as("key"))
    val bits = Sketches.bloomBits(build, $"key", m = 2048L, k = 3)
    val probes = spark.range(0, 100).select(concat(lit("k"), $"id").as("key"))
    val plan = Sketches
      .bloomProbe(bits, probes, $"key", m = 2048L, k = 3)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe join:\n$plan")
  }

  test("hll registers: bounded state, valid rho range, estimate within tolerance") {
    val p = 8
    val m = 1 << p
    val n = 20000
    val df = spark.range(0, n).select(concat(lit("item"), $"id").as("key"))
    val regs = Sketches.hllRegisters(df, $"key", p).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(regs.size <= m, s"more registers (${regs.size}) than 2^p")
    assert(regs.keys.forall(r => r >= 0 && r < m), "register index out of range")
    // rho ∈ [1, restBits+1]
    assert(regs.values.forall(v => v >= 1 && v <= 25), "rho out of [1, 25]")
    // the float half stays driver-side: standard HLL estimate from the
    // register table (no small/large-range correction needed at n=20k, m=256)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val zeros = m - regs.size
    val invSum = (0 until m).map(r => math.pow(2.0, -regs.getOrElse(r.toLong, 0).toDouble)).sum
    val est = alpha * m * m / invSum
    assert(zeros == 0, s"at 20k distinct into 256 registers no register stays empty, got $zeros")
    // σ ≈ 1.04/√256 = 6.5%; 3σ ≈ 20%
    assert(math.abs(est - n) / n < 0.2, s"estimate $est vs exact $n")
  }

  test("hll registers merge by element-wise max (distributed rollup shape)") {
    val a = spark.range(0, 5000).select(concat(lit("x"), $"id").as("key"))
    val b = spark.range(3000, 9000).select(concat(lit("x"), $"id").as("key"))
    val merged = Sketches.hllRegisters(a, $"key", 8)
      .unionByName(Sketches.hllRegisters(b, $"key", 8))
      .groupBy($"register").agg(max($"max_rho").as("max_rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = Sketches.hllRegisters(a.unionByName(b), $"key", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == whole, "max-merge of part sketches != sketch of the union")
  }

  test("duplicates never change the sketch") {
    val base = spark.range(0, 500).select(concat(lit("w"), $"id").as("t"))
    val dup = base.union(base).union(base)
    val a = Sketches.kmvDistinct(base, $"t", k = 32).collect().head
    val b = Sketches.kmvDistinct(dup, $"t", k = 32).collect().head
    assert(a.getAs[Long]("est_distinct") == b.getAs[Long]("est_distinct"))
    assert(a.getAs[Long]("kth_min") == b.getAs[Long]("kth_min"))
  }

  // ---- KLL-style quantile sketch ----------------------------------------

  test("kllSketch is a pure function of the multiset: merge equals sketch-of-union, bit-for-bit") {
    val a = spark.range(0, 4000).select(($"id" * 37 % 1000).cast("double").as("v"), $"id".as("k"))
    val b = spark.range(4000, 9000).select(($"id" * 91 % 1000).cast("double").as("v"), $"id".as("k"))
    val whole = Sketches.kllSketch(a.unionByName(b), $"v", $"k", level = 3)
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val merged = Sketches.kllMerge(
        Sketches.kllSketch(a, $"v", $"k", level = 3), 3,
        Sketches.kllSketch(b, $"v", $"k", level = 3), 3)
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(merged == whole, "equal-level merge must equal the union's sketch exactly")
    // mixed levels: the coarser gate re-filters the finer sketch — still
    // exact equality with the union sketched at the coarser level
    val mixed = Sketches.kllMerge(
        Sketches.kllSketch(a, $"v", $"k", level = 2), 2,
        Sketches.kllSketch(b, $"v", $"k", level = 4), 4)
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val whole4 = Sketches.kllSketch(a.unionByName(b), $"v", $"k", level = 4)
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(mixed == whole4, "mixed-level merge must equal the union's sketch at the coarser level")
  }

  test("kllSketch at level 0 keeps every row and the quantiles become exact") {
    // gate mod 2^0 == 0 always passes: the sketch IS the data at weight 1,
    // so the rank-selection must return the true ceil(q·n)-th value
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_extendedprice").as("v"),
        concat(col("l_orderkey"), lit("_"), col("l_linenumber")).as("k"))
    val sk = Sketches.kllSketch(li, $"v", $"k", level = 0)
    assert(sk.count() == li.count(), "level 0 must keep every row")
    val probs = Seq(0.1, 0.5, 0.9)
    val est = Sketches.kllQuantiles(sk, probs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = li.select($"v").collect().map(_.getDouble(0)).sorted
    for (p <- probs) {
      val want = sorted(math.max(1, math.ceil(p * sorted.length).toLong).toInt - 1)
      assert(est(p) == want, s"level-0 quantile $p: ${est(p)} != exact $want")
    }
  }

  test("kllQuantiles rank error vs the exact quantiles stays within the sampling bound") {
    // real fixture values: lineitem extendedprice at sf0.001 (6005 rows);
    // level 3 keeps ~1/8 (~750 samples) — sampling theory puts the rank
    // error around 1/sqrt(m) ~ 3.7%; assert a 6% ceiling with margin.
    // A regression in the gate, the tie order, or the rank selection
    // blows far past it.
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_extendedprice").as("v"), concat(col("l_orderkey"), lit("_"), col("l_linenumber")).as("k"))
    val probs = (1 to 9).map(_ / 10.0)
    val est = Sketches.kllQuantiles(Sketches.kllSketch(li, $"v", $"k", level = 3), probs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(est.size == probs.size, s"one estimate per prob, got ${est.size}")
    val exact = li.select($"v").collect().map(_.getDouble(0)).sorted
    val n = exact.length
    for (p <- probs) {
      // the estimate's true rank fraction must sit near p
      val rank = exact.count(_ <= est(p)).toDouble / n
      assert(math.abs(rank - p) <= 0.06,
        f"quantile $p: estimate ${est(p)}%.2f has rank $rank%.3f (err ${math.abs(rank - p)}%.3f)")
    }
  }

  test("heavyHittersExact equals the plain threshold truth — the gate is lossless") {
    // width=4 forces sketch collisions → false-positive candidates; the
    // exact second pass must remove them, and count-min's no-underestimate
    // guarantee means no true heavy hitter can be gated out
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(4)("c") ++ Seq("d")).toDF("w")
    val out = Sketches
      .heavyHittersExact(df, col("w"), threshold = 5L, depth = 3, width = 4)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(out == Map("a" -> 10L, "b" -> 5L))
  }

  test("countMinJoinSize never underestimates and is exact without collisions") {
    // A: a×3 b×2 c×1; B: a×2 b×1 d×5 → true join size 3·2 + 2·1 = 8
    val a = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("k")
    val b = (Seq.fill(2)("a") ++ Seq("b") ++ Seq.fill(5)("d")).toDF("k")
    // wide sketch: 4 keys in 4096 cells — md5 is deterministic, and this
    // layout has a collision-free row, so the bound is TIGHT here
    val ca = Sketches.countMinCells(a, col("k"), depth = 4, width = 4096)
    val cb = Sketches.countMinCells(b, col("k"), depth = 4, width = 4096)
    val est = Sketches.countMinJoinSize(ca, cb, depth = 4).collect()(0).getLong(0)
    assert(est == 8L, s"collision-free estimate must be exact: $est")
    // narrow sketch: heavy collisions — still one-sided (est >= truth)
    val ca2 = Sketches.countMinCells(a, col("k"), depth = 2, width = 2)
    val cb2 = Sketches.countMinCells(b, col("k"), depth = 2, width = 2)
    val est2 = Sketches.countMinJoinSize(ca2, cb2, depth = 2).collect()(0).getLong(0)
    assert(est2 >= 8L, s"count-min inner product is one-sided: $est2")
    // disjoint key sets estimate down to whatever cells collide, and an
    // empty side estimates exactly 0 on every row
    val empty = Sketches.countMinCells(Seq.empty[String].toDF("k"), col("k"), 4, 4096)
    val est3 = Sketches.countMinJoinSize(ca, empty, depth = 4).collect()(0).getLong(0)
    assert(est3 == 0L, s"empty side must estimate 0: $est3")
  }
}
