package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Dataset curation (SURVEY.md §7.5). */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = spark.range(0, 2000)
    .select($"id".as("doc_id"),
      when($"id" % 4 === 0, "de").otherwise("en").as("lang"))

  test("stratified sample keeps ~rate per stratum, deterministically") {
    val out = Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 0.25), 1.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the non-targeted stratum survives whole
    assert(byLang("de") == 500L)
    // the md5 gate is uniform: 1500 en docs at 25% => ~375, well within 4σ
    assert(byLang("en") > 280 && byLang("en") < 470, s"en kept ${byLang("en")}")
    // deterministic: a second run selects the identical rows
    val again = Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 0.25), 1.0)
    assert(out.collect().map(_.getLong(0)).sorted sameElements again.collect().map(_.getLong(0)).sorted)
  }

  test("rate 0 drops the stratum entirely; default rate applies to unlisted strata") {
    val out = Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 0.0), 0.5)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("de"))
    val n = out.count()
    assert(n > 180 && n < 320, s"de at 50% of 500 => ~250, got $n")
  }

  test("rates outside [0,1] are rejected") {
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(docs, $"doc_id", $"lang", Map("en" -> 1.5))
    }
  }

  test("packSequences: cumulative-fill packs within salt groups, 1-based positions") {
    // ids 0..9, 100 tokens each, salts=2: group {0,2,4,6,8} has exclusive
    // cums 0,100,200,300,400 -> packs 0,0,0,1,1 at budget 256 (doc 4
    // straddles the boundary and joins the EARLIER pack by contract)
    val df = spark.range(0, 10).select($"id".as("doc_id"), lit(100).as("nt"))
    val out = Curation.packSequences(df, $"doc_id", $"nt", budget = 256, salts = 2)
      .select("doc_id", "n_tokens", "cum_tokens", "pack_id", "pack_pos")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(0L) == ((100L, 100L, 0L, 1L)))
    assert(out(4L) == ((100L, 300L, 0L, 3L))) // straddler stays in pack 0
    assert(out(6L) == ((100L, 400L, 1L, 1L)))
    assert(out(8L) == ((100L, 500L, 1L, 2L)))
    // odd salt group packs under salt prefix 2^40
    val p = 1L << 40
    assert(out(1L) == ((100L, 100L, p, 1L)))
    // packs never cross salt groups
    assert(out.values.map(_._3).toSet == Set(0L, 1L, p, p + 1L))
  }

  test("decontaminate flags docs overlapping the benchmark, leaves the rest") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // near-copy of bench
      (2L, "completely different words about databases and storage engines"),
      (3L, "the quick brown fox jumps high")                     // one shared 5-gram window
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, $"doc_id", $"text", bench, $"text", n = 5, threshPct = 50)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // doc 1: 6 distinct 5-grams, 5 shared with bench (the 6th ends in "today")
    assert(out(1L) == ((6L, 5L, true)))
    assert(out(2L)._2 == 0L && !out(2L)._3)
    // doc 3: 2 grams, 1 shared ("the quick brown fox jumps") -> 50% meets the bar
    assert(out(3L) == ((2L, 1L, true)))
    assert(out.size == 3) // zero-hit docs still reported
  }

  test("mixToTarget keeps the bottleneck stratum whole and downsamples others toward the weights") {
    // 100 docs each of a/b; weights a:4 b:1 → bottleneck is a (100/4 < 100/1),
    // a kept whole, b sampled at (100·1)/(4·100) = 25%
    val df = (0 until 100).flatMap(i => Seq((i.toLong * 2, "a"), (i.toLong * 2 + 1, "b"))).toDF("id", "s")
    val out = Curation.mixToTarget(df, $"id", $"s", Map("a" -> 4), defaultWeight = 1)
    val byS = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("a") == 100L)
    assert(byS("b") > 5L && byS("b") < 50L) // ~25 ± hash noise
    // deterministic: same input, same sample
    assert(rows(Curation.mixToTarget(df, $"id", $"s", Map("a" -> 4), defaultWeight = 1)) == rows(out))
  }

  test("temperatureMix flattens kept sizes toward sqrt(n); bottleneck kept whole") {
    // strata: a=1600, b=400, c=100 → u ∝ 40, 20, 10; bottleneck maximizes
    // u/n = c (smallest). Expected kept ≈ n_c·u_s/u_c: a≈400, b≈200, c=100 —
    // the 16:4:1 input flattens to ≈4:2:1 (the α=1/2 law).
    val df = ((0 until 1600).map(i => (i.toLong, "a")) ++
      (0 until 400).map(i => (10000L + i, "b")) ++
      (0 until 100).map(i => (20000L + i, "c"))).toDF("id", "s")
    val out = Curation.temperatureMix(df, $"id", $"s")
    val byS = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("c") == 100L, s"bottleneck stratum must be kept whole, got ${byS("c")}")
    assert(byS("a") > 300L && byS("a") < 500L, s"a ~400 expected, got ${byS("a")}")
    assert(byS("b") > 140L && byS("b") < 260L, s"b ~200 expected, got ${byS("b")}")
    // deterministic: same input, same sample
    assert(rows(Curation.temperatureMix(df, $"id", $"s")) == rows(out))
  }

  test("clusterBalancedSample: per-cell cap holds, assignment is nearest-centroid, deterministic") {
    // two tight clusters on axes 0 and 1; centroids trained on the data
    val dim = 4
    val rows0 = (0 until 30).map { i =>
      val c = i % 2
      (i.toLong, (0 until dim).map(d => if (d == c) 100.0f + (i % 5) else 0.0f))
    }
    val df = rows0.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding", nlist = 2, iters = 2)
    val out = Curation.clusterBalancedSample(df, $"vec_id", $"embedding", cents, k = 5)
    val perCell = out.groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perCell.values.forall(_ <= 5L), s"cell cap violated: $perCell")
    assert(perCell.size == 2, s"both clusters must be represented: $perCell")
    // rk is dense 1..k within each cell
    val rks = out.groupBy("cell").agg(sort_array(collect_list($"rk")).as("rks"))
      .collect().map(_.getSeq[Int](1))
    rks.foreach(r => assert(r == (1 to r.size), s"rk not dense: $r"))
    assert(rows(Curation.clusterBalancedSample(df, $"vec_id", $"embedding", cents, k = 5)) == rows(out))
  }

  test("filterByGroupQuantile keeps each group's upper half incl. threshold ties") {
    // group a: values 1..5 → median (rank ⌈5/2⌉=3) = 3, keep {3,4,5};
    // group b: 10,10,20 → rank 2 value = 10, ties at 10 ALL kept
    val df = (Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L), (5L, "a", 5L),
      (6L, "b", 10L), (7L, "b", 10L), (8L, "b", 20L))).toDF("id", "g", "v")
    val out = Curation.filterByGroupQuantile(df, $"g", $"v", 1, 2)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(out == Set(3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("filterByGroupQuantile treats a NULL group as its own stratum (null-safe join)") {
    // NULL-group rows must be curated against the NULL group's own median,
    // not silently inner-joined away: values 1..4 → rank (1·4+1) div 2 = 2
    // → thr 2; group a: rank (1·2+1) div 2 = 1 → thr 7, both kept
    val df = Seq((1L, None, 1L), (2L, None, 2L), (3L, None, 3L), (4L, None, 4L),
      (5L, Some("a"), 7L), (6L, Some("a"), 9L)).toDF("id", "g", "v")
    val out = Curation.filterByGroupQuantile(df, $"g", $"v", 1, 2)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("temperatureGate (baked-literal serving) equals the relational temperatureMix") {
    val df = ((0 until 900).map(i => (i.toLong, "a")) ++
      (0 until 100).map(i => (5000L + i, "b"))).toDF("id", "s")
    val model = Curation.temperatureMixModel(df, $"s")
    val served = df.filter(Curation.temperatureGate($"id", $"s", model))
    assert(rows(served) == rows(Curation.temperatureMix(df, $"id", $"s")))
    // unknown stratum at serving time → gate NULL → dropped, not crashed
    val unknown = Seq((1L, "zz")).toDF("id", "s")
    assert(unknown.filter(Curation.temperatureGate($"id", $"s", model)).count() == 0L)
  }

  test("temperatureMixModel tie-breaks the bottleneck in UTF-8 byte order (supplementary chars)") {
    // U+FFFD sorts ABOVE U+1F600 in Java's UTF-16 String order but BELOW it
    // in UTF-8 byte (= code point) order, which is what Spark's window and
    // DuckDB both use. Equal counts → exact n/u tie → the tie-break decides
    // the bottleneck; serving must agree with the relational pick.
    val sA = "�"         // U+FFFD, UTF-8 EF BF BD
    val sB = "😀"   // U+1F600, UTF-8 F0 9F 98 80
    val df = ((0 until 400).map(i => (i.toLong, sA)) ++
      (0 until 400).map(i => (9000L + i, sB))).toDF("id", "s")
    val model = Curation.temperatureMixModel(df, $"s")
    val served = df.filter(Curation.temperatureGate($"id", $"s", model))
    assert(rows(served) == rows(Curation.temperatureMix(df, $"id", $"s")))
    // sanity: the orderings really do disagree on this pair
    assert(Ordering.String.lt(sB, sA) && Curation.utf8ByteOrder.lt(sA, sB))
  }

  test("mix gate survives magnitudes where the old per-row Long triple product overflowed") {
    // weight Int.MaxValue and 5000 rows/stratum: the pre-r11 per-row product
    // nb·u·1e6 ≈ 1.07e19 > Long.Max wrapped negative and kept nothing; the
    // rate-table gate computes ⌊nb·u·1e6/(ub·n)⌋ = 1e6 exactly on the tiny
    // counts table in decimal(38,0), so both balanced strata are kept whole
    val df = (0 until 10000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val w = Map("a" -> Int.MaxValue, "b" -> Int.MaxValue)
    assert(Curation.mixToTarget(df, $"id", $"s", w, defaultWeight = 1).count() == 10000L)
  }

  test("mixToTarget with equal weights keeps everything when strata are balanced") {
    val df = (0 until 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    assert(Curation.mixToTarget(df, $"id", $"s", Map.empty, defaultWeight = 1).count() == 40L)
  }

  test("mixToTarget's null-safe join still plans as broadcast HASH join (not nested-loop)") {
    // EqualNullSafe is a legal hash-join key; the <=> fix must not trade
    // the 100 TB-safe broadcast-hash shape for a nested-loop join
    val df = (0 until 100).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "s")
    val plan = Curation
      .mixToTarget(df, $"id", $"s", Map("s0" -> 2), defaultWeight = 1)
      .queryExecution.executedPlan
    val str = plan.toString
    assert(str.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$str")
    assert(!str.contains("BroadcastNestedLoopJoin") || {
      // the bottleneck crossJoin is a legitimate 1-row nested loop; only the
      // counts join must be hash-shaped — require at most that single NLJ
      str.sliding("BroadcastNestedLoopJoin".length).count(_ == "BroadcastNestedLoopJoin") <= 1
    }, s"unexpected nested-loop joins:\n$str")
  }

  test("mixToTarget keeps NULL-stratum rows participating at defaultWeight (null-safe join)") {
    // pre-r5 defect: the inner join on === silently dropped every NULL-
    // stratum row even though defaultWeight promises they participate
    val df = (0 until 30)
      .map(i => (i.toLong, if (i % 3 == 0) null else "a"))
      .toDF("id", "s")
    val out = Curation.mixToTarget(df, $"id", $"s", Map("a" -> 1), defaultWeight = 1)
    val byS = out.collect().groupBy(r => Option(r.getString(1))).view.mapValues(_.length).toMap
    // NULL group (10 rows) is the bottleneck (10/1 < 20/1) → kept whole
    assert(byS.getOrElse(None, 0) == 10, s"NULL-stratum rows dropped: $byS")
    // "a" hash-downsampled toward 10 of 20
    assert(byS.getOrElse(Some("a"), 0) > 2 && byS.getOrElse(Some("a"), 0) < 18, byS.toString)
  }

  test("sampleExactK returns exactly k rows, deterministic, and plans as TakeOrdered") {
    val df = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("id", "payload")
    val q = Curation.sampleExactK(df, $"id", k = 50)
    val a = q.collect().map(_.getLong(0)).toSeq
    assert(a.length == 50 && a.distinct.length == 50)
    // same corpus → same sample (retry-stable hash order, no rand())
    val b = Curation.sampleExactK(df, $"id", k = 50).collect().map(_.getLong(0)).toSeq
    assert(a == b)
    // growing k only EXTENDS the sample (prefix property of hash order)
    val c = Curation.sampleExactK(df, $"id", k = 80).collect().map(_.getLong(0)).toSeq
    assert(c.take(50) == a)
    // scale shape: per-partition top-k heaps, no global sort materialized
    assert(
      q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      q.queryExecution.executedPlan.toString)
  }

  test("kAnonymity: group counts, l-diversity, NULL quasi groups, boundary at exactly k/l") {
    val rows =
      (1 to 5).map(i => (Option("a"), s"s$i")) ++          // n=5, 5 distinct → both pass at k=5,l=2
        (1 to 4).map(_ => (Option("b"), "same")) ++        // n=4 (< k), 1 distinct (< l)
        (1 to 6).map(_ => (Option("c"), "only")) ++        // n=6 ok, but constant sensitive → l fails
        (1 to 5).map(i => (Option.empty[String], s"v${i % 2}")) // NULL quasi is its own group
    val df = rows.toDF("quasi", "sens")
    val out = Curation.kAnonymity(df, Seq(col("quasi")), col("sens"), k = 5, l = 2)
      .collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    assert(out(Some("a")) == ((5L, 5L, true, true)), "exactly k and >= l must pass")
    assert(out(Some("b")) == ((4L, 1L, false, false)))
    assert(out(Some("c")) == ((6L, 1L, true, false)), "k-large constant-sensitive group leaks")
    assert(out(None) == ((5L, 2L, true, true)), "NULL quasi-identifier forms its own group")
  }

  test("sampleWeighted: exact k, weight-biased, prefix-stable, TakeOrdered plan") {
    // 500 heavy rows (w=200) vs 500 light rows (w=2): A-Res picks each row
    // with probability ∝ w, so a k=100 draw should be overwhelmingly heavy
    // (E[heavy] ≈ 99; even 3 light picks is already ~4σ out)
    val df = (0 until 1000).map(i =>
      (i.toLong, if (i < 500) 200L else 2L)).toDF("id", "w")
    val q = Curation.sampleWeighted(df, $"id", $"w", k = 100)
    val a = q.collect().map(_.getLong(0)).toSeq
    assert(a.length == 100 && a.distinct.length == 100, "exactly k distinct rows")
    val heavy = a.count(_ < 500)
    assert(heavy >= 90, s"weight bias missing: only $heavy/100 heavy picks")
    // retry-stable, and growing k only extends the draw (A-Res key order
    // is a fixed total order, so the top-k is a prefix of the top-(k+m))
    val b = Curation.sampleWeighted(df, $"id", $"w", k = 100).collect().map(_.getLong(0)).toSeq
    assert(a == b)
    val c = Curation.sampleWeighted(df, $"id", $"w", k = 150).collect().map(_.getLong(0)).toSeq
    assert(c.take(100) == a)
    // non-positive weights can never be drawn
    val z = Curation.sampleWeighted(
      (0 until 10).map(i => (i.toLong, if (i % 2 == 0) 0L else 5L)).toDF("id", "w"),
      $"id", $"w", k = 10).collect().map(_.getLong(0)).toSeq
    assert(z.forall(_ % 2 == 1) && z.length == 5, s"zero-weight rows drawn: $z")
    // scale shape: per-partition top-k heaps, no global sort materialized
    assert(
      q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      q.queryExecution.executedPlan.toString)
  }

  test("chunkWindows emits overlapping windows covering every token") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = Curation.chunkWindows(docs, $"doc_id", $"text", chunkTokens = 4, stride = 3)
      .select($"chunk_idx", $"off", $"chunk", $"n_chunk_tokens")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (0, 0, "w1 w2 w3 w4", 4),
      (1, 3, "w4 w5 w6 w7", 4),
      (2, 6, "w7 w8 w9 w10", 4),
      (3, 9, "w10", 1) // tail window clips at the document end
    ))
  }

  test("chunkWindows with stride == chunk size partitions the document exactly") {
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Curation.chunkWindows(docs, $"doc_id", $"text", chunkTokens = 5, stride = 5)
      .orderBy($"chunk_idx")
      .collect()
    // non-overlapping windows: concatenation reconstructs the document
    assert(chunks.map(_.getAs[String]("chunk")).mkString(" ") == text)
    assert(chunks.map(_.getAs[Int]("n_chunk_tokens")).sum == 23)
  }

  test("dupSpanFraction counts grams shared across docs, not within one doc") {
    val docs = Seq(
      (1L, "a b c d e f"),       // grams: "a b c d e", "b c d e f"
      (2L, "a b c d e x"),       // shares "a b c d e" with doc 1
      (3L, "p q r s t u")        // nothing shared
    ).toDF("doc_id", "text")
    val out = Curation
      .dupSpanFraction(docs, $"doc_id", $"text", n = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("packSequences rejects a non-power-of-two budget") {
    val df = spark.range(0, 3).select($"id".as("doc_id"), lit(10).as("nt"))
    intercept[IllegalArgumentException] {
      Curation.packSequences(df, $"doc_id", $"nt", budget = 500, salts = 2)
    }
  }

  test("hashSplit assigns every row, near the declared proportions, deterministically") {
    val df = spark.range(0, 10000).select($"id".as("doc_id"))
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val out = Curation.hashSplit(df, $"doc_id", splits)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // total assignment: permilles sum to 1000, so nothing falls through
    assert(counts.values.sum == 10000L)
    // uniform md5 gate: 10k keys at 80/10/10 — generous 4σ-ish bands
    assert(counts("train") > 7600 && counts("train") < 8400, s"train ${counts("train")}")
    assert(counts("val") > 750 && counts("val") < 1250, s"val ${counts("val")}")
    assert(counts("test") > 750 && counts("test") < 1250, s"test ${counts("test")}")
    // deterministic: identical assignment on a second run
    val a = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.hashSplit(df, $"doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("hashSplit on a group key is group-atomic (the leakage guard)") {
    // 300 docs in 100 groups of 3 — every member must land in its group's split
    val df = spark.range(0, 300)
      .select($"id".as("doc_id"), ($"id" % 100).as("cluster_id"))
    val out = Curation
      .hashSplit(df, $"cluster_id", Seq("train" -> 900, "test" -> 100))
      .groupBy("cluster_id").agg(countDistinct($"split").as("n")).collect()
    assert(out.length == 100)
    out.foreach(r => assert(r.getLong(1) == 1L, s"cluster ${r.get(0)} straddles splits"))
  }

  test("hashSplit is a pure map-side expression (no exchange) and validates its weights") {
    val df = spark.range(0, 10).select($"id".as("doc_id"))
    val plan = Curation.hashSplit(df, $"doc_id", Seq("a" -> 500, "b" -> 500))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in split plan:\n$plan")
    intercept[IllegalArgumentException] { Curation.hashSplit(df, $"doc_id", Nil) }
    intercept[IllegalArgumentException] {
      Curation.hashSplit(df, $"doc_id", Seq("a" -> 600, "b" -> 500))
    }
    intercept[IllegalArgumentException] {
      Curation.hashSplit(df, $"doc_id", Seq("a" -> 500, "a" -> 500))
    }
    intercept[IllegalArgumentException] {
      Curation.hashSplit(df, $"doc_id", Seq("a" -> 1000, "b" -> 0))
    }
  }

  test("shuffleShards: total, dense per shard, deterministic, and actually shuffled") {
    val docs = spark.range(0, 1000).select($"id".as("doc_id"))
    val out = Curation.shuffleShards(docs, $"doc_id", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every doc exactly once, every shard's positions dense 1..n
    assert(out.length == 1000 && out.map(_._1).distinct.length == 1000)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong).toSeq,
        s"shard $shard positions not dense")
    }
    // deterministic across runs (the auditable-training-order claim)
    val again = Curation.shuffleShards(docs, $"doc_id", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // the order is a real shuffle, not id order: within some shard the
    // doc ids are not monotone in pos
    val monotone = out.groupBy(_._2).values.forall { rows =>
      val byPos = rows.sortBy(_._3).map(_._1)
      byPos.toSeq == byPos.sorted.toSeq
    }
    assert(!monotone, "shuffle left every shard in id order")
    // no empty shard at 1000 docs over 8 shards (md5 uniformity sanity)
    assert(out.map(_._2).distinct.length == 8)
  }

  test("dsir: weights favor target-dense buckets; docs of target vocabulary outscore the rest") {
    val corpus = Seq(
      (1L, "en", "alpha beta alpha beta"),
      (2L, "en", "alpha beta gamma"),
      (3L, "de", "delta epsilon zeta"),
      (4L, "de", "delta zeta delta epsilon")
    ).toDF("doc_id", "lang", "text")
    val w = Curation.dsirBucketWeights(corpus, corpus.filter($"lang" === "en"), $"text", buckets = 64)
    assert(w.count() == 64, "one weight per bucket, including unseen buckets")
    val scores = Curation.dsirScores(corpus, $"doc_id", $"text", w, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.keySet == Set(1L, 2L, 3L, 4L))
    // per-token mean importance: target-vocabulary docs must rank above
    // raw-only-vocabulary docs (the selection signal DSIR exists for)
    assert(scores(1L) / 4.0 > scores(3L) / 3.0, s"en doc should outscore de doc: $scores")
    assert(scores(2L) / 3.0 > scores(4L) / 4.0, s"en doc should outscore de doc: $scores")
    // deterministic: integer weights + exact long sums reproduce bit-for-bit
    val again = Curation.dsirScores(corpus, $"doc_id", $"text", w, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == scores)
  }

  test("dsir: the serving column (literal weights, no shuffle) matches the relational scorer") {
    val corpus = Seq(
      (1L, "en", "alpha beta alpha beta"),
      (2L, "en", "alpha beta gamma"),
      (3L, "de", "delta epsilon zeta"),
      (4L, "de", "delta zeta delta epsilon")
    ).toDF("doc_id", "lang", "text")
    val wdf = Curation.dsirBucketWeights(corpus, corpus.filter($"lang" === "en"), $"text", buckets = 64)
    val relational = Curation.dsirScores(corpus, $"doc_id", $"text", wdf, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weights = wdf.orderBy($"bucket").collect().map(_.getLong(1)).toSeq
    val serving = corpus
      .select($"doc_id", Curation.dsirScoreColumn($"text", weights).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(serving == relational, s"serving $serving != relational $relational")
  }

  test("dsir: tokenless documents are absent from scores, not zero-scored") {
    val corpus = Seq(
      (1L, "alpha beta"),
      (2L, "   "),
      (3L, "")
    ).toDF("doc_id", "text")
    val w = Curation.dsirBucketWeights(corpus, corpus, $"text", buckets = 16)
    val ids = Curation.dsirScores(corpus, $"doc_id", $"text", w, buckets = 16)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L), s"whitespace-only and empty docs must drop out, got $ids")
  }

  test("interleaveRoundRobin: sources alternate, epochs reshuffle within-source only") {
    // sources a (3 rows) and b (2 rows): a holds positions {0,2,4},
    // b {1,3} — stride |S| per source, so any prefix alternates sources
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (11L, "b")
    ).toDF("doc_id", "source")
    val out = Curation.interleaveRoundRobin(df, $"doc_id", $"source", epoch = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.values.map(_._2).toSet == Set(0L, 1L, 2L, 3L, 4L), s"dense positions: $out")
    assert(out.filter(_._2._1 == "a").values.map(_._2).toSet == Set(0L, 2L, 4L), s"a stride: $out")
    assert(out.filter(_._2._1 == "b").values.map(_._2).toSet == Set(1L, 3L), s"b stride: $out")
    // deterministic; a new epoch may permute WITHIN a source but every
    // position keeps its source lane (pos mod |S| is the source index)
    val again = Curation.interleaveRoundRobin(df, $"doc_id", $"source", epoch = 1)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(again == out)
    val e2 = Curation.interleaveRoundRobin(df, $"doc_id", $"source", epoch = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(e2.forall { case (_, (src, pos)) =>
      (pos % 2 == 0) == (src == "a")
    }, s"epoch must preserve the source lanes: $e2")
    assert(e2 != out, "epoch 2 should reshuffle the within-source order")
  }

  test("centroidOutliers: the fringe vector flags, the cut-rank tie stays an inlier") {
    // two fixed centroids at 0 and 1000 (quantized units); cell 0 holds
    // five vectors at quantized distances {0,1,4,4,10000} — with p=4/5 the
    // threshold rank is ceil(4*5/5)=4 → threshold value 4 (an order
    // statistic ON A TIE), so only d2=10000 flags: ties at the cut are
    // inliers by the strict-> rule. Cell 1's lone vector is its own
    // threshold and never flags.
    val emb = Seq(
      (1L, Array(0.000f)), // d2 = 0
      (2L, Array(0.001f)), // q=1 → d2 = 1
      (3L, Array(0.002f)), // q=2 → d2 = 4
      (4L, Array(-0.002f)), // q=-2 → d2 = 4 (the tie at the cut)
      (5L, Array(0.100f)), // q=100 → d2 = 10000 — the fringe
      (6L, Array(1.000f)) // q=1000 → cell 1, d2 = 0
    ).toDF("vec_id", "embedding")
    val cents = Array(Seq(0L), Seq(1000L))
    val out = Curation
      .centroidOutliers(emb, $"vec_id", $"embedding", cents, pNum = 4, pDen = 5)
      .collect()
      .map(r => r.getLong(1) -> ((r.getInt(0), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), s"every vector audited: $out")
    assert(out(5L) == ((0, 10000L, true)), s"the fringe must flag: $out")
    assert(Seq(1L, 2L, 3L, 4L, 6L).forall(!out(_)._3), s"ties at the cut stay inliers: $out")
    assert(out(6L)._1 == 1, s"cell assignment: $out")
  }

  test("tokenBudgetSelect: greedy by (score desc, id), straddling bucket spends its residual") {
    // scores: 3 → 40+40 tokens (fits entirely), 2 → 30+30+30 (straddles:
    // residual 100−80 = 20 → doc 21's inclusive 30 > 20, nothing fits),
    // 1 → past the budget entirely
    val df = Seq(
      (10L, 3L, 40L), (11L, 3L, 40L),
      (20L, 2L, 30L), (21L, 2L, 30L), (22L, 2L, 30L),
      (30L, 1L, 5L)
    ).toDF("doc_id", "sc", "nt")
    val out = Curation.tokenBudgetSelect(df, $"doc_id", $"sc", $"nt", budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(10L -> true, 11L -> true, 20L -> false, 21L -> false,
      22L -> false, 30L -> false), s"got $out")
    // raise the residual: budget 145 → bucket 2 fits 30+30 (cum 140), not 90
    val out2 = Curation.tokenBudgetSelect(df, $"doc_id", $"sc", $"nt", budget = 145L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out2 == Map(10L -> true, 11L -> true, 20L -> true, 21L -> true,
      22L -> false, 30L -> false), s"got $out2")
  }

  test("tokenBudgetSelect: a zero-token doc at the exact budget boundary still fits") {
    // cum hits the budget exactly at doc 2; doc 3 carries 0 tokens so its
    // inclusive cum == budget — the greedy rule admits it, and the
    // bucket-verdict fold must not round it down to NONE
    val df = Seq((1L, 5L, 60L), (2L, 4L, 40L), (3L, 3L, 0L), (4L, 2L, 10L))
      .toDF("doc_id", "sc", "nt")
    val out = Curation.tokenBudgetSelect(df, $"doc_id", $"sc", $"nt", budget = 100L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> true, 4L -> false), s"got $out")
  }

  test("tokenBudgetSelect matches the naive global greedy replay on random data") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map(i => (i.toLong, rng.nextInt(8).toLong, rng.nextInt(50).toLong))
    val df = rows.toDF("doc_id", "sc", "nt")
    val budget = 3000L
    val got = Curation.tokenBudgetSelect(df, $"doc_id", $"sc", $"nt", budget)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    var cum = 0L
    val want = rows.sortBy(r => (-r._2, r._1)).map { case (id, _, nt) =>
      cum += nt
      id -> (cum <= budget)
    }.toMap
    assert(got == want)
  }

  test("working-column collisions are rejected up front, never silently dropped") {
    // a caller column named like an internal staging column would be
    // replaced and then dropped — the operators must refuse instead
    val rk = Seq((1L, "a", 1)).toDF("doc_id", "source", "__rk")
    intercept[IllegalArgumentException] {
      Curation.sampleExactKPerGroup(rk, $"source", $"doc_id", k = 1)
    }
    val g = Seq((1L, "a", 10, 2)).toDF("doc_id", "source", "n_chars", "__g")
    intercept[IllegalArgumentException] {
      Curation.filterByGroupMean(g, $"source", $"n_chars", minMean = 1.0)
    }
    val s = Seq((1L, "a", 3)).toDF("doc_id", "source", "__s")
    intercept[IllegalArgumentException] {
      Curation.mixToTarget(s, $"doc_id", $"source", weights = Map("a" -> 1))
    }
  }

  test("gateFunnel: cumulative survivors, exact ppm, NULL gate value fails the doc") {
    val df = Seq(
      (1L, Some("en"), 10L),  // passes both
      (2L, Some("en"), 1L),   // fails min_len
      (3L, Some("de"), 10L),  // fails english (and everything after)
      (4L, None, 10L)         // NULL lang → english gate fails, not errors
    ).toDF("id", "lang", "n")
    val out = Curation.gateFunnel(df, Seq(
      "english" -> ($"lang" === "en"),
      "min_len" -> ($"n" >= 5)))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(out == Seq(
      (1, "english", 4L, 2L, 500000L),
      (2, "min_len", 4L, 1L, 250000L)
    ), s"got $out")
  }

  test("dpNoisyCounts: bounded grid noise, epsilon scaling, true count never published") {
    val df = (1 to 40).map(i => (i.toLong, s"g${i % 8}")).toDF("id", "g")
    val out = Curation.dpNoisyCounts(df, Seq($"g"), eps = 1.0)
    // the exact count column must NOT be in the release
    assert(!out.columns.contains("n"), out.columns.mkString(","))
    val rel = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rel.size == 8)
    // grid bound: |noise| <= -ln(2e-6) ≈ 13.12 at eps 1; every count is 5
    for ((g, v) <- rel) assert(math.abs(v - 5.0) <= 13.13, s"$g: $v out of Laplace grid range")
    // the md5 gate actually perturbs (not all groups land on zero noise)
    assert(rel.values.exists(v => math.abs(v - 5.0) > 0.01), s"no noise applied: $rel")
    // doubling epsilon halves each group's noise (inverse-CDF linearity),
    // up to the two 6-dp rounds
    val rel2 = Curation.dpNoisyCounts(df, Seq($"g"), eps = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((g, v) <- rel)
      assert(math.abs((v - 5.0) - 2.0 * (rel2(g) - 5.0)) <= 3e-6, s"$g: eps scaling broken")
    // deterministic: a re-run replays bit-identically
    val again = Curation.dpNoisyCounts(df, Seq($"g"), eps = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again == rel)
  }
}
