package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-style distinct estimation for corpus statistics (north-star
  * extension, SURVEY.md §7.5). The estimator is KMV (k-minimum-values,
  * Bar-Yossef et al. 2002): keep the k smallest values of a uniform hash of
  * the distinct items; with the hash space [0, 2³²) and kth-smallest value
  * t, the distinct count is ≈ (k-1)·2³² / t.
  *
  * Chosen over HyperLogLog deliberately: KMV over a shared md5-derived hash
  * is reproducible bit-for-bit in ANY engine with md5 + integer arithmetic
  * (the driver's DuckDB oracle included), while HLL implementations never
  * agree across engines. Same scale shape: the top-k runs as per-partition
  * partial limits merged on the driver side of the exchange (Spark's
  * TakeOrdered), so no global sort materializes.
  */
object Sketches {

  /** 32-bit uniform hash of a string column: first 8 hex chars of md5 as a
    * long in [0, 2³²).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Count-min sketch cells (Cormode & Muthukrishnan 2005): `depth`
    * md5-derived hash rows × `width` cells, each holding the count of
    * items hashing into it. One groupBy over (row, cell) — the shuffle
    * carries at most depth×width partial-aggregated rows per map task
    * regardless of corpus size, which is the whole point of the sketch
    * at 100 TB: frequency state in O(depth·width), not O(vocabulary).
    */
  def countMinCells(df: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    // aggregate occurrences per DISTINCT item before hashing: md5 runs
    // depth × |vocabulary| times instead of depth × |corpus| (zipf-shaped
    // corpora make that orders of magnitude), and the first shuffle is the
    // partial-agg-friendly item count (measured 2.9s → sub-second at sf0.1)
    df.select(itemCol.as("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("item_cnt"))
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn(
        "cell",
        graft.ops.Hashing
          .md5Mod(concat(col("j").cast("string"), lit("_"), col("item")), width.toLong))
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("item_cnt")).as("cnt"))
  }

  /** Streaming form of [[countMinCells]]: hashes every occurrence and
    * aggregates (j, cell) in ONE stateful stage. The batch form's
    * vocabulary pre-aggregation would chain two stateful aggregates —
    * illegal on an unwatermarked stream — while this single groupBy is
    * legal in complete/update mode with NO watermark precisely because
    * the group domain (depth × width cells) is bounded by construction.
    */
  def countMinCellsStream(df: DataFrame, itemCol: Column, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    df.select(itemCol.as("item"))
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn(
        "cell",
        graft.ops.Hashing
          .md5Mod(concat(col("j").cast("string"), lit("_"), col("item")), width.toLong))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from count-min cells: for each probe item,
    * min over the depth rows of its cell count (absent cells read 0). The
    * estimate is one-sided — always ≥ the true count, inflated only by
    * collisions. Probes join the (small, broadcastable) cell table.
    */
  def countMinEstimate(
      cells: DataFrame,
      probes: DataFrame,
      probeCol: Column,
      depth: Int,
      width: Int
  ): DataFrame =
    probes
      .select(probeCol.as("item"))
      .distinct()
      .withColumn("j", explode(array((0 until depth).map(lit): _*)))
      .withColumn(
        "cell",
        graft.ops.Hashing
          .md5Mod(concat(col("j").cast("string"), lit("_"), col("item")), width.toLong))
      .join(broadcast(cells), Seq("j", "cell"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** JOIN-CARDINALITY estimate from two count-min sketches (Cormode &
    * Muthukrishnan's inner-product bound): `|A ⋈_k B| = Σ_k fA(k)·fB(k)`,
    * and the sketch estimate is `min_j Σ_w A[j,w]·B[j,w]` — one-sided,
    * always ≥ the true size, inflated only by cell collisions. This is
    * the optimizer-statistics operator for 100 TB planning: decide
    * broadcast-vs-shuffle or veto a runaway join from two O(depth·width)
    * summaries, WITHOUT scanning either table again — sketches of both
    * sides are mergeable partial aggregates a warehouse maintains per
    * partition. Products run in decimal(38,0) (two 10¹²-row tables make
    * the inner product overflow a Long).
    */
  def countMinJoinSize(cellsA: DataFrame, cellsB: DataFrame, depth: Int): DataFrame = {
    require(depth > 0, "depth must be positive")
    val dec = "decimal(38,0)"
    val ip = cellsA
      .select(col("j"), col("cell"), col("cnt").as("ca"))
      .join(cellsB.select(col("j"), col("cell"), col("cnt").as("cb")), Seq("j", "cell"))
      .groupBy(col("j"))
      .agg(sum(col("ca").cast(dec) * col("cb").cast(dec)).as("ip"))
    // complete over all depth rows: a hash row with zero shared cells
    // estimates 0 (and wins the min), not "absent"
    val rows = cellsA.sparkSession.range(depth).select(col("id").cast("int").as("j"))
    rows
      .join(ip, Seq("j"), "left")
      .agg(min(coalesce(col("ip"), lit(0L).cast(dec))).as("__est"))
      .select(col("__est").cast("long").as("est_join_rows"))
  }

  /** EXACT heavy hitters (all items with true count ≥ `threshold`) via a
    * count-min candidate gate — the classic two-pass shape for 100 TB
    * frequency mining: pass 1 folds the corpus into the depth×width
    * sketch, the sketch ESTIMATES gate a (small) candidate set, and pass
    * 2 exact-counts ONLY rows whose item survived the gate. Because
    * count-min never underestimates, no true heavy hitter is dropped by
    * the gate, and the final exact filter removes the sketch's false
    * positives — output is IDENTICAL to the plain `HAVING count ≥ t`
    * query, which is exactly what the oracle runs.
    *
    * Why bother at scale: the naive form shuffles one row per DISTINCT
    * item (the whole vocabulary); here the second pass's broadcast
    * semi-join drops every non-candidate row BEFORE its shuffle, so the
    * exchange carries only the (tiny) candidate vocabulary. The sketch
    * itself is depth×width rows regardless of corpus size and is the
    * mergeable/persistable artifact an incremental pipeline keeps.
    */
  def heavyHittersExact(
      df: DataFrame,
      itemCol: Column,
      threshold: Long,
      depth: Int,
      width: Int
  ): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    val items = df.select(itemCol.as("item"))
    val cells = countMinCells(items, col("item"), depth, width)
    val candidates = countMinEstimate(cells, items, col("item"), depth, width)
      .filter(col("est") >= threshold)
      .select(col("item"))
    items
      .join(broadcast(candidates), Seq("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Bloom-filter bit set (Bloom 1970) over the distinct items of
    * `itemCol`: `k` md5-derived hash functions into `m` bit positions,
    * emitted as the DISTINCT set of set positions — one row per set bit.
    * Filter state is O(m) rows regardless of corpus size (the whole point
    * at 100 TB: a membership summary that broadcasts), and the build is a
    * single distinct-then-explode pass with map-side combine on the final
    * distinct.
    */
  /** The k bloom positions of one item: lane `j % 4` of
    * `md5(("g<j/4>#" salt for groups past the first) ++ item)`, mod m —
    * ONE digest serves four hash functions (the [[graft.functions
    * .Md5Lanes]] amortization rule: the native extractor only wins where
    * many lanes share a digest, and a bloom probe is exactly that shape).
    * The j#-salted one-digest-per-hash family this replaced cost k
    * digests + k hex parses per probed ROW in the bloom-gated join; the
    * SQL twins express the same lanes as `substr(md5(..), 1+8·(j%4), 8)`.
    */
  private[graft] def bloomPositions(item: Column, m: Long, k: Int): Column = {
    val laneArrs = (0 until (k + 3) / 4).map { g =>
      val salted = if (g == 0) item else concat(lit(s"g$g#"), item)
      call_function("graft_md5_lanes", salted)
    }
    array((0 until k).map(j => pmod(element_at(laneArrs(j / 4), j % 4 + 1), lit(m))): _*)
  }

  def bloomBits(df: DataFrame, itemCol: Column, m: Long, k: Int): DataFrame = {
    require(m > 0 && k > 0, "m and k must be positive")
    df.select(itemCol.cast("string").as("item"))
      .distinct() // vocabulary dedup before hashing: md5 runs on |distinct|, not |corpus|
      .select(explode(bloomPositions(col("item"), m, k)).as("pos"))
      .distinct()
  }

  /** Membership probe against [[bloomBits]] output: an item is `maybe`
    * present iff ALL k of its positions are set (one-sided error — no
    * false negatives, false positives only, from hash collisions). The
    * bit set (≤ m rows) is broadcast, so the probe is a map-side join:
    * no shuffle of the probe stream. Returns one row per distinct probe
    * item: (item, maybe).
    */
  def bloomProbe(bits: DataFrame, probes: DataFrame, probeCol: Column, m: Long, k: Int): DataFrame = {
    require(m > 0 && k > 0, "m and k must be positive")
    probes
      .select(probeCol.cast("string").as("item"))
      .distinct()
      .select(col("item"), explode(bloomPositions(col("item"), m, k)).as("pos"))
      .join(broadcast(bits.withColumn("set_bit", lit(1))), Seq("pos"), "left")
      .groupBy(col("item"))
      .agg((count(col("set_bit")) === k).as("maybe"))
  }

  /** HyperLogLog register table (Flajolet et al. 2007) over the distinct
    * items of `itemCol`: 2^p registers, each holding the max over its items
    * of `rho` = 1 + number of leading zero bits in the low `32-p` hash bits.
    *
    * The ESTIMATE side of HLL (harmonic mean, bias constants, range
    * corrections) is float-laden and never engine-reproducible — that is
    * why [[kmvDistinct]] is this engine's primary distinct sketch. The
    * REGISTER table, though, is pure integer arithmetic on the shared
    * md5-derived hash, so it IS oracle-exact — and the registers are the
    * part that matters at 100 TB: state is ≤ 2^p integer rows, built by a
    * partial-agg-friendly `groupBy(register).max(rho)`, and two sketches
    * of disjoint scans merge by element-wise max (tested), which is what a
    * 1000-executor rollup actually ships between stages. Estimation from
    * the registers is a driver-side afterthought (see the spec).
    *
    * `rho` avoids float log2 entirely: bit length is a sum of integer
    * threshold comparisons `rest >= 2^k` — exact in any engine.
    */
  def hllRegisters(df: DataFrame, itemCol: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4,16]")
    hllRegisterRows(df.select(itemCol.cast("string").as("item")).distinct(), p)
      .groupBy(col("register"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Per-GROUP HLL registers — the mergeable distinct-count rollup unit:
    * one register table per group key (≤ |groups| · 2^p integer rows).
    * Roll up any set of groups by max-merging their registers (the same
    * element-wise max the global form's spec demonstrates) — per-source /
    * per-language distinct counts and their corpus-wide total from ONE
    * scan's sketch.
    */
  def hllRegistersByGroup(df: DataFrame, groupCol: Column, itemCol: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4,16]")
    hllRegisterRows(
      df.select(groupCol.as("grp"), itemCol.cast("string").as("item")).distinct(),
      p,
      carry = Seq("grp"))
      .groupBy(col("grp"), col("register"))
      .agg(max(col("rho")).as("max_rho"))
  }

  /** The shared hash → (register, rho) derivation over a pre-distincted
    * item frame (hash the vocabulary, not the corpus). `rho` avoids float
    * log2: bit length is a sum of integer threshold compares — exact in
    * any engine.
    */
  private def hllRegisterRows(items: DataFrame, p: Int, carry: Seq[String] = Nil): DataFrame = {
    val restBits = 32 - p
    // bitlen(rest) = Σ_k [rest >= 2^k]; rho = restBits - bitlen + 1
    val bitlen = (0 until restBits)
      .map(k => (col("rest") >= lit(1L << k)).cast("int"))
      .reduce(_ + _)
    items
      .select(carry.map(col) :+ hash32(col("item")).as("h"): _*)
      .select(
        carry.map(col)
          :+ shiftright(col("h"), restBits).as("register") // top p bits
          :+ col("h").bitwiseAND(lit((1L << restBits) - 1)).as("rest"): _* // low 32-p bits
      )
      .withColumn("rho", (lit(restBits) - bitlen + 1).cast("int"))
  }

  /** One-row KMV distinct estimate over `itemCol` of `df`:
    * (k, k_actual, kth_min, est_distinct).
    *
    * `est_distinct` = (k−1)·2³² div kth_min — integer division, exact in
    * any engine. When the domain has fewer than k distinct hashes the
    * sketch degenerates to exact (`est = k_actual`). ONE pass: distinct of
    * the 32-bit hash, then TakeOrdered(k) — per-partition partial limits
    * merged at the exchange, no global sort, no wide rows, which is the
    * whole point of the sketch at 100 TB. The accuracy audit against the
    * exact distinct count (a full distinct shuffle the sketch exists to
    * avoid) lives in SketchesSpec, not in the operator.
    */
  def kmvDistinct(df: DataFrame, itemCol: Column, k: Int): DataFrame = {
    require(k > 1, "k must exceed 1")
    df.select(hash32(itemCol).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      .agg(max(col("h")).as("kth_min"), count(lit(1)).as("k_actual"))
      .select(
        lit(k.toLong).as("k"),
        col("k_actual"),
        col("kth_min"),
        when(col("k_actual") < k, col("k_actual"))
          .otherwise(expr(s"(${k - 1} * 4294967296L) div kth_min"))
          .as("est_distinct")
      )
  }

  /** KMV SET OPERATIONS — union, intersection and Jaccard estimates from
    * two k-min sketches, the classic KMV composition (Beyer et al. 2007):
    * the k smallest hashes of (kmin(A) ∪ kmin(B)) ARE kmin(A ∪ B), the
    * union estimate follows from its kth minimum, and the fraction of
    * those union samples present in BOTH input sketches estimates the
    * Jaccard similarity — so `est_intersect = overlap·est_union div k`.
    *
    * All integer arithmetic over the shared md5-derived hash, so any
    * engine replays it exactly. Degrades to EXACT when the union has
    * fewer than k distinct hashes (the sketch then holds the whole union
    * and `overlap` is the true intersection size). Each side costs one
    * distinct + TakeOrdered(k) pass — the sketches never exceed k rows,
    * so the set algebra is driver-scale regardless of input size; at
    * 100 TB the two input passes are the only data-sized work, and
    * sketches for different slices can be built once and composed many
    * times.
    *
    * Output (one row): k, k_actual, kth_min, est_union, overlap,
    * est_intersect, jaccard_bp (basis points, integer-exact).
    */
  def kmvSetOps(
      a: DataFrame,
      itemA: Column,
      b: DataFrame,
      itemB: Column,
      k: Int
  ): DataFrame = {
    require(k > 1, "k must exceed 1")
    def kmin(df: DataFrame, item: Column) =
      df.select(hash32(item).as("h")).distinct().orderBy(col("h")).limit(k)
    val ka = kmin(a, itemA)
    val kb = kmin(b, itemB)
    val u = ka.union(kb).distinct().orderBy(col("h")).limit(k)
    u.join(ka.select(col("h"), lit(1).as("ina")), Seq("h"), "left")
      .join(kb.select(col("h"), lit(1).as("inb")), Seq("h"), "left")
      .agg(
        max(col("h")).as("kth_min"),
        count(lit(1)).as("k_actual"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L)).as("overlap")
      )
      .select(
        lit(k.toLong).as("k"),
        col("k_actual"),
        col("kth_min"),
        when(col("k_actual") < k, col("k_actual"))
          .otherwise(expr(s"(${k - 1} * 4294967296L) div kth_min"))
          .as("est_union"),
        col("overlap")
      )
      .select(
        col("k"),
        col("k_actual"),
        col("kth_min"),
        col("est_union"),
        col("overlap"),
        expr("(overlap * est_union) div k_actual").as("est_intersect"),
        expr("(overlap * 10000) div k_actual").as("jaccard_bp")
      )
  }

  /** Mergeable quantile sketch, KLL-style level structure with the coin
    * flips DERANDOMIZED: an item survives to sampling level ℓ iff
    * `md5(key) mod 2^ℓ == 0` — the same geometric thinning KLL's
    * compactors apply probabilistically, but as a pure function of the
    * item's key (Bar-Yossef-style hash subsampling). Consequences, each
    * the reason the derandomization was chosen over textbook KLL:
    *
    *   - ENGINE-REPRODUCIBLE: any engine with md5 builds the identical
    *     sketch, so the DuckDB oracle replays it bit-for-bit.
    *   - ORDER-INDEPENDENT: the sketch is a function of the multiset, not
    *     the arrival order — retried/repartitioned jobs agree exactly.
    *   - TRIVIALLY MERGEABLE: sketch(A ∪ B) == sketch(A) ∪ sketch(B)
    *     bit-for-bit at equal levels ([[kllMerge]]); to merge sketches at
    *     different levels, re-filter the finer one with the coarser gate —
    *     still exact equality, asserted in SketchesSpec.
    *
    * Each surviving row carries weight 2^ℓ. Expected size is n/2^ℓ; rank
    * error is the sampling error O(√(n·2^ℓ)) w.h.p. — the accuracy audit
    * against [[Stats.exactQuantiles]] lives in SketchesSpec. Map-only:
    * the gate is a per-row filter, nothing shuffles until the (bounded)
    * sketch is queried.
    *
    * @param keyCol unique per OCCURRENCE (a row id), so duplicate values
    *               sample independently — hashing the value itself would
    *               keep or drop all duplicates together
    */
  def kllSketch(df: DataFrame, valueCol: Column, keyCol: Column, level: Int): DataFrame = {
    require(level >= 0 && level < 32, "level must be in [0, 32)")
    df.select(valueCol.as("v"), keyCol.cast("string").as("k"))
      .filter(col("v").isNotNull)
      .filter(graft.ops.Hashing.md5Mod(col("k"), 1L << level) === 0)
      .select(col("v"), col("k"), lit(1L << level).as("w"))
  }

  /** [[kllSketch]] with a group key carried through — the builder for
    * [[kllQuantilesByGroup]]. Same gate, same weights; the group column
    * rides along untouched (it plays no part in the hash, so a group's
    * sample is exactly what [[kllSketch]] over that group alone would
    * keep — per-group merge semantics fall out for free).
    */
  def kllSketchGrouped(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      keyCol: Column,
      level: Int
  ): DataFrame = {
    require(level >= 0 && level < 32, "level must be in [0, 32)")
    df.select(groupCol.as("grp"), valueCol.as("v"), keyCol.cast("string").as("k"))
      .filter(col("v").isNotNull)
      .filter(graft.ops.Hashing.md5Mod(col("k"), 1L << level) === 0)
      .select(col("grp"), col("v"), col("k"), lit(1L << level).as("w"))
  }

  /** Merge two [[kllSketch]]es built at levels `levelA` and `levelB`:
    * the coarser gate re-filters the finer sketch (a level-ℓ survivor is a
    * level-(ℓ+1) survivor iff its hash also clears the wider modulus), so
    * the result is EXACTLY the sketch of the union at max(levelA, levelB)
    * — no approximation stacking, unlike randomized-compaction merges.
    */
  def kllMerge(a: DataFrame, levelA: Int, b: DataFrame, levelB: Int): DataFrame = {
    val lvl = math.max(levelA, levelB)
    def lift(s: DataFrame): DataFrame =
      s.filter(graft.ops.Hashing.md5Mod(col("k"), 1L << lvl) === 0)
        .withColumn("w", lit(1L << lvl))
    lift(a).unionByName(lift(b))
  }

  /** Quantile estimates from a [[kllSketch]]: for each probability q, the
    * sketch's own q-quantile — the element at rank max(1, ceil(q·m)) of
    * the sample sorted by (value, key), m = sample size. The (value, key)
    * order makes tie handling deterministic in any engine. The global
    * window is LEGAL here because it ranks the SKETCH (expected n/2^ℓ
    * rows, the bounded object the operator exists to produce), never the
    * input.
    */
  def kllQuantiles(sketch: DataFrame, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty, "probs must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val s = sketch.sparkSession
    import s.implicits._
    val ranked = sketch
      .withColumn("r", row_number().over(Window.orderBy(col("v"), col("k"))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
    ranked
      .select(col("v"), col("r"), col("m"))
      .join(
        broadcast(probs.toDF("prob")),
        col("r") === greatest(lit(1L), ceil(col("prob") * col("m")).cast("long")))
      .select(col("prob"), col("v").as("est"))
  }

  /** Per-GROUP quantile estimates from a sketch carrying a `grp` column
    * (build it with [[kllSketch]] over a frame that still has the group
    * key, then select it alongside): the same rank selection as
    * [[kllQuantiles]], windowed per group — the per-source/per-language
    * profiling shape. The window partitions on the group, so the sort is
    * per-group over SKETCH rows (expected n_g/2^ℓ each), never global and
    * never over the input.
    */
  def kllQuantilesByGroup(
      sketch: DataFrame,
      groupCol: Column,
      probs: Seq[Double]
  ): DataFrame = {
    require(probs.nonEmpty, "probs must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val s = sketch.sparkSession
    import s.implicits._
    val w = Window.partitionBy(groupCol)
    val ranked = sketch
      .withColumn("r", row_number().over(w.orderBy(col("v"), col("k"))))
      .withColumn("m", count(lit(1)).over(w))
    ranked
      .select(groupCol.as("grp"), col("v"), col("r"), col("m"))
      .join(
        broadcast(probs.toDF("prob")),
        col("r") === greatest(lit(1L), ceil(col("prob") * col("m")).cast("long")))
      .select(col("grp"), col("prob"), col("v").as("est"))
  }
}
