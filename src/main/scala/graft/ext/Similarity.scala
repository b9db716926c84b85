package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (north-star extension, SURVEY.md §7.5).
  *
  * Vectors are `array<float>` columns. All arithmetic is built-in array
  * higher-order functions (`zip_with` + `aggregate`) — codegen'd, per-row,
  * deterministic left-to-right accumulation in double precision (so results
  * are bit-reproducible and oracle-comparable).
  *
  * Scale paths:
  *   - [[bruteForceTopK]]: query-set broadcast × corpus scan — exact, O(Q·N),
  *     right when Q is small (the usual "probe a handful of queries" shape).
  *   - [[lshBucketTopK]]: sign-random-projection bucketing — each vector maps
  *     to a small bucket key; candidates shuffle only within buckets
  *     (IVF-style). Approximate: probes its own bucket.
  */
object Similarity {

  /** Left-to-right double-precision dot product of two quantized vectors —
    * the native codegen expression ([[graft.functions.ArrayDot]], requires
    * [[graft.GraftExtensions]], which every entry point registers).
    * Bit-identical to [[dotHof]], the built-in formulation it replaced:
    * same casts, same multiply, same fold order (parity spec-asserted).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** The built-in HOF formulation of [[dot]] — kept as the executable
    * definition of the exactness contract the native expression must
    * match, and for sessions without the extension registered.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for each query vector: broadcast the (small)
    * query set against the corpus, admit into a BOUNDED per-query heap.
    * Ties broken by candidate id for determinism. Vectors are integer-
    * quantized (see [[quantize]]) so the ranking is engine-reproducible.
    *
    * Scale shape: the q×N scoring work is brute force's inherent cost,
    * but the EXCHANGE is not — a window rank
    * (`row_number() OVER (PARTITION BY query_id)`) would shuffle every
    * scored pair (linear in corpus size: 80 MB at sf0.1, ~8 GB at
    * 100×); the [[graft.ops.agg.TopKHeapSim]] typed Aggregator admits
    * map-side into ≤k-element heaps and merges partials, so the shuffle
    * carries at most q×k rows per map partition regardless of N. Same
    * (sim DESC, cand_id ASC) total order as the window it replaced —
    * hash-identical output (ordering parity argued at the Aggregator).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    // norms are staged once PER SIDE before the join — cosine() inside the
    // join condition would recompute the query norm N times and each
    // candidate norm Q times (values identical: exact integer math)
    val q = broadcast(
      queries
        .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q_vec"))
        .withColumn("q_nrm", norm(col("q_vec")))
    )
    val c = corpus
      .select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("c_vec"))
      .withColumn("c_nrm", norm(col("c_vec")))
    val scored = c
      .join(q, col("query_id") =!= col("cand_id"))
      .withColumn("sim", dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")))
    heapTopKDesc(scored, "sim", k).withColumn("sim", round(col("sim"), 6))
  }

  /** Deterministic training-free coarse quantizer: the `nlist` lowest-id
    * corpus vectors, collected as floats then quantized driver-side with
    * the same floor(x*1000+0.5) rule as the plan-side vectors — so the
    * whole assignment + ranking pipeline downstream is exact integer math
    * (engine-neutral). `nlist × dim` longs must stay driver-small (they
    * are the model, not the data).
    */
  def sampleCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int
  ): Array[Seq[Long]] =
    corpus
      .orderBy(col(idCol))
      .limit(nlist)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))

  /** TRAINED coarse quantizer: fixed-iteration distributed Lloyd's k-means
    * over the quantized vectors, seeded by [[sampleCentroids]] (the
    * deterministic init). Each iteration is ONE Spark job with the
    * IVF assignment shape itself: a map-side nearest-centroid argmin
    * (distances to a broadcast literal centroid matrix, exact integer
    * squared-L2), then a single combine-friendly (cell, dim) aggregation
    * whose output is `nlist × dim` rows — the only thing collected, the
    * model, never the data. No mllib, no RDDs, no per-row UDF.
    *
    * Exactness: members' quantized coordinates are integers, so the cell
    * sums are order-independent; the new coordinate is
    * floor(sum/n + 0.5) — one correctly-rounded double division of exact
    * integers, bit-identical in any engine (the module's half-up
    * convention), so a SQL twin can replay training verbatim. Empty cells
    * keep their previous centroid (standard Lloyd's degenerate-cell rule),
    * deterministically. The iteration count is FIXED, not convergence-
    * tested: convergence thresholds reintroduce float comparisons and make
    * the oracle a moving target; at 100 TB each extra iteration is one
    * linear scan, so the caller budgets them explicitly.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int
  ): Array[Seq[Long]] = {
    require(iters >= 0, "iters must be >= 0")
    var cents = sampleCentroids(corpus, idCol, vecCol, nlist)
    val dim = if (cents.isEmpty) 0 else cents(0).length
    for (_ <- 1 to iters) {
      val cmat = typedLit(cents.map(_.toSeq).toSeq)
      val assigned = corpus
        .select(quantize(col(vecCol)).as("q"))
        .withColumn("__d", distancesTo(cmat, col("q")))
        .withColumn("cell", (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
        .drop("__d")
      // fence before the posexplode: `q` is a BUILT array (quantize) with a
      // single consumer — unfenced, the transform inlines into Generate and
      // re-evaluates per emitted element (dim× work per row; see PlanOps)
      val sums = graft.ops.PlanOps
        .fence(assigned)
        .select(col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        .select(
          col("cell"),
          col("pos"),
          floor(col("s").cast("double") / col("n").cast("double") + 0.5).cast("long").as("v"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      cents = cents.indices.map { cell =>
        val next = sums.getOrElse(cell, cents(cell))
        require(next.length == dim, s"cell $cell: dim drift ${next.length} vs $dim")
        next
      }.toArray
    }
    cents
  }

  /** Squared-L2 distances of `vec` to every row of the literal centroid
    * matrix `cmat` — the native kernel ([[graft.functions.ArrayL2SqAll]]);
    * ONE nested-array literal probed per row, so the plan stays small and
    * data-independent in shape regardless of the centroid set. Arithmetic
    * and per-entry nulls are identical to [[distancesToHof]], the HOF
    * formulation it replaced (parity spec-asserted in ArrayDistSpec).
    */
  private[ext] def distancesTo(cmat: Column, vec: Column): Column =
    call_function("graft_l2sq", cmat, vec)

  /** The built-in HOF formulation of [[distancesTo]] — kept as the
    * executable exactness contract the native kernel must match.
    */
  private[ext] def distancesToHof(cmat: Column, vec: Column): Column =
    transform(
      cmat,
      c =>
        aggregate(
          zip_with(vec, c, (x, y) => (x - y) * (x - y)),
          lit(0L),
          (acc, v) => acc + v
        )
    )

  /** PQ asymmetric-distance sum `Σ_j tbl[j][codes[j]]` — the native
    * kernel ([[graft.functions.ArrayAdcSum]]), evaluated once per
    * candidate pair in PQ/IVFPQ ranking. Identical to [[adcSumHof]]
    * (parity spec-asserted in ArrayDistSpec).
    */
  /** Per-query top-k of a scored candidate frame by (`simCol` DESC,
    * cand_id ASC) through the BOUNDED heap ([[graft.ops.agg.TopKHeapSim]])
    * — the shared ranking tail of every top-k server in this module. The
    * window formulation it replaced (`row_number() OVER (PARTITION BY
    * query_id ORDER BY sim DESC, cand_id)`) shuffles every scored
    * candidate to keep k: at audit grain (625 queries × the corpus at
    * sf0.1) that was 80 MB — linear in corpus size. The heap admits
    * map-side and merges partials, so the exchange carries ≤ q×k rows
    * per map partition. Identical total order → hash-identical output.
    */
  private[graft] def heapTopKDesc(scored: DataFrame, simCol: String, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(graft.ops.agg.TopKHeapSim.column(k)(col(simCol), col("cand_id").cast("long")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        col("col._2").as("cand_id"),
        (col("pos") + 1).as("rank"),
        col("col._1").as(simCol))

  /** [[heapTopKDesc]] for ASCENDING integer distances (the ADC/PQ order:
    * smallest distance first, candidate-id ties): rides the exact
    * (Long, Long) heap on the NEGATED pair — greatest (−adc, −cand_id)
    * is exactly (adc ASC, cand_id ASC) — so the integer distances never
    * touch a float on their way through the heap.
    */
  private def heapBottomKLong(scored: DataFrame, valCol: String, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(
        graft.ops.agg.TopKHeap
          .column(k)(-col(valCol), -col("cand_id").cast("long"))
          .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        (-col("col._2")).as("cand_id"),
        (col("pos") + 1).as("rank"),
        (-col("col._1")).as(valCol))

  private[ext] def adcSum(tbl: Column, codes: Column): Column =
    call_function("graft_adc", tbl, codes)

  /** The built-in HOF formulation of [[adcSum]] — the executable
    * exactness contract the native kernel must match.
    */
  private[ext] def adcSumHof(tbl: Column, codes: Column): Column =
    aggregate(
      zip_with(tbl, codes, (t, cd) => element_at(t, cd + 1)),
      lit(0L),
      (acc, v) => acc + v)

  /** IVF-style approximate nearest neighbors: a coarse quantizer assigns
    * every corpus vector to its nearest centroid (one cell id per vector,
    * computed map-side); each query probes its `nprobe` nearest cells and
    * ranks only those cells' members. The cell assignment shuffle is the
    * only corpus-wide movement — candidate volume is the probed cells'
    * population, not the corpus.
    *
    * The coarse quantizer is model state by nature. Pass `trainIters = 0`
    * for the training-free deterministic sample ([[sampleCentroids]],
    * FAISS's `nlist`-sample shape) or `> 0` for fixed-iteration Lloyd's
    * training ([[kmeansCentroids]]) — same serving plan either way, the
    * trained centroids just partition the space better (higher recall at
    * equal nprobe; audited in SimilaritySpec).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      nprobe: Int,
      k: Int,
      trainIters: Int = 0
  ): DataFrame = {
    require(nprobe <= nlist, "nprobe must be <= nlist")
    val centroids: Array[Seq[Long]] =
      if (trainIters == 0) sampleCentroids(corpus, idCol, vecCol, nlist)
      else kmeansCentroids(corpus, idCol, vecCol, nlist, trainIters)
    // a corpus smaller than nlist yields fewer centroids; probing cells that
    // don't exist would zip_with null-padded distances and silently drop
    // neighbors, so clamp the cell count to what was actually collected
    val cells = centroids.length
    val probes = math.min(nprobe, cells)

    // the distance array is staged as an attribute before the argmin so it
    // evaluates once (SCALING.md expression staging)
    val cmat = typedLit(centroids.map(_.toSeq).toSeq)
    def distances(vec: Column): Column = distancesTo(cmat, vec)

    val c = corpus
      .select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("c_vec"))
      .withColumn("c_nrm", norm(col("c_vec")))
      .withColumn("__d", distances(col("c_vec")))
      .withColumn("cell", (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .drop("__d")

    // query side: nprobe nearest cells via sorting (distance, idx) structs;
    // the query norm is staged BEFORE the probe explode (once per query,
    // not once per probed cell or candidate pair)
    val q = broadcast(
      queries
        .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q_vec"))
        .withColumn("q_nrm", norm(col("q_vec")))
        .withColumn("__d", distances(col("q_vec")))
        .withColumn(
          "cell",
          explode(
            slice(
              transform(
                array_sort(
                  zip_with(col("__d"), sequence(lit(0), lit(cells - 1)), (d, i) => struct(d.as("d"), i.as("i")))
                ),
                s => s.getField("i")
              ),
              1,
              probes
            )
          )
        )
        .drop("__d")
    )

    // NO dedupe stage: a candidate carries exactly ONE cell (the argmin is
    // scalar) and a query's probed cells are distinct by construction, so
    // each (query_id, cand_id) pair surfaces at most once from the cell
    // join — the dropDuplicates this replaced was a defensive no-op that
    // cost a full candidate-grain exchange
    val scored = c
      .join(q, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("sim", dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")))
    heapTopKDesc(scored, "sim", k).withColumn("sim", round(col("sim"), 6))
  }

  /** IVFPQ: FAISS's serving composition of the two halves built above —
    * the coarse quantizer prunes candidates to `nprobe` cells
    * ([[ivfTopK]]'s shape) and the fine ranking is PQ asymmetric distance
    * ([[pqAdcTopK]]'s shape) instead of full-vector dots. The corpus-side
    * index row is (cell, codes, id): nsub+1 small ints per vector — the
    * layout a billion-vector index actually stores. One corpus pass
    * computes cell AND codes map-side; the only corpus-wide movement is
    * the (small) cell-key shuffle of that compressed row.
    *
    * Ranking is by ADC distance (ascending, candidate-id ties) over the
    * probed cells' members only. Same exactness contract as both halves:
    * integer distances, first-min tie rule, engine-replayable.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Seq[Long]],
      nprobe: Int,
      books: Array[Array[Seq[Long]]],
      k: Int
  ): DataFrame = {
    val cells = coarse.length
    val probes = math.min(nprobe, cells)
    val nsub = books.length
    val dsub = books(0)(0).length
    val cmat = typedLit(coarse.map(_.toSeq).toSeq)
    val pm = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val c = ivfPqIndexFrame(corpus, idCol, vecCol, coarse, books)
    val q = broadcast(
      queries
        .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q"))
        .withColumn("__d", distancesTo(cmat, col("q")))
        .withColumn(
          "tbl",
          transform(
            sequence(lit(0), lit(nsub - 1)),
            j => distancesTo(element_at(pm, j + 1), slice(col("q"), j * dsub + 1, lit(dsub)))))
        .withColumn(
          "cell",
          explode(
            slice(
              transform(
                array_sort(
                  zip_with(col("__d"), sequence(lit(0), lit(cells - 1)), (d, i) => struct(d.as("d"), i.as("i")))
                ),
                s => s.getField("i")
              ),
              1,
              probes
            )
          )
        )
        .select(col("query_id"), col("cell"), col("tbl")))
    // no dedupe: one cell per candidate × distinct probed cells ⇒ each
    // (query_id, cand_id) pair is unique off the cell join (see ivfTopK)
    val scored = c
      .join(q, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc", adcSum(col("tbl"), col("codes")))
    heapBottomKLong(scored, "adc", k)
  }

  /** The IVFPQ serving-index frame: (cand_id, cell, codes) — one corpus
    * pass, map-side coarse assignment AND PQ coding. This is what
    * [[ivfPqTopK]] computes inline and what [[persistAnnIndex]] stores.
    */
  def ivfPqIndexFrame(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Seq[Long]],
      books: Array[Array[Seq[Long]]]
  ): DataFrame = {
    val nsub = books.length
    val nlistSub = books(0).length
    val dsub = books(0)(0).length
    val cmat = typedLit(coarse.map(_.toSeq).toSeq)
    val pm = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    def pqCode(j: Column): Column = {
      val d = distancesTo(element_at(pm, j + 1), slice(col("q"), j * dsub + 1, lit(dsub)))
      element_at(
        array_sort(
          zip_with(d, sequence(lit(0), lit(nlistSub - 1)), (dd, ii) => struct(dd.as("d"), ii.as("i")))),
        1
      ).getField("i").cast("int")
    }
    corpus
      .select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("q"))
      .withColumn("__d", distancesTo(cmat, col("q")))
      .withColumn("cell", (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .withColumn("codes", transform(sequence(lit(0), lit(nsub - 1)), pqCode(_)))
      .select(col("cand_id"), col("cell"), col("codes"))
  }

  /** LAYOUT TIME — persist the IVFPQ serving index bucketed by `cell`.
    * The stored row is (cand_id, cell, codes): nsub+1 small ints per
    * vector. A BROADCASTABLE query set never needs this (the cell join
    * broadcasts the queries; the index side never shuffles anyway) — the
    * layout pays off for BATCH SCORING, where the query frame is itself
    * large: both sides then shuffle-join on cell, and the bucketed index
    * side plans exchange-free ([[scoreAgainstAnnIndex]]).
    */
  def persistAnnIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Seq[Long]],
      books: Array[Array[Seq[Long]]],
      table: String,
      buckets: Int,
      era: Long = 0L
  ): Unit = {
    // a fresh build starts a fresh retraction history: leftover tombstones
    // from a previous fixture/epoch under the same name would silently
    // over-delete the new content (observed risk: tableOnce rebuilds across
    // sf keys appended into a stale tomb table) — and a fresh VERSION
    // history: published __v<N> versions would otherwise keep outranking
    // the new bare table at serving resolution
    corpus.sparkSession.sql(s"DROP TABLE IF EXISTS `${tombTable(table)}`")
    resetVersions(corpus.sparkSession, table)
    graft.sources.Sources.writeBucketed(
      ivfPqIndexFrame(corpus, idCol, vecCol, coarse, books).withColumn("seq", lit(era)),
      table, buckets, "cell")
  }

  /** MAINTENANCE — append new vectors to a [[persistAnnIndex]] table,
    * encoded with the FITTED model (the memoized coarse/books — no
    * retrain, no rebuild): one map-side coding pass over the incoming
    * batch, one bucketed append. The correctness contract is
    * result-equivalence: under a pinned model, append-then-probe must
    * equal one-shot-rebuild-then-probe exactly (the driver's
    * ann_index_append oracle checks precisely that), because cell and
    * codes are per-row functions of the model alone. The LSH text index's
    * cycle ([[Dedup.appendLshIndex]]) is the precedent. Model drift is
    * the trade — audit it with [[pqQuantError]] before trusting an aged
    * model on shifted data.
    */
  def appendAnnIndex(
      incoming: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Seq[Long]],
      books: Array[Array[Seq[Long]]],
      table: String,
      buckets: Int,
      era: Long = nextEra()
  ): Unit =
    graft.sources.Sources.appendBucketed(
      ivfPqIndexFrame(incoming, idCol, vecCol, coarse, books).withColumn("seq", lit(era)),
      servingTable(incoming.sparkSession, table), buckets, "cell")

  /** The tombstone companion table of a persisted index — one
    * (`cand_id`, `tomb_seq`) row per retraction, model/metadata-sized
    * (takedown scale, never corpus scale). `tomb_seq` is the retraction's
    * ERA: the tombstone hides index rows of that id whose append era is
    * ≤ `tomb_seq`, so a LATER re-append of the same id is visible
    * immediately — delete-then-reappend composes without waiting for a
    * compaction (the reference-rooted contract: J4's retraction composes
    * with new arrivals, chicago/permit_cleaning.py:838-883).
    */
  private[graft] def tombTable(table: String): String = table + "_tomb"

  /** Companion-table names of a capped index's QUARANTINE side (the
    * banded rows a layout cap dropped, persisted for bounded recovery —
    * [[Multimodal.quarantineHammingIndex]]) and its sweep WATERMARK (one
    * row: how far the bounded sweep has progressed through the
    * quarantined buckets, plus the bucket total the policy census reads).
    * Logical-name scoped like [[tombTable]]: the quarantine outlives
    * version publications (a rebuild re-decides it explicitly).
    */
  private[graft] def quarTable(table: String): String = table + "_quar"
  private[graft] def quarWmTable(table: String): String = table + "_quar_wm"

  // ---- shared quarantine-sweep core ------------------------------------
  // One definition of the recovery side's state machinery for every
  // capped banded family (Hamming fingerprints over (band, bv), text LSH
  // over (band, bh)): watermark read/write/reset, the tombstone-filtered
  // live view, and the bounded tick's bucket selection. The family
  // operators ([[Multimodal.sweepHammingQuarantine]],
  // [[Dedup.sweepLshQuarantine]]) own only their banding and their
  // verify step — the cap doctrine is shared, so its recovery is too.

  /** Driver-side MIRROR of the persisted sweep watermark, keyed by the
    * watermark table name. Single-writer discipline holds per table within
    * a JVM (the scheduled executor's one-action-per-table guard; the batch
    * sweep loops are single-threaded), and every write goes through
    * [[quarWmWrite]], so the mirror is coherent — it exists so the
    * per-tick progress READ is a map lookup instead of a 1-row table scan
    * job (r21 verdict item 4). The TABLE stays the durable source of
    * truth: the policy census scans it, and a fresh JVM reads it cold
    * through the fallback below.
    */
  private val wmMirror =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** `(swept_through, quar_buckets)` of a logical index's sweep watermark;
    * (0, 0) when the index has no quarantine side.
    */
  private[ext] def quarWatermark(
      s: org.apache.spark.sql.SparkSession, table: String): (Long, Long) = {
    val wmT = quarWmTable(table)
    wmMirror.get(wmT) match {
      case null =>
        if (s.catalog.tableExists(wmT)) {
          val r = s.table(wmT).collect().head
          val v = (r.getAs[Long]("swept_through"), r.getAs[Long]("quar_buckets"))
          wmMirror.put(wmT, v)
          v
        } else (0L, 0L)
      case v => v
    }
  }

  private[ext] def quarWmWrite(
      s: org.apache.spark.sql.SparkSession, table: String, swept: Long, total: Long): Unit = {
    val wmT = quarWmTable(table)
    val df = s.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(swept, total)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "swept_through", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(
          "quar_buckets", org.apache.spark.sql.types.LongType))))
    // maintenance-epoch metadata with a single scheduled writer (the
    // sweep action runs under applyMaintenancePlan's one-action-per-table
    // guard): an in-place INSERT OVERWRITE replaces the data files without
    // the DROP + CREATE catalog churn the old drop-and-replace paid per
    // tick; the first write still creates the table.
    if (s.catalog.tableExists(wmT)) {
      df.write.mode("overwrite").insertInto(wmT)
      // the census reads the table through whatever session planned it —
      // keep relation/file-listing caches honest after the rewrite
      s.catalog.refreshTable(wmT)
    } else {
      graft.sources.Sources.dropStaleLocation(s, wmT)
      df.write.format("parquet").saveAsTable(wmT)
    }
    wmMirror.put(wmT, (swept, total))
  }

  /** Begin a fresh sweep PASS: watermark to zero, bucket total
    * re-snapshotted from the quarantine under the family's bucket keys.
    */
  private[ext] def quarReset(
      s: org.apache.spark.sql.SparkSession, table: String, bucketKeys: Seq[String]): Unit = {
    val qT = quarTable(table)
    require(s.catalog.tableExists(qT), s"index '$table' has no quarantine side to sweep")
    // a reset begins a fresh pass over possibly-new quarantine content:
    // drop the pass's rank snapshot and re-rank (the snapshot's length IS
    // the bucket total the watermark records — one scan serves both)
    rankMirror.remove(qT)
    val total = quarRankedBuckets(s, table, bucketKeys).size.toLong
    quarWmWrite(s, table, swept = 0L, total = total)
  }

  /** Per-PASS snapshot of the quarantine's ranked bucket list (membership
    * DESC, then bucket keys — the sweep order). Ranks are constant between
    * re-quarantine points, and every quarantine-content writer calls
    * [[quarReset]] (spec-pinned), which invalidates this — so within one
    * sweep pass the ranking is computed ONCE instead of re-windowed per
    * tick. Bucket-census grain (at most corpus/cap buckets, in practice
    * few), never the member grain, so the driver-side snapshot is
    * fleet-metadata-sized.
    */
  private val rankMirror =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[org.apache.spark.sql.Row]]()

  private[ext] def quarRankedBuckets(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      bucketKeys: Seq[String]): Seq[org.apache.spark.sql.Row] =
    rankMirror.computeIfAbsent(quarTable(table), { qT =>
      s.table(qT)
        .groupBy(bucketKeys.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc +: bucketKeys.map(col): _*)
        .select(bucketKeys.map(col): _*)
        .collect()
        .toSeq
    })

  /** The live rows of a persisted quarantine: the stored drops minus the
    * index's era-qualified tombstones — the same anti-join contract as
    * the serving scan, because a takedown hides an id wherever its rows
    * live, stored or quarantined.
    */
  private[ext] def quarLive(
      s: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val quar = s.table(quarTable(table))
    val tomb = tombTable(table)
    if (s.catalog.tableExists(tomb)) {
      val t = s.table(tomb)
      quar.join(
        broadcast(t),
        quar("corpus_id") === t("corpus_id") && quar("seq") <= t("tomb_seq"),
        "left_anti")
    } else quar
  }

  /** The next bounded tick's `(swept, hi, total)` range — a pure READ of
    * the watermark (mirror-backed, no job). The caller COMMITS the advance
    * via [[quarTickCommit]] only after the tick's output is durably
    * written: a tick that dies mid-write leaves the watermark unmoved and
    * the next tick re-covers the same bucket range (at-least-once; the
    * sweep sinks are consumed through `distinct()`, so a replayed pair
    * cannot change any result). The advance-before-execute shape this
    * replaces could silently skip a failed tick's buckets forever
    * (r20 verdict item 1).
    */
  private[ext] def quarTickRange(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      maxBucketsPerTick: Int
  ): (Long, Long, Long) = {
    require(maxBucketsPerTick > 0, "sweep ticks must make progress: maxBucketsPerTick >= 1")
    require(
      s.catalog.tableExists(quarTable(table)),
      s"index '$table' has no quarantine side to sweep")
    val (swept, total) = quarWatermark(s, table)
    (swept, math.min(swept + maxBucketsPerTick, total), total)
  }

  /** Commit one tick: advance the persisted watermark to `hi`. */
  private[ext] def quarTickCommit(
      s: org.apache.spark.sql.SparkSession, table: String, hi: Long, total: Long): Unit =
    quarWmWrite(s, table, swept = hi, total = total)

  /** The bucket-key set of ranks `(lo, hi]` in sweep rank order:
    * membership DESC — the regrowth-heaviest boilerplate first — then the
    * bucket keys for determinism; ranks are stable because the quarantine
    * changes only at re-quarantine points, which reset the watermark. The
    * slice comes off the pass's rank SNAPSHOT ([[quarRankedBuckets]]) as a
    * local relation, so a tick costs a broadcast of ≤ `maxBucketsPerTick`
    * key rows instead of a window re-ranking the bucket census per tick
    * (the old per-tick window was the measured cost floor of the sweep
    * loops at fixture scale).
    */
  private[ext] def quarBucketsAt(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      bucketKeys: Seq[String],
      lo: Long,
      hi: Long
  ): DataFrame = {
    val ranked = quarRankedBuckets(s, table, bucketKeys)
    val slice = ranked.slice(lo.toInt, hi.toInt)
    val schema = org.apache.spark.sql.types.StructType(
      s.table(quarTable(table)).select(bucketKeys.map(col): _*).schema)
    s.createDataFrame(java.util.Arrays.asList(slice: _*), schema)
  }

  /** Strictly-increasing era stamp for index maintenance operations:
    * wall-clock anchored (so independently-restarted maintenance JVMs
    * still order correctly at takedown timescales) and monotonic within
    * the JVM (so probe→append→delete inside one micro-batch orders even
    * under a frozen clock). Era VALUES never appear in query results —
    * only their relative order carries meaning — so auto-stamped eras
    * keep every probe output deterministic.
    */
  private val eraCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  def nextEra(): Long =
    eraCounter.updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis()))

  /** Resolve the SERVING physical table of a logical index name: the
    * highest published version `<table>__v<N>` if any rebuild has run,
    * else the bare `<table>`. [[rebuildAnnIndex]] publishes a fully-built
    * version with one atomic catalog RENAME and retires only versions two
    * generations back, so a reader that resolved here keeps a physical
    * table whose files never move for at least one full rebuild cycle —
    * no missing-table window, no mixed-era reads (the drop-then-rename
    * swap this replaces had both).
    */
  private[graft] def servingTable(s: org.apache.spark.sql.SparkSession, table: String): String =
    servingVersion(s, table) match {
      case 0 => table
      case n => s"${table}__v$n"
    }

  private val VersionSuffix = "__v(\\d+)$".r

  /** JVM-scoped memo of the resolved serving VERSION per logical index
    * name (keyed db-qualified; all sessions of one JVM share the external
    * catalog, so one memo serves them all). Version resolution otherwise
    * LISTS the catalog with a pattern per call — a metadata scan per
    * probe, hundreds of times per session. The memo is invalidated by the
    * only two version-history writers ([[publishVersion]],
    * [[resetVersions]]), and a memoized version N ≥ 1 is trust-but-verify
    * (one exact-name `tableExists`, an O(1) catalog lookup) so an
    * out-of-band drop of the memoized version degrades to a recompute,
    * never a missing-table read. A probe that resolves version N−1
    * concurrently with a publish is the documented reader grace, not
    * staleness.
    *
    * The recompute path inserts via `computeIfAbsent`, which is ATOMIC
    * against the writers' `remove`: either the invalidation lands first
    * and the compute lists the post-publish catalog, or the compute's
    * (possibly stale) value is inserted first and the invalidation
    * removes it — a plain get-then-put would let a resolution that
    * STARTED before a publish re-install the pre-publish version after
    * the invalidation, and that stale value would then pass
    * trust-but-verify forever (the grace version keeps existing) and
    * derail the NEXT publish's version arithmetic.
    *
    * SCOPE: the memo assumes version-history writers share this JVM's
    * catalog — the single-writer posture the whole lifecycle already
    * assumes (the in-memory catalog is JVM-local, so an out-of-JVM
    * publisher is invisible to a fresh LISTING too, memo or no memo). A
    * deployment on a shared external metastore with out-of-band
    * publishers sets `spark.graft.index.versionMemo.enabled=false`
    * (session conf, read per resolution): the kill switch drops straight
    * to a fresh catalog listing per call, so a catalog-restore or
    * external publisher is visible immediately — the escape hatch costs
    * only the metadata scan the memo was built to amortize.
    */
  private val versionMemo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def memoKey(s: org.apache.spark.sql.SparkSession, table: String): String =
    s.sessionState.catalog.getCurrentDatabase + "." + table

  private def invalidateVersionMemo(s: org.apache.spark.sql.SparkSession, table: String): Unit = {
    versionMemo.remove(memoKey(s, table)): Unit
  }

  /** A FRESH `persist*Index` build under a logical name is a new
    * authority epoch: it must retire any published versions of that name,
    * or the split-brain follows — the persist writes the BARE table while
    * append/census/live keep resolving the highest `__v<N>` (stale
    * content). Every index family's persist calls this beside its
    * tombstone-history reset — fresh build ⇒ fresh retraction history ⇒
    * fresh version history.
    */
  private[graft] def resetVersions(s: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val cur = servingVersion(s, table)
    (1 to cur).foreach(v => s.sql(s"DROP TABLE IF EXISTS `${table}__v$v`"))
    // fresh build ⇒ fresh version history INCLUDING any abandoned build
    // stage a killed rebuild left behind — otherwise the orphan would
    // carry a version number the fresh epoch will re-mint
    dropAbandonedBuilds(s, table)
    invalidateVersionMemo(s, table)
  }

  private[graft] val VersionMemoEnabledKey = "spark.graft.index.versionMemo.enabled"

  private def listedVersion(s: org.apache.spark.sql.SparkSession, table: String): Int = {
    val db = s.sessionState.catalog.getCurrentDatabase
    s.sessionState.catalog
      .listTables(db, s"${table}__v*")
      .flatMap(t => VersionSuffix.findFirstMatchIn(t.table).map(_.group(1).toInt))
      .sorted.lastOption.getOrElse(0)
  }

  private[graft] def servingVersion(s: org.apache.spark.sql.SparkSession, table: String): Int = {
    // kill switch for shared-metastore deployments: bypass the memo (and
    // drop any cached entry, so re-enabling starts clean) and list fresh
    if (!s.conf.get(VersionMemoEnabledKey, "true").toBoolean) {
      versionMemo.remove(memoKey(s, table)): Unit
      return listedVersion(s, table)
    }
    val key = memoKey(s, table)
    val memo = versionMemo.get(key)
    if (memo != null && (memo.intValue == 0 || s.catalog.tableExists(s"${table}__v$memo")))
      memo.intValue
    else {
      // failed trust-but-verify: retire exactly the entry we read (the
      // value-qualified remove never clobbers a concurrent writer's state)
      if (memo != null) versionMemo.remove(key, memo): Unit
      versionMemo.computeIfAbsent(key, _ => Integer.valueOf(listedVersion(s, table))).intValue
    }
  }

  /** MAINTENANCE — the delete/retract half of the [[appendAnnIndex]]
    * cycle: record the retracted ids in the index's tombstone table, and
    * every probe anti-joins them out before ranking. The index files are
    * untouched (no bucket rewrite on the takedown path); the tombstone
    * side rides a BROADCAST anti-join, so the index scan keeps its
    * bucketed, exchange-free layout. The correctness contract mirrors the
    * append contract: delete-then-probe must equal
    * rebuild-without-deleted-then-probe exactly (the driver's
    * ann_index_delete oracle checks precisely that). Accumulated
    * tombstones are folded into the files by [[compactAnnIndex]].
    *
    * This is the engine twin of the reference's signature retraction
    * join — the J4 anti-dedupe that removes already-uploaded rows from a
    * new batch (chicago/permit_cleaning.py:838-883) — applied to the
    * serving index instead of the upload frame.
    *
    * ERA-AWARE: the tombstone is stamped with `era` and hides only index
    * rows appended at era ≤ `era` (delete is "remove this id's rows AS OF
    * now"). A later re-append of the same id lands at a higher era and is
    * visible immediately — no forced compaction between a takedown
    * reversal and its re-crawl.
    */
  def deleteFromAnnIndex(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      ids: DataFrame,
      idCol: String,
      era: Long = nextEra()
  ): Unit = {
    graft.sources.Sources.dropStaleLocation(s, tombTable(table))
    ids
      .select(col(idCol).cast("long").as("cand_id"), lit(era).as("tomb_seq"))
      .distinct()
      .write
      .mode("append")
      .format("parquet")
      .saveAsTable(tombTable(table))
  }

  /** The live rows of a persisted ANN index: the serving version's
    * bucketed scan minus its era-qualified tombstones (broadcast anti-join
    * on id with the `seq ≤ tomb_seq` era condition riding the same
    * broadcast — the index side's bucketed output partitioning survives,
    * PlanAuditSpec-asserted). No tombstone table ⇒ the bare scan,
    * byte-identical plan to the pre-delete era.
    */
  private def annIndexLive(s: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val idx = s.table(servingTable(s, table))
    if (s.catalog.tableExists(tombTable(table))) {
      val tomb = s.table(tombTable(table))
      idx.join(
        broadcast(tomb),
        idx("cand_id") === tomb("cand_id") && idx("seq") <= tomb("tomb_seq"),
        "left_anti")
    } else idx
  }

  /** Collapse a healed compaction rewrite to ONE era — the maximum LIVE
    * era, so no row becomes "newer" than the newest real append. Shared
    * by all four families' compacts. Compaction is an ERA HORIZON: its
    * tombstones are folded and retired with it, so an explicit-era
    * retraction dated BEFORE the compaction is spent (as-of-past deletes
    * do not reach across a compaction epoch — the rows it would have
    * hidden were either folded out or re-authorized by the rewrite), and
    * the post-compact census reads a single append era. That census
    * reset is load-bearing for the maintenance policy: an eras-triggered
    * compact that did NOT collapse eras would re-trigger on every
    * subsequent plan — the fixed point `index_maintenance_fixpoint`
    * witnesses depends on this. The max is one driver-side Long
    * (model-scale), at the cost of a SECOND streaming pass over the
    * healed frame (the agg, then the rewrite) — deliberately NOT
    * persisted/cached: at compaction scale the healed frame is the whole
    * index, and two streaming passes beat pinning it in executor memory.
    */
  private[graft] def collapsedToMaxEra(healed: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val maxEra = healed
      .agg(coalesce(max(col("seq")), lit(0L)))
      .collect()(0).getLong(0)
    healed.withColumn("seq", lit(maxEra))
  }

  /** MAINTENANCE — fold the tombstones into the files and merge each
    * bucket's accumulated append file-sets back to one file per bucket,
    * WITHOUT changing the bucket hashing (the exchange-free probe
    * property survives — asserted in PlanAuditSpec). Needed after enough
    * [[appendAnnIndex]]/[[deleteFromAnnIndex]] cycles: each append adds
    * `buckets` more files (listing + open cost grows per cycle) and each
    * delete grows the anti-join's broadcast. Probe results are
    * hash-identical before/after — compaction is layout, not meaning;
    * surviving rows collapse to the newest live era
    * ([[collapsedToMaxEra]]), so the era census heals with the layout.
    */
  def compactAnnIndex(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      buckets: Int
  ): Unit = {
    // minted BEFORE the live snapshot: a takedown recorded during the
    // rewrite carries tomb_seq >= horizon and survives the retirement
    // ([[retireTombstonesBelow]] — the publication-side era-split shared)
    val horizon = nextEra()
    // content dedup keeping the HIGHEST era: an OVERLAPPING append
    // (at-least-once foreachBatch retry) stores a row twice with identical
    // (cand_id, cell, codes) but distinct auto-eras — semantically inert at
    // probe time (TopKHeap's set semantics hold the pair once) but index
    // bloat; compaction is the healing point. max(seq) keeps the survivor
    // deterministic AND maximally visible against any future explicit-era
    // tombstone. Distinct ids with different codes are distinct rows.
    val live = annIndexLive(s, table)
    graft.sources.Sources.compactBucketed(
      s, servingTable(s, table), buckets, Seq("cell"),
      collapsedToMaxEra(
        live.groupBy(col("cand_id"), col("cell"), col("codes"))
          .agg(max(col("seq")).as("seq"))
          .select(col("cand_id"), col("cell"), col("codes"), col("seq"))))
    // the rewrite materialized the anti-join — retire the applied
    // tombstones, preserving any recorded during the rewrite window
    retireTombstonesBelow(s, table, horizon)
  }

  /** MAINTENANCE — blue/green REBUILD, the staleness loop's last arc:
    * when [[pqQuantError]] says the aged model no longer fits the corpus
    * (append-only maintenance under a pinned model can only drift), build
    * the retrained index ASIDE — serving reads are untouched while the
    * full-corpus encode runs — then PUBLISH it as the next serving
    * version.
    *
    * PROBE-SAFE publication on a plain (non-transactional) catalog:
    * versions are immutable physical tables `<table>__v<N>`; the build
    * stages under `<table>__v<N>__build` (never resolved by readers) and
    * publication is ONE catalog RENAME `__build → __v<N>` — a reader's
    * [[servingTable]] resolution sees either version N−1 or N, never a
    * missing name and never a half-written table. The previous version is
    * RETIRED ONLY ON THE NEXT REBUILD (grace of one full rebuild cycle —
    * full-corpus encodes take far longer than any probe), so a probe that
    * resolved the old version keeps files that never move. The bucket
    * spec is catalog metadata and survives the rename — post-publish
    * probes still plan exchange-free (spec-asserted).
    *
    * The new version's rows are stamped at a FRESH era, so tombstones
    * accumulated against the old version (lower eras) cannot hide any
    * re-crawled id in it — the tombstone drop afterwards is hygiene, not
    * a correctness window.
    */
  def rebuildAnnIndex(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Seq[Long]],
      books: Array[Array[Seq[Long]]],
      buckets: Int
  ): Unit =
    // persistAnnIndex drops tombTable(bld) — a no-op companion; the real
    // tombstones (keyed by the LOGICAL name) stay live for current readers
    publishVersion(s, table)((bld, era) =>
      persistAnnIndex(corpus, idCol, vecCol, coarse, books, bld, buckets, era = era))

  /** The versioned-publication machinery behind every index REBUILD,
    * shared by all four persisted-index families (IVFPQ vector, LSH text,
    * semantic cell, Hamming fingerprint) so the probe-safety argument is
    * proved once: `build` writes a complete index under the staging name
    * it is given (`<table>__v<N>__build`, never resolved by readers) at
    * the era it is given (minted HERE, before the build starts),
    * publication is ONE catalog RENAME to `<table>__v<N>`, and versions
    * two generations back retire. A concurrent [[servingTable]]
    * resolution sees version N−1 or N — never a missing name, never a
    * half-written table.
    *
    * Tombstone handling is ERA-SPLIT, not a blanket drop: retractions
    * recorded BEFORE the build era are inert against the new version
    * (its rows carry `seq = era > tomb_seq`) and are purged as hygiene,
    * but a takedown recorded DURING the build window (full-corpus
    * encodes are the longest maintenance op) carries `tomb_seq > era`
    * and MUST survive publication — the build's corpus snapshot predates
    * it, so only the tombstone hides the retracted id in the new
    * version. The survivor rewrite stages through `<tomb>__keep` and
    * republishes under the tombstone name (same rename doctrine).
    */
  /** JVM-local registry of build stages currently INSIDE a
    * [[publishVersion]] call — the ground truth that separates an
    * in-flight stage from an ABANDONED one (a rebuild killed between
    * staging and publication leaves a fully-written `__v<N>__build`
    * table that nothing resolves and nothing cleans). Same single-JVM
    * posture as the version memo: the in-memory catalog where a crashed
    * OTHER JVM's stage would live dies with that JVM (only its
    * directory leaks, which dropStaleLocation already reaps at the next
    * build), so within the catalog's lifetime this set is exact.
    */
  private val inFlightBuilds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The ABANDONED build stages of a logical index: catalog tables named
    * `<table>__v<N>__build` with no [[publishVersion]] call currently
    * driving them. Storage-leak pressure for the maintenance policy
    * ([[Maintenance.indexCensus]]'s `stale_builds`; the `janitor`
    * decision drops them). Catalog-state derived, so spec-pinned rather
    * than oracle-checked — the [[Maintenance.filesPerBucket]] precedent.
    */
  private[graft] def abandonedBuilds(
      s: org.apache.spark.sql.SparkSession, table: String): Seq[String] = {
    val db = s.sessionState.catalog.getCurrentDatabase
    val stageRe = (java.util.regex.Pattern.quote(table) + "__v\\d+__build$").r
    s.sessionState.catalog
      .listTables(db, s"${table}__v*__build")
      .map(_.table)
      .filter(t => stageRe.pattern.matcher(t).matches())
      .filterNot(t => inFlightBuilds.contains(s"$db.$t"))
  }

  /** Drop a logical index's abandoned build stages — the executor arc
    * behind the policy's `janitor` decision. Idempotent; never touches a
    * stage registered in-flight.
    */
  private[graft] def dropAbandonedBuilds(
      s: org.apache.spark.sql.SparkSession, table: String): Unit =
    abandonedBuilds(s, table).foreach(t => s.sql(s"DROP TABLE IF EXISTS `$t`"))

  private[graft] def publishVersion(
      s: org.apache.spark.sql.SparkSession,
      table: String
  )(build: (String, Long) => Unit): Unit = {
    val cur = servingVersion(s, table)
    val next = s"${table}__v${cur + 1}"
    val bld = next + "__build"
    val era = nextEra()
    // registered from first write THROUGH the rename (not merely the
    // build call): a concurrently-running census must not flag a LIVE
    // stage as abandoned, and a concurrent janitor must not drop it in
    // the instant between build completion and publication
    val bldKey = s.sessionState.catalog.getCurrentDatabase + "." + bld
    inFlightBuilds.add(bldKey)
    try {
      build(bld, era)
      // a prior JVM's leftover __v<N+1> DIRECTORY (its in-memory catalog
      // died with it, so servingVersion cannot see the version) would make
      // the RENAME refuse the target location — same stale-location doctrine
      // as writeBucketed: a location the catalog doesn't own is garbage
      graft.sources.Sources.dropStaleLocation(s, next)
      s.sql(s"ALTER TABLE `$bld` RENAME TO `$next`") // atomic publication
    } finally inFlightBuilds.remove(bldKey): Unit
    // invalidate BEFORE retiring old generations: a resolution between the
    // rename and here reads the memoized N−1 (the reader grace set, which
    // survives this publication); after here it recomputes N
    invalidateVersionMemo(s, table)
    retireTombstonesBelow(s, table, era)
    // retire generations ≤ cur−1; version cur stays as the reader grace set
    (1 until cur).foreach(v => s.sql(s"DROP TABLE IF EXISTS `${table}__v$v`"))
    if (cur >= 1) s.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  /** Retire tombstone entries recorded BEFORE `horizon`, preserving the
    * later ones — the ERA-SPLIT shared by the two maintenance rewrites
    * (version publication and compaction). An entry with
    * `tomb_seq >= horizon` was recorded during or after the rewrite's
    * corpus/live snapshot (which therefore predates the takedown): only
    * the tombstone hides that id in the rewritten table, so it MUST
    * survive — a blanket drop would silently resurrect a mid-rewrite
    * takedown (the publication side learned this in r18; compaction
    * inherits the same split in r19, since a compact's live snapshot is
    * materialized well before its tombstone retirement on a large
    * index). Entries below the horizon are folded/outranked and purge as
    * hygiene. The survivor rewrite stages through `<tomb>__keep` under
    * the same rename doctrine as publication; a delete landing inside
    * that staging window is the residual metadata-speed race both
    * rewrites share — orders of magnitude narrower than the full-rewrite
    * window this split closes.
    */
  private[graft] def retireTombstonesBelow(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      horizon: Long
  ): Unit = {
    val tomb = tombTable(table)
    if (s.catalog.tableExists(tomb)) {
      val late = s.table(tomb).filter(col("tomb_seq") >= horizon)
      if (late.isEmpty) s.sql(s"DROP TABLE IF EXISTS `$tomb`")
      else {
        val keep = tomb + "__keep"
        s.sql(s"DROP TABLE IF EXISTS `$keep`")
        graft.sources.Sources.dropStaleLocation(s, keep)
        late.write.format("parquet").saveAsTable(keep)
        s.sql(s"DROP TABLE IF EXISTS `$tomb`")
        s.sql(s"ALTER TABLE `$keep` RENAME TO `$tomb`")
      }
    }
  }

  /** STALENESS SIGNAL — the PQ quantization error of an ALREADY-quantized
    * vector under fitted codebooks: Σ over subspaces of the minimum exact
    * integer squared-L2 distance from the slice to its codebook (the
    * distance the assigned code achieves, since coding is argmin).
    * Map-only, model as literals. Rising mean error on appended batches
    * vs the training-time population is the "retrain the quantizer"
    * signal an aging [[appendAnnIndex]] index emits — quantization error
    * bounds ADC ranking fidelity.
    */
  def pqQuantError(qCol: Column, books: Array[Array[Seq[Long]]]): Column = {
    val dsub = books(0)(0).length
    books.indices
      .map { j =>
        array_min(
          distancesTo(
            typedLit(books(j).map(_.toSeq).toSeq),
            slice(qCol, j * dsub + 1, dsub)))
      }
      .reduce(_ + _)
  }

  /** QUERY TIME, batch form — score a LARGE query frame (too big to
    * broadcast) against a [[persistAnnIndex]] table: each query row
    * carries its nprobe probed cells and its ADC table (nsub·nlist
    * integers), shuffles on the cell key, and sort-merge-joins the
    * bucketed index with NO exchange on the index side. Ranking semantics
    * identical to [[ivfPqTopK]].
    */
  def scoreAgainstAnnIndex(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Seq[Long]],
      books: Array[Array[Seq[Long]]],
      nprobe: Int,
      k: Int
  ): DataFrame =
    scoreAgainstAnnIndexWhere(s, table, queries, idCol, vecCol, coarse, books, nprobe, k, None)

  /** [[scoreAgainstAnnIndex]] with a candidate PRE-FILTER — the
    * metadata-filtered vector search every serving stack needs ("only
    * documents ingested before X", "only this tenant"): the predicate
    * applies to the index scan BEFORE the cell join and ranking, so each
    * query still gets k survivors FROM THE ALLOWED SET (post-filtering a
    * top-k would under-fill it). A sargable predicate (range/equality/IN
    * on stored columns — ids are ingest-ordered, so recency cutoffs are
    * id ranges) pushes into the parquet scan (`PushedFilters`,
    * plan-asserted): non-qualifying row groups never decode, and the scan
    * keeps its bucketed output partitioning — filter + exchange-free
    * probe compose.
    */
  def scoreAgainstAnnIndexWhere(
      s: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      coarse: Array[Seq[Long]],
      books: Array[Array[Seq[Long]]],
      nprobe: Int,
      k: Int,
      candPred: Option[Column]
  ): DataFrame = {
    val cells = coarse.length
    val probes = math.min(nprobe, cells)
    val nsub = books.length
    val dsub = books(0)(0).length
    val cmat = typedLit(coarse.map(_.toSeq).toSeq)
    val pm = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val q = queries
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q"))
      .withColumn("__d", distancesTo(cmat, col("q")))
      .withColumn(
        "tbl",
        transform(
          sequence(lit(0), lit(nsub - 1)),
          j => distancesTo(element_at(pm, j + 1), slice(col("q"), j * dsub + 1, lit(dsub)))))
      .withColumn(
        "cell",
        explode(
          slice(
            transform(
              array_sort(
                zip_with(col("__d"), sequence(lit(0), lit(cells - 1)), (d, i) => struct(d.as("d"), i.as("i")))
              ),
              s2 => s2.getField("i")
            ),
            1,
            probes
          )
        )
      )
      .select(col("query_id"), col("cell"), col("tbl"))
    // no dedupe: one cell per stored row × distinct probed cells ⇒ each
    // (query_id, cand_id) pair is unique off the cell join (see ivfTopK);
    // tombstoned ids ([[deleteFromAnnIndex]]) anti-join out BEFORE the
    // cell join — broadcast, so the index side stays exchange-free; the
    // caller's candidate pre-filter lands on the scan itself
    val live = annIndexLive(s, table)
    val scored = candPred.fold(live)(live.filter)
      .join(q, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("adc", adcSum(col("tbl"), col("codes")))
    heapBottomKLong(scored, "adc", k)
  }

  /** floor(x*1000 + 0.5) integer quantization — deterministic in any engine
    * (unlike round() tie modes), and exact integer arithmetic downstream is
    * associative, so no engine's summation order can change a result.
    */
  def quantize(vecCol: Column): Column =
    transform(vecCol, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  // ---- product quantization (the FAISS-style compression half) ----------

  /** Train `nsub` PQ sub-quantizers (one `nlistSub`-centroid codebook per
    * contiguous dim/nsub slice) with fixed-iteration Lloyd's — the vector-
    * compression half of the FAISS serving stack ([[ivfTopK]] is the
    * candidate-pruning half; compose them for IVFPQ). Seeded like
    * [[sampleCentroids]]: the `nlistSub` lowest-id vectors, sliced.
    *
    * ALL subspaces train together, one job per iteration: rows explode to
    * (subspace, slice) pairs — nsub× row amplification of dsub-length
    * arrays, the same bytes as the original vector — then one map-side
    * argmin against the nested codebook literal and ONE combine-friendly
    * (subspace, cell, dim) aggregation whose output is nsub·nlistSub·dsub
    * rows: the model, never the data. Same exactness contract as
    * [[kmeansCentroids]] (integer slices, half-up mean, empty cell keeps
    * its centroid), so a SQL twin replays training verbatim.
    *
    * @return codebooks[subspace][cell][dim within slice], quantized longs
    */
  /** Driver-side fitted-MODEL memo — the [[Dedup.spilled]] discipline
    * applied to model state instead of a frame: keyed by the corpus's
    * canonicalized plan (+ semanticHash + schema + the exactness confs) and
    * the training params; the value is the fitted model, bounded by
    * (nsub·nlistSub·dsub) / (nlist·dim) longs — never data. Training is a
    * deterministic function of the corpus (seeded by the lowest-id vectors,
    * fixed iteration count), so every consumer of the same (corpus, params)
    * gets byte-identical books from ONE training pass: ann_pq_topk,
    * ann_ivfpq_topk, ann_index_scored and ann_recall_audit's pq ranker all
    * train the same 4×4 books and previously paid four training scans per
    * bench pass. Like the spill memo, session identity is deliberately NOT
    * in the key (the stream harness clones sessions per invocation).
    */
  private[ext] val modelMemo = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private val memoInsertOrder = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private val memoEvictions = new java.util.concurrent.atomic.LongAdder
  // Bounded for long-lived serving sessions: the memo is a pure
  // performance cache (every value is a deterministic recompute of its
  // corpus + params), so evicting the OLDEST entries is always safe —
  // a re-request just pays one training pass again. Bench/driver JVMs
  // never approach the bound; the env knob exists for serving processes.
  private val memoMaxEntries: Int =
    math.max(1, sys.env.getOrElse("SPARK_GRAFT_MODEL_MEMO_MAX", "256").toInt)

  /** The single write path into [[modelMemo]]: compute-if-absent, track
    * insertion order, and evict the oldest entries past the bound (never
    * the entry just requested). All fitted-model cachers route here.
    */
  private[ext] def memoized[T <: AnyRef](key: String)(compute: => T): T = {
    // enqueue only AFTER the mapping function SUCCEEDS: a compute that
    // throws (failed training job) must not leave a queue entry with no
    // map entry — repeated failures would grow the queue unboundedly and
    // each stale key would burn an eviction-loop iteration later. The
    // flag is safe under computeIfAbsent's per-key mutual exclusion (at
    // most one caller runs the mapping function for a given key).
    var ran = false
    val v = modelMemo.computeIfAbsent(key, { _ =>
      ran = true
      compute
    })
    if (ran) memoInsertOrder.add(key)
    var guard = 0
    while (modelMemo.size > memoMaxEntries && guard < 4096) {
      val old = memoInsertOrder.poll()
      if (old == null) guard = 4096
      else if (old == key) memoInsertOrder.add(old) // keep the live request
      else if (modelMemo.remove(old) != null) memoEvictions.increment()
      guard += 1
    }
    v.asInstanceOf[T]
  }

  private[graft] def modelMemoEvictions: Long = memoEvictions.sum()
  private[graft] def modelMemoQueueSize: Int = memoInsertOrder.size()

  /** OBSERVABILITY — census of the fitted-model memo: one (key,
    * valueClass, approxBytes) row per entry. Entries are bounded at
    * `memoMaxEntries` with oldest-first eviction (see [[memoized]]);
    * this census is what keeps the posture honest — Bench prints the
    * totals (and the eviction count) at the end of every run, and
    * QueryHygieneSpec bounds the value classes and per-entry size so a
    * data-sized value can never silently enter.
    */
  private[graft] def modelMemoCensus(): Seq[(String, String, Long)] = {
    import scala.jdk.CollectionConverters._
    modelMemo.asScala.toSeq
      .map { case (k, v) => (k, v.getClass.getName, approxModelBytes(v)) }
      .sortBy(_._1)
  }

  /** Conservative in-heap size estimate of a memoized model value —
    * recursive over the shapes the memo actually holds (nested arrays /
    * seqs of longs, string pairs for BPE merges). Unknown leaves count a
    * flat 64 bytes; the hygiene spec rejects their classes anyway.
    */
  private[graft] def approxModelBytes(v: Any): Long = v match {
    case _: Long | _: Int | _: Double | _: java.lang.Long | _: java.lang.Integer |
        _: java.lang.Double => 8L
    case s: String => 40L + 2L * s.length
    case (a, b) => 24L + approxModelBytes(a) + approxModelBytes(b)
    case arr: Array[_] => 16L + arr.iterator.map(approxModelBytes).sum
    case seq: scala.collection.Seq[_] => 24L + seq.iterator.map(approxModelBytes).sum
    case _ => 64L
  }

  private[ext] def modelKey(corpus: DataFrame, params: String): String = {
    val s = corpus.sparkSession
    val confSig = Seq(
      "spark.sql.session.timeZone",
      "spark.sql.ansi.enabled",
      "spark.sql.legacy.parquet.nanosAsLong"
    ).map(k => s.conf.getOption(k).getOrElse("")).mkString("|")
    val a = corpus.queryExecution.analyzed
    java.security.MessageDigest.getInstance("MD5")
      .digest((a.canonicalized.toString + "|" + a.semanticHash() + "|" +
        corpus.schema.catalogString + "|" + confSig + "|" + params).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** [[pqTrain]] through the model memo — the registration-site entry
    * point, so the audit and the serving queries share one training pass.
    */
  def pqTrainCached(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nsub: Int,
      nlistSub: Int,
      iters: Int
  ): Array[Array[Seq[Long]]] =
    memoized(s"pq_${modelKey(corpus, s"$idCol|$vecCol|$nsub|$nlistSub|$iters")}")(
      pqTrain(corpus, idCol, vecCol, nsub, nlistSub, iters))

  /** [[kmeansCentroids]] through the model memo (the IVF coarse quantizer
    * is retrained identically by ann_ivf_kmeans / ann_ivfpq_topk /
    * ann_index_scored on the same corpus).
    */
  def kmeansCentroidsCached(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int,
      iters: Int
  ): Array[Seq[Long]] =
    memoized(s"km_${modelKey(corpus, s"$idCol|$vecCol|$nlist|$iters")}")(
      kmeansCentroids(corpus, idCol, vecCol, nlist, iters))

  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nsub: Int,
      nlistSub: Int,
      iters: Int
  ): Array[Array[Seq[Long]]] = {
    require(nsub > 0 && nlistSub > 0 && iters >= 0, "nsub, nlistSub > 0; iters >= 0")
    val seed = sampleCentroids(corpus, idCol, vecCol, nlistSub)
    require(seed.nonEmpty, "corpus must be non-empty")
    val dim = seed(0).length
    require(dim % nsub == 0, s"nsub must divide dim ($dim % $nsub != 0)")
    val dsub = dim / nsub
    var books: Array[Array[Seq[Long]]] =
      Array.tabulate(nsub)(j => seed.map(v => v.slice(j * dsub, (j + 1) * dsub)))
    for (_ <- 1 to iters) {
      val cm = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
      val sliced = corpus
        .select(quantize(col(vecCol)).as("q"))
        .select(
          posexplode(
            transform(
              sequence(lit(0), lit(nsub - 1)),
              j => slice(col("q"), j * dsub + 1, lit(dsub)))
          ).as(Seq("j", "qs")))
      val assigned = sliced
        .withColumn("__d", distancesTo(element_at(cm, col("j") + 1), col("qs")))
        .withColumn("cell", (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
        .drop("__d")
      val sums = graft.ops.PlanOps
        .fence(assigned)
        .select(col("j"), col("cell"), posexplode(col("qs")).as(Seq("pos", "x")))
        .groupBy(col("j"), col("cell"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        .select(
          col("j"), col("cell"), col("pos"),
          floor(col("s").cast("double") / col("n").cast("double") + 0.5).cast("long").as("v"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (jc, rows) => jc -> rows.sortBy(_.getInt(2)).map(_.getLong(3)).toSeq }
      books = Array.tabulate(nsub) { j =>
        Array.tabulate(nlistSub) { c =>
          val next = sums.getOrElse((j, c), books(j)(c))
          require(next.length == dsub, s"subspace $j cell $c: dim drift")
          next
        }
      }
    }
    books
  }

  /** PQ-encode every vector: `codes[j]` = nearest codebook-`j` centroid of
    * the vector's j-th slice. Map-only — nsub·nlistSub·dsub integer ops
    * per row, nothing shuffles; the nsub small ints per vector ARE the
    * compressed representation a serving index stores (dim×8 bytes →
    * nsub ints). Argmin ties break on the LOWER cell (the sort is by
    * (distance, cell), the same rule the training assignment uses).
    */
  def pqCodes(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      books: Array[Array[Seq[Long]]]
  ): DataFrame = {
    val nsub = books.length
    val nlistSub = books(0).length
    val dsub = books(0)(0).length
    val cm = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    df.select(idCol.as("id"), quantize(vecCol).as("q"))
      .select(
        col("id"),
        transform(
          sequence(lit(0), lit(nsub - 1)),
          j => {
            val d = distancesTo(element_at(cm, j + 1), slice(col("q"), j * dsub + 1, lit(dsub)))
            element_at(
              array_sort(
                zip_with(d, sequence(lit(0), lit(nlistSub - 1)), (dd, ii) => struct(dd.as("d"), ii.as("i")))),
              1
            ).getField("i").cast("int")
          }
        ).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query computes
    * its per-(subspace, cell) distance TABLE once (map-side on the
    * broadcast query set — nsub·nlistSub integers per query), and a
    * candidate's score is nsub table lookups summed: the classic PQ
    * serving trade of dim multiplies for nsub reads. Exact integer math
    * end to end, ranked by ascending ADC distance with candidate-id ties.
    *
    * Scale: this form scans all codes per query (the compression-only
    * path). At 100 TB compose with [[ivfTopK]]'s cell pruning — assign
    * codes within IVF cells and probe nprobe cells — for FAISS's IVFPQ;
    * the two halves here are exactly those building blocks.
    */
  def pqAdcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      books: Array[Array[Seq[Long]]],
      k: Int
  ): DataFrame = {
    val nsub = books.length
    val dsub = books(0)(0).length
    val cm = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val c = pqCodes(corpus, col(idCol), col(vecCol), books)
      .select(col("id").as("cand_id"), col("codes"))
    val q = broadcast(
      queries
        .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q"))
        .select(
          col("query_id"),
          transform(
            sequence(lit(0), lit(nsub - 1)),
            j => distancesTo(element_at(cm, j + 1), slice(col("q"), j * dsub + 1, lit(dsub)))
          ).as("tbl")))
    val scored = c
      .join(q, col("query_id") =!= col("cand_id"))
      .withColumn("adc", adcSum(col("tbl"), col("codes")))
    heapBottomKLong(scored, "adc", k)
  }

  /** Per-group embedding centroids (mean-pool): one row per
    * (group, dimension) with the member count, the exact integer
    * quantized sum, and the mean. The class-prototype primitive —
    * centroid init for IVF, per-label prototypes for probing classifiers,
    * diversity audits.
    *
    * Shape at 100 TB: `posexplode` the RAW vector attribute (exploding a
    * plain column has no re-evaluation trap — quantization happens on the
    * scalar element AFTER the explode), then one partial-aggregated
    * groupBy on (group, dim): dim× row amplification into a combine-
    * friendly shuffle whose output is |groups|·dim rows, independent of
    * corpus size. Sums are integer-exact, so the mean (one double
    * division of exact integers) is bit-identical in any engine.
    */
  def groupCentroids(df: DataFrame, groupCol: Column, vecCol: Column): DataFrame =
    df.select(groupCol.as("grp"), posexplode(vecCol).as(Seq("pos", "x")))
      .select(
        col("grp"),
        col("pos"),
        floor(col("x").cast("double") * 1000 + 0.5).cast("long").as("v")
      )
      .groupBy(col("grp"), col("pos"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("v")).as("sum_q"))
      .withColumn("mean_q", col("sum_q").cast("double") / col("n_vecs").cast("double"))

  /** Per-group embedding DIVERSITY audit: mean pairwise similarity inside
    * each group, computed by the sum-of-vectors identity
    * `Σ_{i≠j} u_i·u_j = ‖Σu‖² − Σ‖u_i‖²` — O(n·dim) with one combine-
    * friendly (group, dim) aggregation, never the O(n²) pairwise join.
    * The collapse detector for synthetic/near-duplicate strata: a group
    * whose members all point the same way scores ≈ 1.
    *
    * Exactness: vectors are unit-normalized PER ROW (fixed-order double
    * math, identical in any engine) then quantized half-up to integers
    * scaled 1000 — after that every aggregate is integer arithmetic, so
    * the group sums are order-independent and engine-exact; the only
    * floats in the output are one final division and the ÷10⁶ rescale.
    * Zero vectors quantize to zeros (they contribute nothing to either
    * side of the identity).
    *
    * @return (label, n_vecs, dot_ss = ‖Σu‖², self_sum = Σ‖u_i‖²,
    *         mean_cos ≈ mean pairwise cosine, rounded 6) for groups ≥ 2
    */
  def groupDiversity(df: DataFrame, groupCol: Column, vecCol: Column): DataFrame = {
    val qd = df.select(groupCol.as("grp"), quantize(vecCol).as("q"))
      .withColumn("sdot", aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
      .withColumn(
        "u",
        when(col("sdot") === 0, transform(col("q"), _ => lit(0L)))
          .otherwise(
            transform(
              col("q"),
              x =>
                floor(x.cast("double") * 1000 / sqrt(col("sdot").cast("double")) + lit(0.5))
                  .cast("long"))))
    // fence before the posexplode: `u` is an expensively-BUILT array with a
    // single consumer — unfenced, the normalize+quantize pipeline inlines
    // into the Generate node and re-evaluates per emitted element (dim× the
    // work per row; see PlanOps)
    graft.ops.PlanOps
      .fence(qd.select(col("grp"), col("u")))
      .select(col("grp"), posexplode(col("u")).as(Seq("pos", "ux")))
      .groupBy(col("grp"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("ux")).as("s"), sum(col("ux") * col("ux")).as("ss"))
      .groupBy(col("grp"))
      .agg(
        max(col("n")).as("n_vecs"),
        sum(col("s") * col("s")).as("dot_ss"),
        sum(col("ss")).as("self_sum"))
      .filter(col("n_vecs") >= 2)
      .select(
        col("grp").as("label"),
        col("n_vecs"),
        col("dot_ss"),
        col("self_sum"),
        round(
          (col("dot_ss") - col("self_sum")).cast("double")
            / (col("n_vecs") * (col("n_vecs") - 1)) / 1000000L,
          6
        ).as("mean_cos")
      )
  }

  /** Symmetric int8 quantization per vector (the storage/bandwidth
    * reduction step an embedding pipeline runs before ANN serving): code =
    * round(x · 127/max|x|), one row per (vec, dim). Map-side only — the
    * max|x| reduction is per-row, the explode amplifies a RAW attribute
    * (no Generate re-evaluation trap), nothing shuffles. The arithmetic is
    * a fixed-order double expression over exactly-cast floats, so any
    * engine reproduces the codes bit-for-bit (the floor(+0.5) half-up
    * convention shared by every quantizer here). A zero vector quantizes
    * to zeros instead of dividing by zero.
    */
  def quantizeInt8(df: DataFrame, idCol: Column, vecCol: Column): DataFrame =
    df.select(
        idCol.as("vec_id"),
        vecCol.as("v"),
        array_max(transform(vecCol, x => abs(x.cast("double")))).as("maxabs")
      )
      .select(col("vec_id"), col("maxabs"), posexplode(col("v")).as(Seq("pos", "x")))
      .select(
        col("vec_id"),
        col("pos"),
        when(col("maxabs") === 0, lit(0))
          .otherwise(
            floor(col("x").cast("double") * (lit(127.0) / col("maxabs")) + 0.5).cast("int"))
          .as("code")
      )

  /** [[quantizeInt8]]'s codes as one `array<long>` per vector (the layout
    * a serving index stores). The per-vector scale is STAGED as its own
    * attribute before the code transform — referencing the array_max
    * expression inside the lambda would re-evaluate it per element (the
    * lambda-inlining trap; see SCALING.md).
    */
  def int8Codes(df: DataFrame, idCol: Column, vecCol: Column): DataFrame =
    df.select(
        idCol.as("id"),
        vecCol.as("v"),
        array_max(transform(vecCol, x => abs(x.cast("double")))).as("maxabs")
      )
      .select(
        col("id"),
        when(col("maxabs") === 0, transform(col("v"), _ => lit(0L)))
          .otherwise(transform(
            col("v"),
            x => floor(x.cast("double") * (lit(127.0) / col("maxabs")) + 0.5).cast("long")))
          .as("codes")
      )

  /** Serving-path top-k over int8 codes: score = integer dot product of
    * the [[int8Codes]] arrays — exact integer arithmetic end to end (no
    * float staging needed for engine reproducibility), which is the
    * standard int8 shortcut: rank by code-dot, equivalent to cosine up to
    * the two per-vector scales. Same broadcast-queries × corpus-scan shape
    * as [[bruteForceTopK]]; ties break on candidate id.
    */
  def int8TopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(
      int8Codes(queries, col(idCol), col(vecCol))
        .select(col("id").as("query_id"), col("codes").as("qc")))
    val c = int8Codes(corpus, col(idCol), col(vecCol))
      .select(col("id").as("cand_id"), col("codes").as("cc"))
    val scored = c
      .join(q, col("query_id") =!= col("cand_id"))
      // native integer dot (graft_dotl) — exact long fold, see ArrayDot
      .withColumn("score", call_function("graft_dotl", col("qc"), col("cc")))
    // exact long heap on the NEGATED pair: greatest (score, −cand_id) is
    // (score DESC, cand_id ASC) — the integer score never becomes a float
    scored
      .groupBy(col("query_id"))
      .agg(
        graft.ops.agg.TopKHeap
          .column(k)(col("score"), -col("cand_id").cast("long"))
          .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        (-col("col._2")).as("cand_id"),
        (col("pos") + 1).as("rank"),
        col("col._1").as("score"))
  }

  /** Plane `p`'s component `d`: an INTEGER in [-500, 500) derived from
    * md5(p ∥ "_" ∥ d) — first 8 hex chars as a number, mod 1000, minus 500.
    * Computed DRIVER-side once and shipped as literal arrays: the values are
    * constant per (plane, dim), and deriving them inside a zip_with lambda
    * would re-hash dim × planes times per ROW (the lambda variable blocks
    * constant folding). Any engine with md5 reproduces the same table —
    * engine-private hashes (murmur3) would make the buckets unverifiable.
    */
  def srpCoefficients(dim: Int, planes: Int, offset: Int = 0): Seq[Seq[Long]] = {
    def md5Hex8(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    (offset until offset + planes).map(p => (0 until dim).map(d => md5Hex8(s"${p}_$d") % 1000L - 500L))
  }

  /** Sign-random-projection bucket key: the sign bits of the vector's dot
    * products with `planes` fixed pseudo-random hyperplanes (coefficients
    * from [[srpCoefficients]]). The vector is integer-quantized before
    * projecting, so the whole projection is exact integer math —
    * reproducible with no stored model.
    *
    * NOTE: this convenience form embeds the quantize transform in every
    * plane's subtree (planes× re-evaluation per row once inlined). Callers
    * that already stage a quantized copy of the vector as its own column —
    * all the ops in this module do — should pass it to [[srpBucketQ]].
    */
  def srpBucket(vecCol: Column, dim: Int, planes: Int): Column =
    srpBucketQ(quantize(vecCol), dim, planes)

  /** [[srpBucket]] over an ALREADY-quantized vector attribute. Each
    * plane's projection is the native exact long dot (`graft_dotl`,
    * [[graft.functions.ArrayDotLong]]) against the literal coefficient
    * vector — same wrapping-long fold as the HOF form it replaced, and
    * this runs once per plane per CORPUS ROW at bucketing time.
    */
  def srpBucketQ(qVec: Column, dim: Int, planes: Int, offset: Int = 0): Column = {
    val coeffs = srpCoefficients(dim, planes, offset)
    val bits = (0 until planes).map { j =>
      val proj = call_function("graft_dotl", qVec, typedLit(coeffs(j)))
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1 << j)
    }
    bits.reduce(_ + _)
  }

  /** Approximate nearest neighbors: corpus and queries are bucketed by SRP
    * sign-bits; ranking happens only within a query's probed buckets. At
    * 100 TB the corpus side is a single map+shuffle on small bucket keys
    * instead of a broadcast × full-scan product.
    *
    * `multiProbe = true` additionally probes every bucket at Hamming
    * distance 1 from the query's own (standard LSH multi-probe): recall
    * rises sharply — a near neighbor differing in one sign bit is found —
    * for `planes`× more query-side rows, which only scales the (small)
    * broadcast, not the corpus shuffle.
    *
    * `tables > 1` is the classic AND-OR amplification (Indyk–Motwani):
    * `tables` independent hash tables of `planes` sign bits each (table t
    * reads global plane indices [t·planes, (t+1)·planes)), a candidate
    * surfaces if it collides with the query in ANY table. Recall across L
    * independent tables is `1 − (1 − r)^L` for single-table recall r —
    * the knob that turns a 0.24-recall single table into a serving-grade
    * path. Cost shape: the corpus side maps each row to L (table, bucket)
    * keys — L× the (narrow) shuffle volume, still one shuffle and no
    * broadcast of the corpus; the query side is L× more probe rows on the
    * already-small broadcast.
    */
  def lshBucketTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int,
      k: Int,
      multiProbe: Boolean = false,
      tables: Int = 1
  ): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    // vectors are integer-quantized for ranking: the dot/norm sums are then
    // exact integer math (associative), so the reported sim is reproducible
    // by any engine regardless of its summation order
    // quantize staged as an attribute FIRST: buckets + norm all read it, so
    // the transform runs once per row instead of once per plane (+1)
    def buckets(vec: Column): Column =
      array((0 until tables).map(t => srpBucketQ(vec, dim, planes, t * planes)): _*)
    val c = corpus
      .select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("c_vec"))
      .select(
        col("cand_id"),
        col("c_vec"),
        norm(col("c_vec")).as("c_nrm"),
        posexplode(buckets(col("c_vec"))).as(Seq("tbl", "bucket"))
      )
    val q0 = queries
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q_vec"))
      .select(
        col("query_id"),
        col("q_vec"),
        norm(col("q_vec")).as("q_nrm"),
        posexplode(buckets(col("q_vec"))).as(Seq("tbl", "bucket"))
      )
    val probed =
      if (!multiProbe) q0
      else
        q0.select(
          col("query_id"),
          col("q_vec"),
          col("q_nrm"),
          col("tbl"),
          explode(
            array_distinct(
              array(
                col("bucket") +:
                  (0 until planes).map(p => col("bucket").bitwiseXOR(lit(1 << p))): _*
              )
            )
          ).as("bucket")
        )
    val q = broadcast(probed)
    val scored = c
      .join(q, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      // a candidate can surface via several probed buckets/tables — it
      // must rank ONCE. No dropDuplicates stage: that was a candidate-
      // grain exchange shuffling full vector rows; the duplicates carry
      // a bit-identical (sim, cand_id) pair (same vectors, same
      // expression), and TopKHeapSim's set semantics hold each pair once
      .withColumn("sim", dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")))
    heapTopKDesc(scored, "sim", k).withColumn("sim", round(col("sim"), 6))
  }

  /** RADIUS search (range query) over the SRP-LSH buckets: every candidate
    * within cosine ≥ tauNum/tauDen of each query — the "find everything
    * this similar" retrieval mode (near-dup sweeps, dedup-against-index,
    * recommendation fan-out) where top-k's fixed cutoff is the wrong
    * contract because the answer size is data-dependent.
    *
    * Candidate generation is [[lshBucketTopK]]'s verbatim: L independent
    * SRP tables, optional 1-bit multi-probe, corpus side shuffled only on
    * its (table, bucket) keys, query side broadcast. The threshold is then
    * EXACT INTEGER math on the quantized vectors — `d ≥ 0 ∧
    * d²·tauDen² ≥ qq·cc·tauNum²` in decimal(38,0) cross-products — so the
    * accept/reject decision has no float boundary to wobble across
    * engines; the reported sim is the usual one-rounded-double cosine.
    * Recall is the LSH contract (union over tables/probes), measured in
    * SimilaritySpec against the brute-force truth.
    */
  def lshRangeSearch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int,
      tauNum: Int,
      tauDen: Int,
      multiProbe: Boolean = true,
      tables: Int = 4
  ): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    require(tauDen > 0 && tauNum >= 0 && tauNum <= tauDen, "tau must be in [0, 1]")
    def buckets(vec: Column): Column =
      array((0 until tables).map(t => srpBucketQ(vec, dim, planes, t * planes)): _*)
    val c = corpus
      .select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("c_vec"))
      .select(
        col("cand_id"),
        col("c_vec"),
        dot(col("c_vec"), col("c_vec")).as("cc"),
        posexplode(buckets(col("c_vec"))).as(Seq("tbl", "bucket"))
      )
    val q0 = queries
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("q_vec"))
      .select(
        col("query_id"),
        col("q_vec"),
        dot(col("q_vec"), col("q_vec")).as("qq"),
        posexplode(buckets(col("q_vec"))).as(Seq("tbl", "bucket"))
      )
    val probed =
      if (!multiProbe) q0
      else
        q0.select(
          col("query_id"),
          col("q_vec"),
          col("qq"),
          col("tbl"),
          explode(
            array_distinct(
              array(
                col("bucket") +:
                  (0 until planes).map(p => col("bucket").bitwiseXOR(lit(1 << p))): _*
              )
            )
          ).as("bucket")
        )
    val dec = "decimal(38,0)"
    // score and threshold BEFORE the dedupe, then dedupe on a NARROW
    // projection: the old order shuffled full 64-long vector rows for
    // every bucket collision just to drop duplicates — scoring first is
    // map-side (dup multiplicity is the small table/probe co-collision
    // count), the threshold discards non-matches pre-exchange, and the
    // exchange then carries five numeric columns for matches only.
    // Duplicates are identical in all five columns (same vectors, same
    // exact integer math), so dedupe placement cannot change the set.
    c.join(broadcast(probed), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("d", dot(col("q_vec"), col("c_vec")))
      .filter(
        col("d") >= 0 &&
          col("d").cast(dec) * col("d").cast(dec) * lit(tauDen.toLong * tauDen) >=
          col("qq").cast(dec) * col("cc").cast(dec) * lit(tauNum.toLong * tauNum))
      .select(col("query_id"), col("cand_id"), col("d"), col("qq"), col("cc"))
      .dropDuplicates(Seq("query_id", "cand_id"))
      .select(
        col("query_id"),
        col("cand_id"),
        round(
          col("d").cast("double") /
            (sqrt(col("qq").cast("double")) * sqrt(col("cc").cast("double"))),
          6).as("sim"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    * ranked retrieval lists: `rrf(d) = Σ_lists 1/(c + rank_list(d))`, a
    * candidate present in only one list contributes one term. Fusion is
    * RANK-only — it never touches scores — so two approximate rankers
    * with uncorrelated failure modes (IVF's cell pruning vs LSH's
    * hyperplane buckets) ensemble into better recall than either alone,
    * without calibrating their incomparable score scales.
    *
    * Inputs carry `(query_id, cand_id, rank)` (this module's top-k output
    * shape). Exactness: ranks are ints, each term is one IEEE double
    * division `1.0/(c + rank)` and one sum — bit-identical in any engine —
    * and the final ordering ties on cand_id (two candidates CAN collide at
    * the same rrf, e.g. ranks (5, 12) vs (12, 5)).
    *
    * Scale shape: one equi-join of two already-k-bounded frames (≤ q·k
    * rows each) and a per-query window — the expensive work happened in
    * the upstream rankers; fusion itself is candidate-bounded, never
    * corpus-bounded.
    */
  /** Scan-cheap → rerank-exact serving composition (the shape every
    * production vector store runs): the int8 code scan ranks the WHOLE
    * corpus by integer code-dot and keeps `depth` candidates per query,
    * then only those q·depth survivors are re-scored with the exact
    * quantized cosine ([[quantize]] + `graft_dotl`, the `ann_cosine_topk`
    * arithmetic) and cut to `k`. Candidate recall@depth is what bounds
    * final recall — at depth ≫ k the cheap ranker only has to get the
    * true top-k somewhere into its top-`depth`, which is a far weaker
    * ask than ranking them correctly (measured on the fixture: int8@5
    * alone 0.68, rerank@5 at depth 100 → 1.00; floor in SimilaritySpec).
    *
    * Scale shape: the corpus is scanned twice, never shuffled — the int8
    * pass is the [[int8TopK]] broadcast-queries scan, and the exact-vector
    * fetch is a broadcast semi-join of the (q·depth)-row candidate list
    * against the corpus. The exact cosine runs q·depth times, not q·N.
    * Ties break on candidate id in both stages.
    */
  def int8RerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      depth: Int,
      k: Int
  ): DataFrame = {
    val cands = int8TopK(corpus, queries, idCol, vecCol, depth)
      .select(col("query_id"), col("cand_id"))
    exactCosineRerank(corpus, queries, idCol, vecCol, cands, k)
  }

  /** The same two-stage serving shape with PQ/ADC as the candidate
    * generator: the ADC scan ([[pqAdcTopK]]) keeps `depth` candidates per
    * query — nsub table lookups per candidate, the cheapest full-corpus
    * ranker this module has — and the exact quantized cosine recovers the
    * order over the q·depth survivors. This is the honest posture for
    * flat PQ on data with no cluster structure: isotropic vectors are
    * PQ's pathological case AS A RANKER (the fixture's 8-bit codes score
    * recall@5 ≈ 0.06 — see SimilaritySpec's budget ladder), but at depth
    * ≫ k the code scan only has to LAND the true top-k in its top-depth,
    * which even coarse codes do reliably; the rerank does the ranking.
    */
  def pqRerankTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      books: Array[Array[Seq[Long]]],
      depth: Int,
      k: Int
  ): DataFrame = {
    val cands = pqAdcTopK(corpus, queries, idCol, vecCol, books, depth)
      .select(col("query_id"), col("cand_id"))
    exactCosineRerank(corpus, queries, idCol, vecCol, cands, k)
  }

  /** Shared exact-rerank tail of the two-stage servers: re-score the
    * (q·depth)-row candidate list with the exact quantized cosine
    * ([[quantize]] + `graft_dotl`, the `ann_cosine_topk` arithmetic) and
    * cut to `k`. The corpus is never shuffled — the exact-vector fetch is
    * a broadcast join of the bounded candidate list against the corpus
    * scan, and the exact cosine runs q·depth times, not q·N. Ties break
    * on candidate id.
    */
  private def exactCosineRerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      cands: DataFrame,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // self-dots staged per side, same reasoning as bruteForceTopK
    val q = broadcast(
      queries
        .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
        .withColumn("naa", call_function("graft_dotl", col("qv"), col("qv"))))
    val c = corpus
      .select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("cv"))
      .withColumn("ncc", call_function("graft_dotl", col("cv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    c.join(broadcast(cands), Seq("cand_id"))
      .join(q, Seq("query_id"))
      .withColumn(
        "sim",
        call_function("graft_dotl", col("qv"), col("cv")).cast("double") /
          sqrt(col("naa").cast("double") * col("ncc").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"), col("sim"))
  }

  /** Recall@k audit of approximate rankers against [[bruteForceTopK]]
    * truth, as a QUERYABLE frame: one row per ranker —
    * `(ranker, n_queries, n_truth, n_hits, recall_ppm)` with recall an
    * exact integer ppm (no float rate to wobble across engines).
    *
    * The query set is the caller's DETERMINISTIC eval stratum (md5-gated
    * at the registration site) — the fixed-eval-set discipline of
    * [[graft.ops.FuzzyOps.blockingQuality]]: at 1000× the corpus the
    * caller raises the stratum mod 1000×, so truth cost (|stratum| × N
    * broadcast-join dots, linear scans) is unchanged. Hits are counted by
    * a semi-join of each approximate top-k against the truth top-k on
    * (query_id, cand_id) — rank positions inside the top-k don't matter,
    * membership does (the standard recall@k definition).
    */
  def recallAudit(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rankers: Seq[(String, (DataFrame, DataFrame) => DataFrame)]
  ): DataFrame = {
    require(rankers.nonEmpty, "need at least one ranker to audit")
    // truth is read by every ranker branch (one base agg + one semi-join
    // each) — spill it once via the plan-keyed memo instead of re-running
    // the brute-force scoring per branch
    val truth = Dedup.spilled(
      bruteForceTopK(corpus, queries, idCol, vecCol, k)
        .select(col("query_id"), col("cand_id")),
      "recall_truth")
    // a misconfigured stratum gate (empty eval set) must fail the audit
    // loudly, not read as a vacuous all-null-ppm pass: n_truth = 0 would
    // otherwise make every recall_ppm a silent null under integer `div`
    val base = truth
      .agg(
        countDistinct(col("query_id")).as("n_queries"),
        count(lit(1)).as("n_truth"))
      .withColumn(
        "n_truth",
        when(col("n_truth") > 0, col("n_truth"))
          .otherwise(raise_error(lit(
            "recallAudit: empty eval stratum — the md5 gate selected no queries; widen the gate"))))
    rankers
      .map { case (name, rank) =>
        val hits = rank(corpus, queries)
          .select(col("query_id"), col("cand_id"))
          .join(truth, Seq("query_id", "cand_id"), "left_semi")
        base
          .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
          .select(
            lit(name).as("ranker"),
            col("n_queries"),
            col("n_truth"),
            col("n_hits"),
            expr("n_hits * 1000000 div n_truth").as("recall_ppm"))
      }
      .reduce(_.unionByName(_))
  }

  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fa = a.select(col("query_id"), col("cand_id"), col("rank").as("__rank_a"))
    val fb = b.select(col("query_id"), col("cand_id"), col("rank").as("__rank_b"))
    val fused = fa
      .join(fb, Seq("query_id", "cand_id"), "full_outer")
      .withColumn(
        "rrf",
        coalesce(lit(1.0) / (lit(c) + col("__rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("__rank_b")), lit(0.0)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("cand_id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"), round(col("rrf"), 6).as("rrf"))
  }

  /** k-center greedy coreset selection (Gonzalez farthest-point — the
    * 2-approximation to the k-center cover): pick the point FARTHEST from
    * everything chosen so far, k times — the diversity-maximizing
    * data-selection pass active-learning and "train on a representative
    * 1%" pipelines run over embeddings. Deterministic end to end: seed =
    * smallest id, distances exact integer L2² on the quantized grid (the
    * `graft_l2sq` kernel), argmax ties break to the smallest id.
    *
    * Scale shape: k bounded driver rounds; each round adds ONE distance
    * column against the newest center (incremental min maintenance — the
    * corpus is never re-scored against all centers) and reduces with a
    * TakeOrdered(1). Total kernel work O(k·n) dots; driver state is the
    * k selected rows — bounded model state, the [[kmeansCentroids]]
    * contract. The base frame persists across rounds via the plan-keyed
    * spill so tokenise/quantize runs once, not k times.
    *
    * @return one row per selection: (round, vec_id, dist_sq) — dist_sq is
    *         the point's min squared distance to all PRIOR centers at the
    *         moment it was chosen (the seed reports 0); the classic
    *         coverage-radius curve reads straight off this column
    */
  def kcenterCoreset(df: DataFrame, idCol: Column, vecCol: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val s = df.sparkSession
    import s.implicits._
    val base = Dedup.spilled(
      df.select(idCol.cast("long").as("id"), quantize(vecCol).as("qv")),
      "coreset_base")
    def vecOf(r: org.apache.spark.sql.Row): Seq[Long] = r.getSeq[Long](1)
    val seed = base.orderBy(col("id").asc).limit(1).collect()(0)
    val picks = scala.collection.mutable.ArrayBuffer((1, seed.getLong(0), 0L))
    var minD = base.withColumn("min_d", lit(Long.MaxValue))
    var center = vecOf(seed)
    for (r <- 2 to k) {
      minD = minD.withColumn(
        "min_d",
        least(
          col("min_d"),
          element_at(
            call_function("graft_l2sq", array(typedLit(center)), col("qv")), 1)))
      if (r % 3 == 0) minD = minD.localCheckpoint()
      val far = minD.orderBy(col("min_d").desc, col("id").asc).limit(1).collect()(0)
      picks += ((r, far.getLong(0), far.getLong(2)))
      center = vecOf(far)
    }
    picks.toSeq.toDF("round", "vec_id", "dist_sq")
  }
}
