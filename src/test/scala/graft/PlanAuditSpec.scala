package graft

/** Executable form of the SCALING.md plan claims: for each audited driver
  * query, the physical plan at sf0.001 must have the 100 TB-safe shape —
  * pushdown reaching the scan, lookup joins broadcast (never sort-merge or
  * nested-loop), top-N as a bounded heap, map-only pipelines shuffle-free.
  * Plan SHAPES are scale-invariant; only thresholds move with data size, so
  * the tiny fixture is a faithful witness for the structure.
  */
class PlanAuditSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("p7_date_filter: the date range is pushed to the parquet scan") {
    val plan = planOf("p7_date_filter")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(
      plan.contains("GreaterThanOrEqual(o_orderdate") || plan.contains("LessThan(o_orderdate"),
      s"date predicates not pushed:\n$plan")
  }

  test("dimension joins broadcast; no sort-merge fallback on the lookup side") {
    for (q <- Seq("p8_dim_filter", "j1_suggested_pins", "j3_crosswalk_remap")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q sort-merges a lookup join:\n$plan")
    }
  }

  test("q3_topn_revenue: hash join (broadcast OR shuffled), never sort-merge on the lookup") {
    // customer is data-grain, so the query carries no broadcast hint; at
    // fixture scale AQE still picks broadcast, at cluster scale it would pick
    // shuffled-hash. The spec must not enshrine the fixture-scale plan.
    val plan = planOf("q3_topn_revenue")
    assert(
      plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin"),
      s"q3_topn_revenue lost its hash join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"q3_topn_revenue sort-merges a lookup join:\n$plan")
  }

  test("no query in the audit set degenerates to a nested-loop or cartesian join") {
    for (q <- Seq(
        "dedup_minhash_pairs", "dedup_embedding", "ann_ivf_topk",
        "j2_two_key_join", "j4_anti_dedupe", "j5_semi_membership",
        "dedup_incremental", "dedup_embedding_incremental",
        "scd_changelog_apply", "text_familiarity",
        "ann_ivf_kmeans", "ann_pq_topk", "dedup_incremental_bucketed",
        "corpus_data_card_v2", "dedup_semantic_pairs", "curation_dsir_scores",
        "fuzzy_name_pairs", "graph_pagerank", "ts_resample_locf", "text_heavy_hitters",
        "dedup_setsim_exact", "j9_bloom_gated_join", "ev_attribution_last_touch",
        "ann_rrf_hybrid", "curation_cluster_balance", "corpus_mix_temperature",
        "graph_kcore", "curation_emb_outliers", "curate_url_canon", "stats_ks_drift",
        "dedup_knn_graph", "stats_tvd_drift", "corpus_interleave_rr",
        "ev_attribution_linear", "scd_snapshot_at", "mm_video_scene_cuts",
        "ev_attribution_ushape", "curate_url_domain", "curation_token_budget",
        "graph_kcore_fixpoint", "graph_label_prop_fixpoint",
        "stats_psi_drift", "stats_jsd_drift", "corpus_sample_weighted",
        "text_lm_score", "ann_range_search", "ts_ewma",
        "stats_chi2_assoc", "mv_delta_maintain", "mm_image_exposure",
        "mm_audio_silence", "ev_asof_nearest", "privacy_dp_counts",
        "graph_bfs", "graph_bfs_fixpoint", "text_oov_rate",
        "ev_seasonal_baseline", "stats_cusum_changepoint", "text_entropy",
        "stats_robust_scale", "dedup_containment", "scd_merge_into",
        "curation_gate_funnel", "ann_filtered_topk", "ev_path_sessions")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product:\n$plan")
    }
  }

  test("mv_delta_maintain merges the view with union+agg — NO join anywhere") {
    // a join-based merge would shuffle the full view state; the IVM
    // contract is O(delta + touched groups) via union + partial agg
    val plan = planOf("mv_delta_maintain")
    assert(!plan.contains("Join"), s"IVM must not join the view state:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation:\n$plan")
  }

  test("ev_asof_nearest: the two directional window sorts share one key exchange") {
    val plan = planOf("ev_asof_nearest")
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n == 1, s"expected 1 user_id shuffle for both windows, got $n:\n$plan")
  }

  test("emb_covariance: one bounded-buffer aggregate, no join, no data-grain explode") {
    // the co-moment pyramid rides CoMomentPyramid (one ~17 KB buffer per
    // partition through a single-group aggregate); the posexplode in the
    // plan unflattens the ONE finished buffer row, never data
    val plan = planOf("emb_covariance")
    assert(!plan.contains("Join"), s"the co-moment pyramid is join-free:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"single-group aggregate must not hash-shuffle:\n$plan")
    assert(
      "ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"pyramid buffer lost its map-side partial aggregation:\n$plan")
  }

  test("emb_pca_project serve is map-only: component as literals, zero exchanges") {
    // the fit runs driver-side through the model memo; the SERVED plan must
    // be a pure scan+project — any exchange means the model leaked into a
    // join instead of riding the plan as literals
    val plan = planOf("emb_pca_project")
    assert(!plan.contains("Exchange"), s"PCA serve must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"PCA serve must not join:\n$plan")
    // same contract for the multi-component serve: all 8 fitted
    // components ride the plan as literals; the posexplode unflattens the
    // per-row score array, never a shuffled frame
    val topm = planOf("emb_pca_topm")
    assert(!topm.contains("Exchange"), s"top-m PCA serve must not shuffle:\n$topm")
    assert(!topm.contains("Join"), s"top-m PCA serve must not join:\n$topm")
  }

  test("emb_jl_distortion: both pair sides read the fenced gated stratum, never the corpus") {
    // the md5 gate + projections run ONCE, upstream of the fence; the pair
    // join's two inputs must both be scans of that materialized stratum
    // (ExistingRDD) — a parquet scan under the join would mean the N² pair
    // space is built from the ungated corpus
    val plan = planOf("emb_jl_distortion")
    assert("Scan ExistingRDD".r.findAllIn(plan).size == 2,
      s"expected the two pair sides to scan the fenced stratum:\n$plan")
    assert(!plan.contains("Scan parquet"), s"pair join must not read the raw corpus:\n$plan")
  }

  test("broadcast-hint ratchet: every force-broadcast site is adjudicated") {
    // Doctrine: a broadcast() hint is legal only on frames whose size is
    // bounded by something other than the fact tables — dimension tables
    // (nation/region), the customer-as-PIN-universe frame (bounded by county
    // geography; the reference holds it in an in-memory set,
    // permit_cleaning.py:438), crosswalks, model state (centroids, codebooks,
    // vocab, thresholds, quantile cuts), and one-row scalars. A hint on a
    // fact-derived, data-grain frame is a scale-killer: it forces a
    // driver-collect-and-ship of a frame that grows linearly with the data.
    // This ratchet pins the adjudicated per-file counts; any new broadcast(
    // site anywhere fails the build until a human re-adjudicates it here.
    val adjudicated = Map(
      // j7 bucketed-join dim sides, PIN-universe semi/anti joins, lookup remap
      "ops/LinkOps.scala" -> 5,
      // one-row totals scalar
      "ops/SkewOps.scala" -> 1,
      // bounded cohort anchors (flag-gated), one-row max-date, dow baseline
      "ops/TemporalOps.scala" -> 3,
      // file-manifest plan (one row per file, metadata-scale), bucket probe
      "ops/LayoutOps.scala" -> 2,
      // crosswalk/pin-map lookup + parcel-universe membership
      "pipeline/PermitPipeline.scala" -> 2,
      "pipeline/LegacyPipeline.scala" -> 2,
      // query vectors / probed centroid ids / candidate id lists (top-k
      // state) + the ANN-index tombstone anti-join (takedown-scale id set)
      // + the shared quarantine core's tombstone anti-join (quarLive)
      "ext/Similarity.scala" -> 11,
      // common-lines boilerplate set (doc-freq capped), rare-gram hi side,
      // LSH- and semantic-index tombstone anti-joins (takedown-scale ids),
      // the LSH sweep's tick-bucket set (≤ maxBucketsPerTick rows)
      "ext/Dedup.scala" -> 5,
      // corpus-level BM25 stats (one row)
      "ext/Ranking.scala" -> 1,
      // NB model state (capped vocab, vocabK×|classes| likelihoods, priors)
      // + c-TF-IDF capped vocab and its per-token class counts
      "ext/Classify.scala" -> 5,
      // benchmark gram sets, per-stratum keep-rates, thresholds, score plans
      "ext/Curation.scala" -> 11,
      // sketch cells / candidate heavy-hitters / bloom bits / quantile probs
      "ext/Sketches.scala" -> 5,
      // rank offsets/targets, per-group moments (model state)
      "ext/Stats.scala" -> 4,
      // public-suffix list
      "ext/Web.scala" -> 1,
      // heavy-hitter gram/bigram sets, bounded vocab
      "ext/TextStats.scala" -> 6,
      // image-index tombstone anti-join (serving scan; the quarantine
      // scan's moved to Similarity.quarLive) + the Hamming sweep's
      // tick-bucket set (at most maxBucketsPerTick rows by construction)
      "ext/Multimodal.scala" -> 2,
      // p8/j3 nation+region dims, j1/j5/vp customer-as-PIN-universe (see
      // doctrine comments at the sites), s10 DPP dim side
      "queries/Core.scala" -> 8,
      // ann_cosine_topk / ann_filtered_topk broadcast query-vector frames
      // (moved from queries/Extensions.scala in the round-15 family split)
      "queries/QAnn.scala" -> 2
    )
    val root = new java.io.File("src/main/scala/graft")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val actual = walk(root)
      .filter(_.getName.endsWith(".scala"))
      .map { f =>
        val src = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val rel = root.toPath.relativize(f.toPath).toString
        rel -> "broadcast\\(".r.findAllIn(src).size
      }
      .filter(_._2 > 0)
      .toMap
    val unlisted = actual.filter { case (f, n) => adjudicated.getOrElse(f, 0) != n }
    val stale = adjudicated.filter { case (f, n) => actual.getOrElse(f, 0) != n }
    assert(unlisted.isEmpty && stale.isEmpty,
      s"broadcast() sites drifted from the adjudicated ratchet — re-adjudicate " +
        s"against the bounded-universe doctrine before updating the counts. " +
        s"unlisted/changed: $unlisted; stale entries: $stale")
  }

  test("audit_key_skew tops out in a bounded heap; privacy_dp_counts is agg-only") {
    val skew = planOf("audit_key_skew")
    assert(skew.contains("TakeOrderedAndProject"), s"hot-key probe must heap, not sort:\n$skew")
    val dp = planOf("privacy_dp_counts")
    assert(!dp.contains("Join"), s"the DP release is one aggregate + row-local algebra:\n$dp")
    assert("HashAggregate".r.findAllIn(dp).size >= 2, s"no partial aggregation:\n$dp")
  }

  test("ann_recall_audit: truth joins broadcast; no cartesian anywhere in the audit") {
    // the truth side is the spilled |stratum|·k frame — every hit count
    // must semi-join it broadcast (a sort-merge there would shuffle each
    // ranker's candidates on a frame that is model-state-sized), and the
    // only nested-loop joins are the one-row scalar crossJoins
    val plan = planOf("ann_recall_audit")
    assert(!plan.contains("CartesianProduct"), s"audit plans a cartesian:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"audit sort-merges a bounded frame:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"truth semi-joins lost their broadcast:\n$plan")
  }

  test("bruteForceTopK truth pass: bounded heap, never a data-grain window rank") {
    // the q×N scoring COMPUTE is brute force's inherent cost; the
    // EXCHANGE is not — a row_number window would shuffle every scored
    // pair (linear in corpus size), the TopKHeapSim aggregate carries
    // ≤ q×k rows per map partition. Partial+final ObjectHashAggregate
    // must both be present (map-side admission is the whole point).
    import org.apache.spark.sql.functions.col
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = graft.ext.Similarity
      .bruteForceTopK(e, e.filter(col("vec_id") < 4), "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"truth pass ranks through a data-grain window:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), s"truth pass sorts globally:\n$plan")
    assert(
      "ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"heap lost its map-side partial aggregation:\n$plan")
  }

  test("text_nb_confusion: model joins broadcast; argmax rides WindowGroupLimit") {
    // the likelihood table (vocabK × |classes|) and priors are model state
    // — their serving joins must broadcast; the only sort-merge allowed is
    // the doc-grain (doc_id, cls) scored⋈terms join, which is genuinely
    // data-sized on both sides. The rank-1 filter must push into the
    // window (WindowGroupLimit), not materialize every class row.
    val plan = planOf("text_nb_confusion")
    assert(!plan.contains("CartesianProduct"), s"NB plans a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"model-state joins lost broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"argmax materializes the full window:\n$plan")
    assert(
      "SortMergeJoin".r.findAllIn(plan).size <= 1,
      s"only the doc-grain scored join may sort-merge:\n$plan")
  }

  test("ann_filtered_topk: the metadata predicate reaches the candidate parquet scan") {
    // pre-filter semantics are only cheap if the filter PUSHES — a
    // post-scan filter would decode every embedding to drop most of them
    val plan = planOf("ann_filtered_topk")
    assert(plan.contains("EqualTo(label,3)"), s"label predicate not pushed:\n$plan")
  }

  test("stats_bootstrap_ci: all 32 replicates ride ONE aggregate — no join, no re-scan") {
    val plan = planOf("stats_bootstrap_ci")
    assert(!plan.contains("Join"), s"the Poisson bootstrap must not join or resample:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation:\n$plan")
  }

  test("text_oov_rate and ev_seasonal_baseline broadcast their model-state side") {
    for (q <- Seq("text_oov_rate", "ev_seasonal_baseline")) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$q must broadcast the bounded vocab/baseline frame:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"$q sort-merges a model-state join:\n$plan")
    }
  }

  test("ev_attribution_linear joins through the horizon bucket, not the bare user key") {
    // the bounded-lookback contract: the purchases×clicks join must carry
    // the horizon bucket in its equi-keys, so per-(user, bucket) fanout is
    // clicks-per-2-horizons — a bare user_id equi-join would fan out by
    // lifetime click count and no runtime trick could split that key
    val plan = planOf("ev_attribution_linear")
    assert(plan.contains("__bkt"), s"lookback bucket key missing from the join:\n$plan")
  }

  test("top-N queries use a bounded heap, not a global sort") {
    val plan = planOf("q3_topn_revenue")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort where a heap suffices:\n$plan")
  }

  test("map-only text pipelines never hash/range-shuffle") {
    // a RoundRobin exchange is allowed: tPar deliberately fans the
    // single-row-group local fixture across cores (SCALING.md), which is
    // free relative to real multi-split input; a hash or range exchange
    // would mean the pipeline added a real shuffle for map-only work
    // text_bpe_encode qualifies: training collects driver-side first, so
    // the RETURNED plan is the k chained rewrites — one map-only stage
    for (q <- Seq("text_lang_id", "text_fingerprint", "text_pii_scrub", "f_pin_normalize",
        "corpus_split_assign", "mm_audio_features", "text_bpe_encode", "text_readability")) {
      val plan = planOf(q)
      assert(
        !plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
        s"$q shuffles for map-only work:\n$plan")
    }
  }

  test("semantic dedup: both self-join sides reuse ONE cell-key exchange at scale stats") {
    // at fixture size the planner broadcasts the tiny hi side (fine); the
    // 100 TB shape is the one with broadcast off the table — there the
    // explicit repartition(cell) makes both self-join sides canonicalize
    // to the SAME shuffle, so assignment distances and norms are computed
    // once, not once per side. AQE materializes the reuse at RUNTIME
    // (stage reuse), so execute this QueryExecution before inspecting.
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = SparkEntry.queries("dedup_semantic_pairs")(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), s"self-join recomputes the assignment side:\n$plan")
    }
  }

  test("dsir: the bucket-weight table broadcasts; selection is a bounded heap") {
    val scores = planOf("curation_dsir_scores")
    assert(scores.contains("BroadcastHashJoin"),
      s"the 256-row weight table must broadcast, not shuffle the token stream:\n$scores")
    val select = planOf("curation_dsir_select")
    assert(select.contains("TakeOrderedAndProject"),
      s"top-k selection must be a heap, not a global sort:\n$select")
  }

  test("aggregations keep map-side partials (partial -> exchange -> final)") {
    val plan = planOf("q1_lineitem_agg")
    // two HashAggregate operators around one Exchange is the partial-agg shape
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation:\n$plan")
  }

  test("multimodal synth->decode chains never shuffle payload bytes") {
    // the only allowed exchange is tPar's RoundRobin fan-out of the tiny
    // PRE-SYNTH rows (doc ids) — after the binary payloads exist, nothing
    // may repartition them: a hash/range exchange anywhere means payload
    // bytes crossed the wire for map-only decode work
    for (q <- Seq("mm_decode_real", "mm_decode_jpeg", "mm_frames_real", "mm_decode_audio",
        "mm_video_frames", "mm_image_dhash", "mm_audio_fingerprint",
        "mm_image_exposure", "mm_audio_silence", "mm_image_histogram")) {
      val plan = planOf(q)
      assert(
        !plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
        s"$q shuffles payload bytes:\n$plan")
      assert("Exchange".r.findAllIn(plan).size <= 1, s"$q has extra exchanges:\n$plan")
      // position check: the tree prints root (downstream) first, so the
      // input fan-out exchange must appear AFTER every MapPartitions line —
      // an exchange printed between two MapPartitions would be shuffling
      // synthesized payload bytes
      val exIdx = plan.indexOf("Exchange")
      if (exIdx >= 0)
        assert(
          exIdx > plan.lastIndexOf("MapPartitions"),
          s"$q exchanges after payload synthesis:\n$plan")
    }
  }

  test("persisted LSH index probe: the corpus side joins exchange-free off the bucketed scan") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    Dedup.persistLshIndex(
      corpus, col("doc_id"), col("text"), table = "graft_lsh_idx_audit", buckets = 8)
    // broadcast would hide the bucketing story at fixture scale — force the
    // sort-merge path a 100 TB index would take
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = Dedup.probeLshIndex(
        spark, "graft_lsh_idx_audit", incoming, col("doc_id"), col("text"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"probe did not sort-merge:\n$plan")
      assert(plan.contains("Bucketed: true"), s"index scan is not bucketed:\n$plan")
      // exactly ONE (band, bh)-keyed exchange: the incoming batch aligning
      // to the index's bucketing. A second would mean the corpus index —
      // the 100 TB side — re-shuffled despite the persisted layout.
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1, s"expected 1 batch-side exchange, got $bandExchanges:\n$plan")
    }
  }

  test("REBUILT LSH index: the bucket spec survives the version rename; probe stays exchange-free") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    // stale build, then a versioned rebuild: the probe now resolves
    // graft_lsh_idx_rb_audit__v1, whose bucket metadata rode the catalog
    // RENAME — the 100 TB corpus side must still scan bucketed with no
    // exchange above it
    Dedup.persistLshIndex(
      corpus.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"),
      table = "graft_lsh_idx_rb_audit", buckets = 8)
    Dedup.rebuildLshIndex(
      spark, "graft_lsh_idx_rb_audit", corpus, col("doc_id"), col("text"), buckets = 8)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = Dedup.probeLshIndex(
        spark, "graft_lsh_idx_rb_audit", incoming, col("doc_id"), col("text"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"probe did not sort-merge:\n$plan")
      assert(plan.contains("Bucketed: true"), s"rebuilt index scan is not bucketed:\n$plan")
      assert(plan.contains("graft_lsh_idx_rb_audit__v1"),
        s"probe must resolve the published version:\n$plan")
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1, s"expected 1 batch-side exchange, got $bandExchanges:\n$plan")
    }
  }

  test("persisted AUDIO fingerprint index probe: corpus side exchange-free off the band buckets") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Multimodal
    val fps = Multimodal
      .audioFingerprints(
        Multimodal.synthWavAudio(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id"))
      .toDF()
    Multimodal.persistHammingIndex(
      fps.filter(col("asset_id") % 5 =!= 0), "asset_id", "fingerprint",
      table = "graft_aud_idx_audit", buckets = 8)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = Multimodal.probeHammingIndex(
        spark, "graft_aud_idx_audit", fps.filter(col("asset_id") % 5 === 0),
        "asset_id", "fingerprint", maxHamming = 8)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"audio probe did not sort-merge:\n$plan")
      assert(plan.contains("Bucketed: true"), s"audio index scan is not bucketed:\n$plan")
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1, s"expected 1 batch-side exchange, got $bandExchanges:\n$plan")
    }
  }

  test("persisted ANN index: batch scoring joins exchange-free off the bucketed cell scan") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
    Similarity.persistAnnIndex(
      e, "vec_id", "embedding", coarse, books, table = "graft_ann_idx_audit", buckets = 4)
    // the batch-scoring case IS the non-broadcastable one — force it
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val scored = Similarity.scoreAgainstAnnIndex(
        spark, "graft_ann_idx_audit", e.filter(col("vec_id") < 50),
        "vec_id", "embedding", coarse, books, nprobe = 2, k = 3)
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"scoring did not sort-merge:\n$plan")
      assert(plan.contains("Bucketed: true"), s"index scan is not bucketed:\n$plan")
      // exactly ONE cell-keyed exchange: the query batch aligning to the
      // index layout. A second would mean the index side reshuffled.
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1, s"expected 1 query-side exchange, got $cellExchanges:\n$plan")
    }
  }

  test("APPENDED ANN index: multi-file buckets still scan exchange-free") {
    // appendBucketed adds a second file set per bucket id; the scan must
    // keep reporting the bucketed output partitioning (the whole point of
    // the append path — an exchange here would mean maintenance degraded
    // the serving layout to a plain table)
    import org.apache.spark.sql.functions.col
    import graft.ext.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
    Similarity.persistAnnIndex(
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", coarse, books,
      table = "graft_ann_idx_app_audit", buckets = 4)
    Similarity.appendAnnIndex(
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", coarse, books,
      table = "graft_ann_idx_app_audit", buckets = 4)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val scored = Similarity.scoreAgainstAnnIndex(
        spark, "graft_ann_idx_app_audit", e.filter(col("vec_id") < 50),
        "vec_id", "embedding", coarse, books, nprobe = 2, k = 3)
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"appended index scan lost its bucketing:\n$plan")
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1,
        s"append degraded the layout: expected 1 query-side exchange, got $cellExchanges:\n$plan")
    }
  }

  test("TOMBSTONED ANN index: the delete anti-join broadcasts; the index side stays exchange-free") {
    // deleteFromAnnIndex must not cost the index its layout: the tombstone
    // set rides a BroadcastHashJoin LeftAnti (takedown-scale ids), which
    // PRESERVES the streamed side's bucketed output partitioning — so the
    // probe still plans exactly one (query-side) cell exchange
    import org.apache.spark.sql.functions.col
    import graft.ext.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
    Similarity.persistAnnIndex(
      e, "vec_id", "embedding", coarse, books, table = "graft_ann_idx_del_audit", buckets = 4)
    Similarity.deleteFromAnnIndex(
      spark, "graft_ann_idx_del_audit", e.filter(col("vec_id") % 3 === 0), "vec_id")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val scored = Similarity.scoreAgainstAnnIndex(
        spark, "graft_ann_idx_del_audit", e.filter(col("vec_id") < 50),
        "vec_id", "embedding", coarse, books, nprobe = 2, k = 3)
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"tombstoned index scan lost its bucketing:\n$plan")
      assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).nonEmpty,
        s"tombstones must anti-join via broadcast:\n$plan")
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1,
        s"delete degraded the layout: expected 1 query-side exchange, got $cellExchanges:\n$plan")
    }
  }

  test("REAPPENDED ANN index: era tombstones keep the broadcast anti-join; index side exchange-free") {
    // the delete-then-reappend composition must not change the plan shape:
    // the era condition (seq <= tomb_seq) rides the SAME broadcast
    // anti-join, the bucketed scan keeps its layout
    import org.apache.spark.sql.functions.col
    import graft.ext.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
    Similarity.persistAnnIndex(
      e, "vec_id", "embedding", coarse, books, table = "graft_ann_idx_reapp_audit", buckets = 4)
    Similarity.deleteFromAnnIndex(
      spark, "graft_ann_idx_reapp_audit", e.filter(col("vec_id") % 3 === 0), "vec_id")
    Similarity.appendAnnIndex(
      e.filter(col("vec_id") % 3 === 0 && col("vec_id") % 2 === 0),
      "vec_id", "embedding", coarse, books, "graft_ann_idx_reapp_audit", buckets = 4)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val scored = Similarity.scoreAgainstAnnIndex(
        spark, "graft_ann_idx_reapp_audit", e.filter(col("vec_id") < 50),
        "vec_id", "embedding", coarse, books, nprobe = 2, k = 3)
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"reappended index scan lost its bucketing:\n$plan")
      assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).nonEmpty,
        s"era tombstones must still anti-join via broadcast:\n$plan")
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1,
        s"reappend degraded the layout: expected 1 query-side exchange, got $cellExchanges:\n$plan")
    }
  }

  test("persisted IMAGE index probe: corpus side exchange-free; tombstones broadcast") {
    // the image modality's index carries the same plan contract as the
    // text/vector ones: bucketed (band, bv) scan, one batch-side exchange,
    // takedown tombstones on a broadcast anti-join
    import org.apache.spark.sql.functions.col
    import graft.ext.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hashes = Multimodal.dHashImages(Multimodal.synthImages(docs, "doc_id")).toDF()
    val corpus = hashes.filter(col("asset_id") % 5 =!= 0)
    val incoming = hashes.filter(col("asset_id") % 5 === 0)
    Multimodal.persistImageIndex(corpus, "asset_id", "dhash", "graft_img_idx_audit", buckets = 8)
    Multimodal.deleteFromImageIndex(
      spark, "graft_img_idx_audit",
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")), col("doc_id"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = Multimodal.probeImageIndex(
        spark, "graft_img_idx_audit", incoming, "asset_id", "dhash", maxHamming = 8)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"image probe did not sort-merge:\n$plan")
      assert(plan.contains("Bucketed: true"), s"image index scan is not bucketed:\n$plan")
      assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).nonEmpty,
        s"image tombstones must anti-join via broadcast:\n$plan")
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected 1 batch-side exchange, got $bandExchanges:\n$plan")
    }
  }

  test("quarantine sweep tick: quarantine side exchange-free, bounded sides broadcast") {
    // the recovery path carries the same plan contract as the serving
    // probe: the quarantine table is bucketed on the SAME (band, bv)
    // keys, so a tick's join reads it exchange-free; the tick-bucket set
    // (≤ maxBucketsPerTick rows) and the tombstones broadcast
    import org.apache.spark.sql.functions.col
    import graft.ext.Multimodal
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hashes = Multimodal.dHashImages(Multimodal.synthImages(docs, "doc_id")).toDF()
    val corpus = hashes.filter(col("asset_id") % 5 =!= 0)
    val incoming = hashes.filter(col("asset_id") % 5 === 0)
    // low cap so the tiny audit corpus genuinely quarantines buckets
    Multimodal.persistImageIndex(
      corpus, "asset_id", "dhash", "graft_img_sweep_audit", buckets = 8, maxBucket = 2)
    Multimodal.quarantineImageIndex(
      spark, "graft_img_sweep_audit", corpus, "asset_id", "dhash", buckets = 8, maxBucket = 2)
    Multimodal.deleteFromImageIndex(
      spark, "graft_img_sweep_audit",
      docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")), col("doc_id"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val tick = Multimodal.sweepHammingTickFrame(
        spark, "graft_img_sweep_audit", incoming, "asset_id", "dhash",
        maxHamming = 8, lo = 0L, hi = 4L)
      val plan = tick.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"quarantine scan is not bucketed:\n$plan")
      assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).nonEmpty,
        s"sweep tombstones must anti-join via broadcast:\n$plan")
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"expected 1 batch-side exchange only (quarantine side exchange-free), " +
          s"got $bandExchanges:\n$plan")
    }
  }

  test("indexCensus capped_ppm aggregation plans exchange-free on the bucketed index") {
    // the regrowth signal's bucket census groups on the table's OWN
    // bucket keys — the layout is the grouping, so the partial aggregate
    // must consume the scan with no (band, bv) exchange (the one
    // single-partition exchange for the final one-row rollup is inherent
    // to any scalar aggregate and allowed)
    import org.apache.spark.sql.functions.col
    import graft.ext.{Maintenance, Multimodal}
    import spark.implicits._
    val rows = (1L to 40L).map(i => ((i % 4).toInt, i % 7, i, i * 31))
      .toDF("band", "bv", "id", "fp")
    Multimodal.persistHammingIndexRows(rows, "graft_census_audit", buckets = 4, maxBucket = 8)
    val census = Maintenance.indexCensus(
      spark, "graft_census_audit", "corpus_id", "audit",
      bucketKeys = Seq("band", "bv"), bucketCap = 8)
    val plan = census.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(band".r.findAllIn(plan).isEmpty,
      s"the bucket census re-shuffled the bucketed index:\n$plan")
    assert(census.collect().head.getAs[Long]("capped_ppm") >= 0L)
  }

  test("COMPACTED ANN index: one file per bucket and the probe still plans exchange-free") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
    Similarity.persistAnnIndex(
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", coarse, books,
      table = "graft_ann_idx_cmp_audit", buckets = 4)
    Similarity.appendAnnIndex(
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", coarse, books,
      table = "graft_ann_idx_cmp_audit", buckets = 4)
    Similarity.deleteFromAnnIndex(
      spark, "graft_ann_idx_cmp_audit", e.filter(col("vec_id") % 3 === 0), "vec_id")
    Similarity.compactAnnIndex(spark, "graft_ann_idx_cmp_audit", buckets = 4)
    // layout healed: at most one file per bucket (empty buckets write none)
    val files = graft.sources.Sources.tableFileCount(spark, "graft_ann_idx_cmp_audit")
    assert(files <= 4, s"compaction must leave at most one file per bucket, got $files")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val scored = Similarity.scoreAgainstAnnIndex(
        spark, "graft_ann_idx_cmp_audit", e.filter(col("vec_id") < 50),
        "vec_id", "embedding", coarse, books, nprobe = 2, k = 3)
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"compacted index scan lost its bucketing:\n$plan")
      // tombstones were folded in and retired — no anti-join remains
      assert(!plan.contains("LeftAnti"), s"compacted probe still anti-joins:\n$plan")
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1,
        s"compaction degraded the layout: expected 1 query-side exchange, got $cellExchanges:\n$plan")
    }
  }

  test("FILTERED ANN index probe: the predicate pushes into the bucketed scan, no extra exchange") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Similarity
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
    Similarity.persistAnnIndex(
      e, "vec_id", "embedding", coarse, books, table = "graft_ann_idx_filt_audit", buckets = 4)
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val scored = Similarity.scoreAgainstAnnIndexWhere(
        spark, "graft_ann_idx_filt_audit", e.filter(col("vec_id") < 50),
        "vec_id", "embedding", coarse, books, nprobe = 2, k = 3,
        candPred = Some(col("cand_id") < 300))
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"filtered index scan lost its bucketing:\n$plan")
      // the sargable range predicate must reach the parquet reader — a
      // filter evaluated only post-scan decodes every row group for
      // nothing at 100 TB
      assert("PushedFilters: \\[[^\\]]*LessThan\\(cand_id,300\\)".r.findFirstIn(plan).nonEmpty,
        s"candidate predicate did not push into the scan:\n$plan")
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1,
        s"filter degraded the layout: expected 1 query-side exchange, got $cellExchanges:\n$plan")
    }
  }

  test("TOMBSTONED LSH index: the delete anti-join broadcasts; the corpus side stays exchange-free") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    Dedup.persistLshIndex(
      corpus, col("doc_id"), col("text"), table = "graft_lsh_idx_del_audit", buckets = 8)
    Dedup.deleteFromLshIndex(
      spark, "graft_lsh_idx_del_audit", docs.filter(col("doc_id") % 3 === 0), col("doc_id"))
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = Dedup.probeLshIndex(
        spark, "graft_lsh_idx_del_audit", incoming, col("doc_id"), col("text"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"tombstoned index scan lost its bucketing:\n$plan")
      assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(plan).nonEmpty,
        s"tombstones must anti-join via broadcast:\n$plan")
      val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(bandExchanges == 1,
        s"delete degraded the layout: expected 1 batch-side exchange, got $bandExchanges:\n$plan")
    }
  }

  test("persisted semantic index: the probe joins exchange-free off the bucketed cell scan") {
    import org.apache.spark.sql.functions.col
    import graft.ext.{Dedup, Similarity}
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    Dedup.persistSemanticIndex(
      e.filter(col("vec_id") % 5 =!= 0), col("vec_id"), col("embedding"), cents,
      table = "graft_sem_idx_audit", buckets = 4)
    // broadcast would hide the layout story at fixture scale — force the
    // sort-merge path a 100 TB index takes
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val probe = Dedup.probeSemanticIndex(
        spark, "graft_sem_idx_audit", e.filter(col("vec_id") % 5 === 0),
        col("vec_id"), col("embedding"), cents, tau = 0.4)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"probe did not sort-merge:\n$plan")
      assert(plan.contains("Bucketed: true"), s"index scan is not bucketed:\n$plan")
      // exactly ONE cell-keyed exchange: the incoming batch aligning to
      // the index layout; a second would mean the corpus side reshuffled
      val cellExchanges = "Exchange hashpartitioning\\(cell".r.findAllIn(plan).size
      assert(cellExchanges == 1, s"expected 1 batch-side exchange, got $cellExchanges:\n$plan")
    }
  }

  test("dpp join: the fact scan carries a runtime dynamicpruning partition filter") {
    val plan = planOf("s10_dpp_join")
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dim side lost its broadcast:\n$plan")
  }

  test("centroid outliers: the per-cell threshold joins back as a broadcast, never sort-merge") {
    val plan = planOf("curation_emb_outliers")
    assert(plan.contains("BroadcastHashJoin"), s"threshold table lost its broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"one-row-per-cell table sort-merged:\n$plan")
  }

  test("ks drift: raw rows collapse to the value histogram before any window runs") {
    // the (grp, v) count must partial-aggregate (two HashAggregate levels
    // around its exchange) and every window partitions on grp — a global
    // unpartitioned window would serialize the corpus through one task
    val plan = planOf("stats_ks_drift")
    assert("HashAggregate".r.findAllIn(plan).size >= 4, s"counts not partial-aggregated:\n$plan")
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition(grp"),
      s"window not partitioned by group:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"drift monitor degenerated:\n$plan")
  }

  test("runtime bloom filter injects on a selective shuffle join (the automatic j9)") {
    // when neither side broadcasts, Spark can inject a bloom filter from
    // the filtered build side into the probe scan (InjectRuntimeFilter) —
    // the engine-native form of LinkOps.bloomGatedJoin. Verify the engine
    // composes with it: might_contain gates the probe side pre-shuffle,
    // and the row result is the plain join's.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = spark.read.parquet(s"$dir/lineitem.parquet").select(col("l_partkey"), col("l_quantity"))
      val p = spark.read.parquet(s"$dir/part.parquet")
        .filter(col("p_size") === 10).select(col("p_partkey"), col("p_name"))
      val joined = li.join(p, li("l_partkey") === p("p_partkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"), s"no runtime bloom filter injected:\n$plan")
      val n = joined.count()
      val plain = li.join(broadcast(p), li("l_partkey") === p("p_partkey")).count()
      assert(n == plain, s"runtime-filtered join changed the result: $n vs $plain")
    }
  }

  test("AQE splits a skewed unsalted join at runtime; manual salting is for aggregates/streams") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hot key 0 carries 50k of 55k rows — the shape that funnels one
    // reducer without mitigation
    val big = spark.range(0, 55000).select(
      when($"id" < 50000, 0L).otherwise($"id" % 50 + 1).as("k"),
      concat(lit("payload_"), $"id").as("payload"))
    val dim = spark.range(0, 51).select($"id".as("k"), concat(lit("d"), $"id").as("dv"))
    def runPlan(): String = {
      val joined = big.join(dim, "k")
      // AQE decides at runtime — execute THIS QueryExecution (a .write
      // would spawn its own and leave this plan isFinalPlan=false)
      joined.collect()
      joined.queryExecution.executedPlan.toString
    }
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      val plan = runPlan()
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join below threshold:\n$plan")
    }
    // same join under the DEFAULT threshold (256 MB): the ~2 MB hot
    // partition is far below it, so no split happens — the crossover is
    // max(skewedPartitionThresholdInBytes, factor x median partition size)
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true") {
      val plan = runPlan()
      assert(!plan.contains("skew=true"),
        s"default-threshold run unexpectedly split:\n$plan")
    }
    // the manual salted form answers the cases AQE does not: skewed
    // AGGREGATES and streaming micro-batches. Its result is bit-identical
    // to the plain join - the correctness contract that lets a query
    // author apply it preemptively
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plain = rows(big.join(dim, "k"))
      val salted = rows(graft.ops.SkewOps.saltedJoin(big, dim, "k", col("payload"), salts = 8))
      assert(salted == plain, "salted join diverged from the plain join")
    }
  }
}
