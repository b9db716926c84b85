package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** Deduplication family: exact, MinHash-LSH, SimHash, semantic/embedding,
  * incremental, n-gram runs, containment, entity resolution.
  *
  * Split out of Extensions.scala (round 15): same entries, same maps —
  * [[Extensions]] aggregates the families, so the driver contract
  * (SparkEntry.queries / oracleSql) is unchanged.
  */
private[queries] object QDedup {
  import QShared._
  import OracleSql._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup ----------------------------------------------------------
    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    "dedup_minhash_pairs" -> { (s, dir) =>
      Dedup.minhashLshPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
    },
    // span-level benchmark contamination: every (train doc, probe doc)
    // pair's match count and longest exact shared token run — decontaminate,
    // answers "how much", this answers "where and how long"
    "corpus_contamination_spans" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      Dedup.crossNgramRuns(
        docs.filter(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 50 === 0), col("doc_id"), col("text"),
        n = 3, maxDocFreq = 10, minRunGrams = 2,
        contentKey = Some(s"documents|$dir|mod50ne0"))
    },
    // cross-document exact substring overlap: rare-gram inverted-index,
    // self-join + gaps-and-islands run resolution (Lee et al. 2022 shape)
    "dedup_ngram_runs" -> { (s, dir) =>
      Dedup.sharedNgramRuns(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        n = 3, maxDocFreq = 10, minRunGrams = 2,
        contentKey = Some(s"documents|$dir"))
    },
    "dedup_simhash" -> { (s, dir) =>
      Dedup.simhashed(tPar(s, dir, "documents"), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("fp"))
    },
    // k-NN similarity graph (the SemDeDup / graph-clustering input): each
    // doc keeps its top-3 most-similar neighbors among the LSH candidates
    // by exact verified Jaccard — no similarity threshold, a RANK cap, so
    // sparse regions still get neighbors. Symmetrized before ranking,
    // (LSH emits each unordered pair once); one bounded window per node
    "dedup_knn_graph" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val cands = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      val scored = cands
        .join(g.select(col("doc_id").as("id_lo"), col("grams").as("g_lo")), "id_lo")
        .join(g.select(col("doc_id").as("id_hi"), col("grams").as("g_hi")), "id_hi")
        .select(
          col("id_lo"), col("id_hi"),
          Dedup.jaccardSorted(col("g_lo"), col("g_hi")).as("jac"))
      val sym = scored
        .select(col("id_lo").as("src"), col("id_hi").as("dst"), col("jac"))
        .unionAll(scored.select(col("id_hi").as("src"), col("id_lo").as("dst"), col("jac")))
      val w = Window.partitionBy(col("src")).orderBy(col("jac").desc, col("dst").asc)
      sym
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("src"), col("dst"), col("rank"), round(col("jac"), 6).as("jac"))
    },
    // the quarantine surface of the capped LSH pair generation: every band
    // bucket whose membership exceeds the cap, for upstream handling — the,
    // boilerplate clusters the pairing stage deliberately skipped
    "dedup_oversized_buckets" -> { (s, dir) =>
      Dedup.oversizedBuckets(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        n = 3, k = 8, bands = 4, maxBucket = 2
      )
    },
    // full two-stage near-dup flow: LSH candidate generation -> exact
    // n-gram-Jaccard verification, the production dedup shape (candidates,
    // are cheap and approximate; only they pay the exact comparison)
    "dedup_near_verified" -> { (s, dir) =>
      // raw-similarity filter + round-for-output live in the shared
      // verified-pairs helper; the content key shares the verified set
      // with corpus_data_card_v2 and across bench passes
      Dedup
        .verifiedNearDupPairs(
          tPar(s, dir, "documents"), col("doc_id"), col("text"),
          n = 3, k = 8, bands = 4, tau = 0.7,
          contentKey = Some(s"documents|$dir"))
        .select(col("id_lo"), col("id_hi"), round(col("jac_raw"), 6).as("jac"))
    },
    // incremental ingestion dedup: every 5th doc arrives as the "new batch",
    // the rest are the existing corpus index; probe-join (never corpus×corpus),
    // then exact-Jaccard verify — which incoming docs duplicate the corpus
    "dedup_incremental" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      val cands = Dedup.minhashLshProbePairs(
        corpus, incoming, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      cands
        .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
        .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
        .select(
          col("new_id"), col("corpus_id"),
          Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
    },
    // the PERSISTED-index form of dedup_incremental: the corpus (band,bh)
    // index is written bucketBy(band,bh) once (layout time) and the batch
    // probe joins it exchange-free on the corpus side (query time) — the
    // production shape at 100 TB, where re-deriving the index per batch,
    // would redo O(corpus) signature work. Same pairs, same oracle.
    "dedup_incremental_bucketed" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      // pid-scoped name: a fixed one would let a concurrent verify DROP
      // the table out from under a bench JVM's probe (Scratch's
      // concurrent-JVM concern, catalog-table form)
      val idxTable = Scratch.table("lsh_idx")
      Scratch.tableOnce(idxTable, dir)(
        Dedup.persistLshIndex(
          corpus, col("doc_id"), col("text"), table = idxTable, buckets = 8,
          n = 3, k = 8, bands = 4))
      val cands = Dedup.probeLshIndex(
        s, idxTable, incoming, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      cands
        .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
        .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
        .select(
          col("new_id"), col("corpus_id"),
          Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
    },
    // index RETRACTION — the delete half of the LSH maintenance cycle:
    // persist the corpus index, tombstone an md5-gated stratum
    // (Dedup.deleteFromLshIndex — takedowns/re-crawls retracting docs),
    // then run the same probe + exact-Jaccard verify chain. Oracle =
    // rebuild WITHOUT the deleted ids: tombstone-then-probe must
    // hash-equal rebuild-without-deleted-then-probe. The tombstones ride
    // a broadcast anti-join, so the bucketed corpus scan stays
    // exchange-free (PlanAuditSpec)
    "dedup_index_delete" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      val idxTable = Scratch.table("lsh_idx_del")
      Scratch.registerTable(graft.ext.Similarity.tombTable(idxTable))
      Scratch.tableOnce(idxTable, dir) {
        Dedup.persistLshIndex(
          corpus, col("doc_id"), col("text"), table = idxTable, buckets = 8,
          n = 3, k = 8, bands = 4)
        Dedup.deleteFromLshIndex(
          s, idxTable,
          docs.filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 7L) === 0),
          col("doc_id"))
      }
      val cands = Dedup.probeLshIndex(
        s, idxTable, incoming, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      cands
        .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
        .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
        .select(
          col("new_id"), col("corpus_id"),
          Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
    },
    // DELETE-THEN-REAPPEND — the takedown-reversal/re-crawl workflow the
    // id-only tombstone could not express (a re-appended id stayed hidden
    // behind its own stale tombstone until compaction): tombstones are now
    // ERA-stamped and hide only rows appended at era ≤ tomb_seq, so the
    // re-appended even half of the retracted stratum is visible
    // IMMEDIATELY — no compaction between the delete and the re-append.
    // Oracle = rebuild WITH the re-appended docs: at sf0.01 the pairs
    // 455→26, 120→332, 295→374, 435→486 exist ONLY via the re-append,
    // while 45→413 and 420→393 (odd, not re-appended) stay retracted
    "dedup_index_reappend" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      val idxTable = Scratch.table("lsh_idx_reapp")
      Scratch.registerTable(graft.ext.Similarity.tombTable(idxTable))
      val delGate = graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 7L) === 0
      Scratch.tableOnce(idxTable, dir) {
        Dedup.persistLshIndex(
          corpus, col("doc_id"), col("text"), table = idxTable, buckets = 8,
          n = 3, k = 8, bands = 4)
        Dedup.deleteFromLshIndex(s, idxTable, docs.filter(delGate), col("doc_id"))
        Dedup.appendLshIndex(
          corpus.filter(delGate && col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), idxTable, buckets = 8, n = 3, k = 8, bands = 4)
      }
      val cands = Dedup.probeLshIndex(
        s, idxTable, incoming, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      cands
        .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
        .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
        .select(
          col("new_id"), col("corpus_id"),
          Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
    },
    // versioned probe-safe REBUILD — the text index's blue/green arc
    // (Dedup.rebuildLshIndex over the shared publishVersion machinery):
    // a STALE index (half the corpus) with an md5%7 takedown stratum
    // tombstoned is replaced by a full-corpus rebuild published as an
    // immutable __v1 version in one catalog RENAME; the tombstones drop
    // with the new authority, so the re-crawled stratum is visible and
    // the probe equals the fresh-full-corpus index exactly (oracle =
    // incrementalProbeSql, shared verbatim with dedup_incremental_bucketed
    // — the rebuild-equivalence claim IS one oracle)
    "dedup_index_rebuild" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val incoming = docs.filter(col("doc_id") % 5 === 0)
      val idxTable = Scratch.table("lsh_idx_rb")
      Scratch.registerVersionedIndex(idxTable)
      Scratch.tableOnce(idxTable, dir) {
        Dedup.persistLshIndex(
          corpus.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"),
          table = idxTable, buckets = 8, n = 3, k = 8, bands = 4)
        Dedup.deleteFromLshIndex(
          s, idxTable,
          docs.filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 7L) === 0),
          col("doc_id"))
        Dedup.rebuildLshIndex(
          s, idxTable, corpus, col("doc_id"), col("text"), buckets = 8,
          n = 3, k = 8, bands = 4)
      }
      val cands = Dedup.probeLshIndex(
        s, idxTable, incoming, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      cands
        .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
        .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
        .select(
          col("new_id"), col("corpus_id"),
          Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
    },
    // cluster resolution: LSH candidates -> connected components -> one,
    // canonical doc per near-dup cluster (the production dedup tail)
    "dedup_clusters" -> { (s, dir) =>
      Dedup.connectedComponentsKeyed(
        Dedup.minhashLshPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4),
        contentKey = s"documents|$dir|mh3-8-4", spark = s)
    },
    // end-to-end near-dedup: cluster labels joined back onto the corpus,
    // one survivor per cluster by quality (max n_chars, id tiebreak) —
    // the canonical-corpus selection a dedup pipeline actually ships.,
    // Partitioned window (by cluster), never global
    "dedup_survivors" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val clusters = Dedup.connectedComponentsKeyed(
        Dedup.minhashLshPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4),
        contentKey = s"documents|$dir|mh3-8-4", spark = s)
      val labeled = docs
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("canonical_id"), col("doc_id")))
      val w = Window.partitionBy(col("cluster_id")).orderBy(col("n_chars").desc, col("doc_id").asc)
      labeled
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"))
    },
    // QUALITY-AWARE survivor election (the RefinedWeb convention): per
    // near-dup cluster keep argmax(TextStats.qualityScore, tie → min id) —
    // composing the CC labels with the text-quality signal instead of the
    // quality-blind min-id/max-length elections above. ONE hash aggregate
    // (max over (score, −id) structs — partials combine map-side, no
    // full-cluster window sort); oracle replays quality scoring AND the,
    // election over the same recursive cluster chain
    "dedup_survivors_quality" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val clusters = Dedup.connectedComponentsKeyed(
        Dedup.minhashLshPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4),
        contentKey = s"documents|$dir|mh3-8-4", spark = s)
      val labeled = docs
        .select(col("doc_id"), TextStats.qualityScore(col("text")).as("quality"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("canonical_id"), col("doc_id")))
      Dedup.survivorsBy(labeled, col("cluster_id"), col("doc_id"), col("quality"), "quality")
    },
    // corpus vocabulary: top-50 tokens by exact count (tie-broken by token
    // so the LIMIT boundary is deterministic in any engine)
    // gibberish/compression gate: Shannon bits-per-char from exact
    // (doc, char) counts — alphabet-bounded per-doc frames, the one ln,
    "dedup_setsim_exact" -> { (s, dir) =>
      Dedup.prefixFilterPairs(
        tPar(s, dir, "documents"), col("doc_id"), col("text"), tauNum = 19, tauDen = 20)
    },
    // triangle census of the exact near-dup graph (setsim τ=19/20 edges
    // — the SAME spilled token table serves both queries): vertices,
    // edges, wedges, triangles, global clustering coefficient. Near-dup
    // clusters are near-cliques, so the triangle count is the,
    "ngram_jaccard" -> { (s, dir) =>
      val g = Dedup.shingled(tPar(s, dir, "documents"), col("doc_id"), col("text"), 3)
      val a = g.as("a")
      val b = g.as("b")
      a.join(b, col("b.doc_id") === col("a.doc_id") + 1)
        .select(
          col("a.doc_id").as("id_lo"),
          col("b.doc_id").as("id_hi"),
          Dedup.jaccardSorted(col("a.grams"), col("b.grams")).as("jac")
        )
    },
    // ---- similarity search ----------------------------------------------,
    // docs — the frames vanish, the bodies survive byte-identically
    "dedup_strip_boilerplate" -> { (s, dir) =>
      val framed = t(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("NAV: home | products | contact\n"),
          col("text"),
          lit("\nCOPYRIGHT 2024 example.com")).as("text"))
      Dedup.stripBoilerplate(framed, "doc_id", "text", maxDocs = 50)
    },
    // ---- events / sessionization ------------------------------------------,
    // quantized math => full DuckDB twin; recall tested in DedupSpec.
    "dedup_embedding" -> { (s, dir) =>
      Dedup.embeddingNearDupPairs(
        tPar(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        dim = 64, planes = 4, threshold = 0.2
      )
    },
    // embedding-space incremental dedup: every 5th vector arrives as the
    // new batch and probes the corpus's SRP-bucket index — the semantic,
    // twin of dedup_incremental (cross-side collisions only)
    "dedup_embedding_incremental" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      Dedup.embeddingIncrementalPairs(
        e.filter(col("vec_id") % 5 =!= 0),
        e.filter(col("vec_id") % 5 === 0),
        col("vec_id"), col("embedding"),
        dim = 64, planes = 4, threshold = 0.2)
    },
    // SemDeDup-style semantic near-dup: k-means cells (the trained coarse
    // quantizer, same 8-cell/2-iteration model as ann_ivf_kmeans) bound
    // the pair comparisons; the oracle replays training, assignment, and
    // within-cell pruning verbatim. tau is data-relative: the synthetic,
    // embeddings top out near cos 0.51, so 0.42 prunes the densest tail.
    "dedup_semantic_pairs" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      Dedup.semanticPairs(e, col("vec_id"), col("embedding"), cents, tau = 0.42)
    },
    // the kept set under the greedy lowest-id rule: drop any vector with a,
    // lower-id within-cell neighbor at cos >= tau
    "dedup_semantic_survivors" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      Dedup.semanticSurvivors(e, col("vec_id"), col("embedding"), cents, tau = 0.42)
        .select(col("vec_id"))
    },
    // QUALITY-AWARE semantic survivors (the RefinedWeb election the CC
    // path got in dedup_survivors_quality, now on the semantic path too):
    // per within-cell pair at cos >= tau, drop the member with the LOWER
    // quality (doc length via the vec_id = doc_id fixture join; ties ->
    // keep the lower id). Differs from the quality-blind kept set
    // wherever a pair's higher id is the longer document
    "dedup_semantic_survivors_quality" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val q = t(s, dir, "documents").select(col("doc_id").as("vec_id"), col("n_chars"))
      val cents = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      Dedup.semanticSurvivorsBy(
        e.join(q, "vec_id"), col("vec_id"), col("embedding"), cents,
        tau = 0.42, scoreCol = col("n_chars"))
        .select(col("vec_id"))
    },
    // the PERSISTED-index form: the corpus's (cell, id, vec, nrm) frame is
    // written bucketBy(cell) once (layout time) and every 5th vector
    // arrives as the incoming batch probing it exchange-free on the
    // corpus side — the semantic twin of dedup_incremental_bucketed.
    // The quantizer is trained on the FULL corpus (train once, serve,
    // batches), so the oracle shares the ann_ivf_kmeans training CTEs.
    "dedup_semantic_incremental" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val corpus = e.filter(col("vec_id") % 5 =!= 0)
      val incoming = e.filter(col("vec_id") % 5 === 0)
      val tbl = Scratch.table("sem_idx")
      Scratch.tableOnce(tbl, dir)(
        Dedup.persistSemanticIndex(corpus, col("vec_id"), col("embedding"), cents, tbl, buckets = 8))
      Dedup.probeSemanticIndex(s, tbl, incoming, col("vec_id"), col("embedding"), cents, tau = 0.42)
    },
    // the semantic index's FULL maintenance lifecycle in one query —
    // build one era, append the next with the PINNED centroids, tombstone
    // an md5-gated stratum, compact (fold tombstones, one file per cell
    // bucket), then probe. Oracle = the one-shot index over the corpus
    // MINUS the deleted stratum: append ≡ rebuild and delete-then-probe ≡
    // rebuild-without-deleted, composed — the same contracts the LSH and
    // IVFPQ indexes carry, now symmetric across all THREE persisted,
    // indexes
    "dedup_semantic_maintained" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val corpus = e.filter(col("vec_id") % 5 =!= 0)
      val incoming = e.filter(col("vec_id") % 5 === 0)
      val tbl = Scratch.table("sem_idx_mnt")
      Scratch.registerTable(Similarity.tombTable(tbl))
      Scratch.registerTable(tbl + "__compact_stage")
      Scratch.tableOnce(tbl, dir) {
        val g = graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 4L)
        Dedup.persistSemanticIndex(
          corpus.filter(g =!= 0), col("vec_id"), col("embedding"), cents, tbl, buckets = 8)
        Dedup.appendSemanticIndex(
          corpus.filter(g === 0), col("vec_id"), col("embedding"), cents, tbl, buckets = 8)
        Dedup.deleteFromSemanticIndex(
          s, tbl,
          e.filter(graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 7L) === 0),
          col("vec_id"))
        Dedup.compactSemanticIndex(s, tbl, buckets = 8)
      }
      Dedup.probeSemanticIndex(s, tbl, incoming, col("vec_id"), col("embedding"), cents, tau = 0.42)
    },
    // versioned probe-safe REBUILD for the semantic index — the
    // re-clustering arc: the semantic index's model IS its pinned centroid
    // matrix, so a retrain means a full re-assign (never append rows
    // assigned under different centroids). A STALE index (half the corpus,
    // centroids fitted on that half) with an md5%7 takedown stratum
    // tombstoned is replaced by a full-corpus rebuild under the FRESH
    // centroids, published as an immutable version in one catalog RENAME;
    // the probe (same fresh centroids) equals the fresh-full-corpus index
    // exactly — oracle shared verbatim with dedup_semantic_incremental
    "dedup_semantic_rebuild" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val stale = e.filter(col("vec_id") % 2 === 0)
      val staleCents =
        Similarity.kmeansCentroidsCached(stale, "vec_id", "embedding", nlist = 8, iters = 2)
      val cents = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val corpus = e.filter(col("vec_id") % 5 =!= 0)
      val incoming = e.filter(col("vec_id") % 5 === 0)
      val tbl = Scratch.table("sem_idx_rb")
      Scratch.registerVersionedIndex(tbl)
      Scratch.tableOnce(tbl, dir) {
        Dedup.persistSemanticIndex(
          corpus.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"),
          staleCents, tbl, buckets = 8)
        Dedup.deleteFromSemanticIndex(
          s, tbl,
          e.filter(graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 7L) === 0),
          col("vec_id"))
        Dedup.rebuildSemanticIndex(
          s, tbl, corpus, col("vec_id"), col("embedding"), cents, buckets = 8)
      }
      Dedup.probeSemanticIndex(s, tbl, incoming, col("vec_id"), col("embedding"), cents, tau = 0.42)
    },
    // ---- curation: packing / scrubbing / repetition / sketches / rank ----
    // sequence packing: token-budget packs per salt group (distributed —,
    // segment guarantee is exact; oracle replays fixture, blocks, verify
    "fuzzy_name_pairs" -> { (s, dir) =>
      // content-keyed: three declared queries (this, er_blocking_quality,
      // er_entities) consume the same blocked-pair frame — computed once
      graft.ops.FuzzyOps.editBlockedPairs(
        fuzzyNames(s, dir), col("id"), col("s"), maxDist = 2, maxBlock = 64,
        contentKey = Some(s"fuzzy|$dir"))
    },
    // asymmetric containment join over 3-gram sets (|A∩B|/|A| >= 9/10):
    // the quote/subset detector Jaccard misses — containment prefix on
    // the probe side, full-gram inverted index on the contained-in side,
    // one merge-walk verify per deduped candidate; all compares integer,
    "dedup_containment" -> { (s, dir) =>
      Dedup.containmentPairs(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        tauNum = 9, tauDen = 10, shingle = 3)
    },
    // blocking-quality audit: MEASURED pair completeness of the segment
    // blocker against exact all-pairs truth on the md5 eval stratum
    // (1/20) — the assumed pigeonhole recall, checked; truth cost is,
    // fixed eval state, blocked pairs restrict via two semi-joins
    "er_blocking_quality" -> { (s, dir) =>
      graft.ops.FuzzyOps.blockingQuality(
        fuzzyNames(s, dir), col("id"), col("s"),
        maxDist = 2, maxBlock = 64, strataMod = 20L,
        contentKey = Some(s"fuzzy|$dir"))
    },
    // end-to-end entity resolution: the blocked edit-distance matcher's
    // pairs become entity clusters via pointer-jumping CC, singletons keep
    // their own id, and every record carries its entity + member count —,
    // the block → match → cluster → label composition an MDM pipeline runs
    "er_entities" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val names = fuzzyNames(s, dir)
      val pairs = graft.ops.FuzzyOps
        .editBlockedPairs(
          names, col("id"), col("s"), maxDist = 2, maxBlock = 64,
          contentKey = Some(s"fuzzy|$dir"))
        .select(col("id_lo"), col("id_hi"))
      // plain CC, computed every invocation: the keyed memo that briefly
      // lived here had exactly ONE consumer, so it saved nothing within a
      // run and only flattered the bench's min-of-passes (r21 verdict) —
      // the label loop itself is the honest cost, and it is paced to one
      // Spark job per round (connectedComponents)
      val clusters = Dedup
        .connectedComponents(pairs)
        .withColumnRenamed("doc_id", "id")
      names
        .join(clusters, Seq("id"), "left")
        .withColumn("entity_id", coalesce(col("canonical_id"), col("id")))
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("entity_id"))))
        .select(col("id"), col("entity_id"), col("n_members"))
    },
    // hot-key DIAGNOSTIC: the exact per-key weight audit you run before
    // paying for a salting rewrite — top-20 heaviest user_ids with integer
    // ppm share and ×-mean weight; per-key partial agg + scalar totals, no,
  )

  /** The semantic-index probe chain (trained-quantizer cell join + exact
    * cosine) with explicit batch/corpus membership predicates — shared by
    * the incremental probe and the full-lifecycle (append/delete/compact)
    * twin, whose corpus side is rebuild-without-deleted.
    */
  private def semanticProbeSqlFor(newPred: String, corpusPred: String): String =
    qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , av AS (
          SELECT a.cell, a.vec_id, z.q FROM assign a JOIN qz z USING (vec_id)
        ), sprs AS (
          SELECT x.vec_id AS new_id, y.vec_id AS corpus_id,
                 round(${cosSql("x.q", "y.q")}, 6) AS sim
          FROM av x JOIN av y
            ON x.cell = y.cell AND ($newPred) AND ($corpusPred)
        )
        SELECT new_id, corpus_id, sim FROM sprs WHERE sim >= 0.42"""

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_dupes
         FROM documents GROUP BY md5(text)""",
    "dedup_minhash_pairs" -> minhashPairsOracleSql,
    "corpus_contamination_spans" ->
      """WITH tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
         pr AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
         wt AS (SELECT doc_id, regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM tr),
         gt AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                       concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS gram
                FROM wt, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) t(i)
                WHERE len(toks) >= 3),
         wp AS (SELECT doc_id, regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM pr),
         gp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                       concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS gram
                FROM wp, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) t(i)
                WHERE len(toks) >= 3),
         rare AS (
           SELECT gram FROM (
             SELECT gram, count(DISTINCT doc_id) AS nd FROM gt GROUP BY 1)
           WHERE nd <= 10),
         m AS (SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, a.pos AS pos_lo, b.pos AS pos_hi
               FROM gt a JOIN rare USING (gram) JOIN gp b USING (gram)),
         r AS (SELECT id_lo, id_hi, pos_lo - pos_hi AS diag, pos_lo,
                      pos_lo - row_number() OVER (PARTITION BY id_lo, id_hi, pos_lo - pos_hi ORDER BY pos_lo) AS island
               FROM m),
         runs AS (SELECT id_lo, id_hi, CAST(count(*) AS BIGINT) AS run_len,
                         min(pos_lo) AS start
                  FROM r GROUP BY id_lo, id_hi, diag, island),
         r2 AS (SELECT *, max(run_len) OVER (PARTITION BY id_lo, id_hi) AS maxrun FROM runs)
         SELECT id_lo AS doc_id, id_hi AS bench_id,
                CAST(sum(run_len) AS BIGINT) AS n_matches,
                CAST(max(run_len) + 2 AS BIGINT) AS max_run_tokens,
                CAST(min(CASE WHEN run_len = maxrun THEN start END) AS BIGINT) AS max_run_start
         FROM r2 GROUP BY 1, 2
         HAVING max(run_len) >= 2""",
    "dedup_ngram_runs" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM documents),
         g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                      concat_ws(' ', toks[i], toks[i+1], toks[i+2]) AS gram
               FROM w, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) t(i)
               WHERE len(toks) >= 3),
         rare AS (
           SELECT gram FROM (
             SELECT gram, count(DISTINCT doc_id) AS ndocs FROM g GROUP BY 1)
           WHERE ndocs <= 10),
         m AS (SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, a.pos AS pos_lo, b.pos AS pos_hi
               FROM g a JOIN rare USING (gram) JOIN g b USING (gram)
               WHERE a.doc_id < b.doc_id),
         r AS (SELECT id_lo, id_hi, pos_lo - pos_hi AS diag, pos_lo,
                      pos_lo - row_number() OVER (PARTITION BY id_lo, id_hi, pos_lo - pos_hi ORDER BY pos_lo) AS island
               FROM m),
         runs AS (SELECT id_lo, id_hi, CAST(count(*) AS BIGINT) AS run_len,
                         min(pos_lo) AS start
                  FROM r GROUP BY id_lo, id_hi, diag, island),
         r2 AS (SELECT *, max(run_len) OVER (PARTITION BY id_lo, id_hi) AS maxrun FROM runs)
         SELECT id_lo, id_hi,
                CAST(sum(run_len) AS BIGINT) AS n_matches,
                CAST(max(run_len) + 2 AS BIGINT) AS max_run_tokens,
                CAST(min(CASE WHEN run_len = maxrun THEN start END) AS BIGINT) AS max_run_start
         FROM r2 GROUP BY 1, 2
         HAVING max(run_len) >= 2""",
    "dedup_simhash" ->
      s"""WITH tok AS (
            SELECT doc_id,
              list_transform(list_distinct(regexp_split_to_array(trim(text), '\\s+')), t -> md5(t)) AS hexes
            FROM documents
          ), bits AS (
            SELECT doc_id, i,
              list_sum(list_transform(hexes, h ->
                CASE WHEN (${hexval("substr(h, CAST(i // 4 AS INTEGER) + 1, 1)")} >> CAST(i % 4 AS INTEGER)) % 2 = 1
                     THEN 1 ELSE -1 END)) AS s
            FROM tok, range(0, 32) t(i)
          )
          SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT) AS fp
          FROM bits GROUP BY doc_id""",
    "dedup_oversized_buckets" ->
      (gramsCte + """
        , sig AS (
          SELECT doc_id, [
            list_aggregate(list_transform(grams, x -> substr(md5(x),  1, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x),  9, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x), 17, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x), 25, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'),  1, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'),  9, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'), 17, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'), 25, 8)), 'min')
          ] AS sig FROM g
        ), banded AS (
          SELECT doc_id, b, md5(concat(sig[2*b + 1], '|', sig[2*b + 2])) AS bh
          FROM sig, range(0, 4) t(b)
        )
        SELECT CAST(b AS INTEGER) AS band, bh, count(*) AS n_members
        FROM banded GROUP BY b, bh HAVING count(*) > 2"""),
    "dedup_near_verified" ->
      (gramsCte + """
        , sig AS (
          SELECT doc_id, [
            list_aggregate(list_transform(grams, x -> substr(md5(x),  1, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x),  9, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x), 17, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x), 25, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'),  1, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'),  9, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'), 17, 8)), 'min'),
            list_aggregate(list_transform(grams, x -> substr(md5(x || '#1'), 25, 8)), 'min')
          ] AS sig FROM g
        ), banded AS (
          SELECT doc_id, b, md5(concat(sig[2*b + 1], '|', sig[2*b + 2])) AS bh
          FROM sig, range(0, 4) t(b)
        ), cands AS (
          SELECT DISTINCT a.doc_id AS id_lo, b.doc_id AS id_hi
          FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
        )
        SELECT id_lo, id_hi,
          round(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                / len(list_distinct(list_concat(ga.grams, gb.grams))), 6) AS jac
        FROM cands
        JOIN g ga ON ga.doc_id = id_lo
        JOIN g gb ON gb.doc_id = id_hi
        WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
              / len(list_distinct(list_concat(ga.grams, gb.grams))) >= 0.7"""),
    // knn-graph twin: the shared LSH candidate CTE chain, exact Jaccard,
    // symmetrize, top-3 per node by (jac DESC, dst),
    "dedup_knn_graph" ->
      (gramsCte + sigBandedCandsCte + """
        , scored AS (
          SELECT id_lo, id_hi,
            CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
              / len(list_distinct(list_concat(ga.grams, gb.grams))) AS jac
          FROM cands
          JOIN g ga ON ga.doc_id = id_lo
          JOIN g gb ON gb.doc_id = id_hi
        ), sym AS (
          SELECT id_lo AS src, id_hi AS dst, jac FROM scored
          UNION ALL
          SELECT id_hi AS src, id_lo AS dst, jac FROM scored
        ), rk AS (
          SELECT src, dst, jac,
                 CAST(row_number() OVER (PARTITION BY src ORDER BY jac DESC, dst) AS INTEGER) AS rank
          FROM sym)
        SELECT src, dst, rank, round(jac, 6) AS jac FROM rk WHERE rank <= 3"""),
    "dedup_incremental" -> incrementalProbeSql,
    // the persisted-bucketed probe is an EXECUTION-layout variant: the,
    // pair set is defined identically, so the oracle is shared verbatim
    "dedup_incremental_bucketed" -> incrementalProbeSql,
    // rebuild-equivalence: the versioned rebuild's serving state IS the
    // fresh full-corpus index, so the probe oracle is shared verbatim
    // with dedup_incremental_bucketed
    "dedup_index_rebuild" -> incrementalProbeSql,
    "dedup_index_delete" -> dedupIndexDeleteSql,
    // rebuild WITH the re-appended docs: the retracted md5%7 stratum is
    // excluded EXCEPT its re-appended even half — era-stamped tombstones
    // make the re-append visible immediately (delete-then-reappend needs
    // no compaction)
    "dedup_index_reappend" -> incrementalProbeSqlFor(
      "a.doc_id % 5 = 0",
      s"b.doc_id % 5 <> 0 AND (NOT (${md5GateSql("b.doc_id", 7)}) OR b.doc_id % 2 = 0)"),
    "dedup_clusters" ->
      (clusterChainSql + """
        SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id"""),
    "dedup_survivors" ->
      (clusterChainSql + """
        , cl AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)
        , lab AS (
          SELECT d.doc_id, d.n_chars, coalesce(cl.canonical_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN cl USING (doc_id))
        SELECT doc_id, cluster_id, n_chars FROM (
          SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk
          FROM lab)
        WHERE rk = 1"""),
    // the quality election replays text_quality's scoring formula verbatim
    // (padded-lowered occ counts, the 0.4/0.4/0.2 weights, 4dp round) and
    // elects per cluster by (quality DESC, doc_id ASC)
    "dedup_survivors_quality" ->
      (clusterChainSql + s"""
        , cl AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)
        , qbase AS (
          SELECT doc_id,
            concat(' ', lower(coalesce(text, '')), ' ') AS p,
            CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
            CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
            CAST(length(coalesce(text, '')) - length(regexp_replace(coalesce(text, ''), '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct
          FROM documents
        ), qual AS (
          SELECT doc_id,
            round(
              CASE WHEN n_chars >= 50 AND n_chars <= 5000 THEN 1.0 ELSE 0.0 END * 0.4
              + least((CASE WHEN n_tokens > 0 THEN CAST((${TextStats.StopwordLexicons.flatMap(_._2).map(occSql).mkString(" + ")}) AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 2.0, 1.0) * 0.4
              + CASE WHEN (CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END) <= 0.1 THEN 0.2 ELSE 0.0 END,
              4) AS quality
          FROM qbase
        ), qlab AS (
          SELECT q.doc_id, q.quality, coalesce(cl.canonical_id, q.doc_id) AS cluster_id
          FROM qual q LEFT JOIN cl USING (doc_id))
        SELECT doc_id, cluster_id, quality FROM (
          SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY quality DESC, doc_id) AS rk
          FROM qlab)
        WHERE rk = 1"""),
    "ngram_jaccard" ->
      (gramsCte + """
        SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
          CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0 THEN 0.0
               ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) END AS jac
        FROM g a JOIN g b ON b.doc_id = a.doc_id + 1"""),
    // exact intersection counts), no prefix replay
    "dedup_setsim_exact" ->
      """WITH tok0 AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
                       FROM documents),
         tok AS (SELECT doc_id, token FROM tok0 WHERE length(token) > 0),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
         pair AS (SELECT a.doc_id AS lo, b.doc_id AS hi, CAST(count(*) AS BIGINT) AS inter
                  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
         SELECT lo AS id_lo, hi AS id_hi, inter, sa.n AS n_lo, sb.n AS n_hi
         FROM pair JOIN sz sa ON sa.doc_id = lo JOIN sz sb ON sb.doc_id = hi
         WHERE inter * 20 >= 19 * (sa.n + sb.n - inter)""",
    "dedup_strip_boilerplate" ->
      """WITH framed AS (
           SELECT doc_id,
                  concat('NAV: home | products | contact', chr(10),
                         text, chr(10), 'COPYRIGHT 2024 example.com') AS text
           FROM documents
         ), split AS (
           SELECT doc_id, string_split(text, chr(10)) AS parts FROM framed
         ), lines AS (
           SELECT doc_id, g.g AS ln, parts[g.g] AS line
           FROM split CROSS JOIN generate_series(1, 8) AS g(g)
           WHERE g.g <= len(parts)
         ), common AS (
           SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) > 50
         ), kept AS (
           SELECT l.doc_id, l.ln, l.line
           FROM lines l LEFT JOIN common c ON l.line = c.line
           WHERE c.line IS NULL
         )
         SELECT f.doc_id, coalesce(k.text, '') AS text
         FROM framed f LEFT JOIN (
           SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS text
           FROM kept GROUP BY doc_id
         ) k USING (doc_id)""",
    "dedup_embedding" ->
      (qzCte + s"""
        , bkt AS (SELECT vec_id, q, ${srpBucketSql(4)} AS bucket FROM qz)
        , prs AS (
          SELECT a.vec_id AS id_lo, b.vec_id AS id_hi,
                 round(${cosSql("a.q", "b.q")}, 6) AS sim
          FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT id_lo, id_hi, sim FROM prs WHERE sim >= 0.2"""),
    "dedup_embedding_incremental" ->
      (qzCte + s"""
        , bkt AS (SELECT vec_id, q, ${srpBucketSql(4)} AS bucket FROM qz)
        , prs AS (
          SELECT a.vec_id AS new_id, b.vec_id AS corpus_id,
                 round(${cosSql("a.q", "b.q")}, 6) AS sim
          FROM bkt a JOIN bkt b ON a.bucket = b.bucket
          WHERE a.vec_id % 5 = 0 AND b.vec_id % 5 <> 0
        )
        SELECT new_id, corpus_id, sim FROM prs WHERE sim >= 0.2"""),
    "dedup_semantic_pairs" ->
      (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , av AS (
          SELECT a.cell, a.vec_id, z.q FROM assign a JOIN qz z USING (vec_id)
        ), sprs AS (
          SELECT x.cell, x.vec_id AS id_lo, y.vec_id AS id_hi,
                 round(${cosSql("x.q", "y.q")}, 6) AS sim
          FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id < y.vec_id
        )
        SELECT cell, id_lo, id_hi, sim FROM sprs WHERE sim >= 0.42"""),
    "dedup_semantic_survivors" ->
      (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , av AS (
          SELECT a.cell, a.vec_id, z.q FROM assign a JOIN qz z USING (vec_id)
        ), sprs AS (
          SELECT x.cell, x.vec_id AS id_lo, y.vec_id AS id_hi,
                 round(${cosSql("x.q", "y.q")}, 6) AS sim
          FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id < y.vec_id
        )
        SELECT vec_id FROM qz
        WHERE vec_id NOT IN (SELECT id_hi FROM sprs WHERE sim >= 0.42)"""),
    // quality election twin: per pair drop the SHORTER document (ties ->
    // drop the higher id), replayed over the same trained-cell pair CTEs
    "dedup_semantic_survivors_quality" ->
      (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , av AS (
          SELECT a.cell, a.vec_id, z.q FROM assign a JOIN qz z USING (vec_id)
        ), sprs AS (
          SELECT x.cell, x.vec_id AS id_lo, y.vec_id AS id_hi,
                 round(${cosSql("x.q", "y.q")}, 6) AS sim
          FROM av x JOIN av y ON x.cell = y.cell AND x.vec_id < y.vec_id
        ), drp AS (
          SELECT CASE WHEN ca.n_chars >= cb.n_chars THEN p.id_hi ELSE p.id_lo END AS d
          FROM (SELECT id_lo, id_hi FROM sprs WHERE sim >= 0.42) p
          JOIN documents ca ON ca.doc_id = p.id_lo
          JOIN documents cb ON cb.doc_id = p.id_hi
        )
        SELECT vec_id FROM qz WHERE vec_id NOT IN (SELECT d FROM drp)"""),
    "dedup_semantic_incremental" ->
      semanticProbeSqlFor("x.vec_id % 5 = 0", "y.vec_id % 5 <> 0"),
    // rebuild-equivalence, semantic form: post-rebuild serving state =
    // fresh full-corpus index under the fresh centroids — the incremental
    // probe's oracle, shared verbatim
    "dedup_semantic_rebuild" ->
      semanticProbeSqlFor("x.vec_id % 5 = 0", "y.vec_id % 5 <> 0"),
    // lifecycle twin: the corpus side is rebuild-WITHOUT-deleted (the
    // tombstoned md5 stratum excluded) — append/delete/compact are all
    // layout under a pinned model, so one probe oracle covers the cycle
    "dedup_semantic_maintained" ->
      semanticProbeSqlFor(
        "x.vec_id % 5 = 0",
        s"y.vec_id % 5 <> 0 AND NOT (${md5GateSql("y.vec_id", 7)})"),
    "fuzzy_name_pairs" ->
      """WITH names AS (
           SELECT doc_id AS id,
             CASE WHEN doc_id % 5 = 0 THEN substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9)
             ELSE substr(substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9), 1, CAST(doc_id % 9 AS INTEGER))
                  || chr(CAST(85 + doc_id % 6 AS INTEGER))
                  || substr(substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9), CAST(doc_id % 9 AS INTEGER) + 2)
             END AS s
           FROM documents),
         segs AS (
           SELECT id, s, g AS seg_i,
                  substr(s, (g * length(s)) // 3 + 1,
                         ((g + 1) * length(s)) // 3 - (g * length(s)) // 3) AS seg
           FROM names CROSS JOIN generate_series(0, 2) t(g)),
         bn AS (SELECT seg_i, seg, count(*) AS n FROM segs GROUP BY 1, 2),
         ok AS (SELECT segs.* FROM segs JOIN bn USING (seg_i, seg) WHERE bn.n <= 64),
         cand AS (
           SELECT DISTINCT a.id AS id_lo, b.id AS id_hi, a.s AS s_lo, b.s AS s_hi
           FROM ok a JOIN ok b ON a.seg_i = b.seg_i AND a.seg = b.seg AND a.id < b.id)
         SELECT id_lo, id_hi, CAST(levenshtein(s_lo, s_hi) AS INTEGER) AS dist
         FROM cand WHERE levenshtein(s_lo, s_hi) <= 2""",
    // containment twin: the shared 3-gram CTE + all-shared-gram pair,
    // counts with the ASYMMETRIC threshold on |A|
    "dedup_containment" ->
      (gramsCte + """,
         tok AS (SELECT doc_id, unnest(grams) AS token FROM g),
         t2 AS (SELECT doc_id, token FROM tok WHERE length(token) > 0),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM t2 GROUP BY 1),
         pair AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
                  FROM t2 a JOIN t2 b ON a.token = b.token AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
         SELECT p.id_a, p.id_b, p.inter, sa.n AS n_a, sb.n AS n_b,
                CAST(p.inter * 1000000 // sa.n AS BIGINT) AS containment_ppm
         FROM pair p JOIN sz sa ON sa.doc_id = p.id_a JOIN sz sb ON sb.doc_id = p.id_b
         WHERE p.inter * 10 >= 9 * sa.n"""),
    // blocking-quality twin: the fuzzy-pair CTEs verbatim + stratum,
    // all-pairs truth and the same integer ppm completeness
    "er_blocking_quality" ->
      """WITH names AS (
           SELECT doc_id AS id,
             CASE WHEN doc_id % 5 = 0 THEN substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9)
             ELSE substr(substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9), 1, CAST(doc_id % 9 AS INTEGER))
                  || chr(CAST(85 + doc_id % 6 AS INTEGER))
                  || substr(substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9), CAST(doc_id % 9 AS INTEGER) + 2)
             END AS s
           FROM documents),
         st AS (SELECT id, s FROM names
                WHERE CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 = 0),
         segs AS (
           SELECT id, s, g AS seg_i,
                  substr(s, (g * length(s)) // 3 + 1,
                         ((g + 1) * length(s)) // 3 - (g * length(s)) // 3) AS seg
           FROM names CROSS JOIN generate_series(0, 2) t(g)),
         bn AS (SELECT seg_i, seg, count(*) AS n FROM segs GROUP BY 1, 2),
         ok AS (SELECT segs.* FROM segs JOIN bn USING (seg_i, seg) WHERE bn.n <= 64),
         cand AS (
           SELECT DISTINCT a.id AS id_lo, b.id AS id_hi, a.s AS s_lo, b.s AS s_hi
           FROM ok a JOIN ok b ON a.seg_i = b.seg_i AND a.seg = b.seg AND a.id < b.id),
         blocked AS (SELECT id_lo, id_hi FROM cand WHERE levenshtein(s_lo, s_hi) <= 2),
         bs AS (SELECT CAST(count(*) AS BIGINT) AS n_blocked_stratum
                FROM blocked
                WHERE id_lo IN (SELECT id FROM st) AND id_hi IN (SELECT id FROM st)),
         tru AS (SELECT CAST(count(*) AS BIGINT) AS n_true_stratum
                 FROM st a JOIN st b ON a.id < b.id
                 WHERE levenshtein(a.s, b.s) <= 2),
         base AS (SELECT CAST(count(*) AS BIGINT) AS n_records,
                    CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_stratum
                  FROM names)
         SELECT n_records, n_stratum, n_true_stratum, n_blocked_stratum,
                CASE WHEN n_true_stratum > 0
                     THEN CAST(n_blocked_stratum * 1000000 // n_true_stratum AS BIGINT)
                END AS completeness_ppm
         FROM base, tru, bs""",
    // (the clusterChainSql pattern over the matcher's edge set)
    "er_entities" ->
      """WITH RECURSIVE names AS (
           SELECT doc_id AS id,
             CASE WHEN doc_id % 5 = 0 THEN substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9)
             ELSE substr(substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9), 1, CAST(doc_id % 9 AS INTEGER))
                  || chr(CAST(85 + doc_id % 6 AS INTEGER))
                  || substr(substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 9), CAST(doc_id % 9 AS INTEGER) + 2)
             END AS s
           FROM documents),
         segs AS (
           SELECT id, s, g AS seg_i,
                  substr(s, (g * length(s)) // 3 + 1,
                         ((g + 1) * length(s)) // 3 - (g * length(s)) // 3) AS seg
           FROM names CROSS JOIN generate_series(0, 2) t(g)),
         bn AS (SELECT seg_i, seg, count(*) AS n FROM segs GROUP BY 1, 2),
         ok AS (SELECT segs.* FROM segs JOIN bn USING (seg_i, seg) WHERE bn.n <= 64),
         cand AS (
           SELECT DISTINCT a.id AS id_lo, b.id AS id_hi, a.s AS s_lo, b.s AS s_hi
           FROM ok a JOIN ok b ON a.seg_i = b.seg_i AND a.seg = b.seg AND a.id < b.id),
         pairs AS (SELECT id_lo, id_hi FROM cand WHERE levenshtein(s_lo, s_hi) <= 2),
         sym AS (SELECT id_lo AS a, id_hi AS b FROM pairs
                 UNION SELECT id_hi, id_lo FROM pairs),
         reach(id, r) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM sym) t
           UNION
           SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
         cl AS (SELECT id, min(r) AS ent FROM reach GROUP BY id)
         SELECT n.id, coalesce(cl.ent, n.id) AS entity_id,
                CAST(count(*) OVER (PARTITION BY coalesce(cl.ent, n.id)) AS BIGINT) AS n_members
         FROM names n LEFT JOIN cl ON cl.id = n.id""",
  )
}
