package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** LLM-training-data pipeline queries (north-star extensions, SURVEY.md
  * §7.5) over the `documents` / `embeddings` / `events` fixtures, with
  * DuckDB oracle twins. Hash-exactness tricks: shared md5-hex construction
  * for minhash/simhash/fingerprints (both engines have md5, neither shares
  * an integer hash), quantized integer dot products for cosine ranks, and
  * decimal-space sums cast to double at the end.
  */
object Extensions {
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
    // pair's match count and longest exact shared token run — decontaminate
    // answers "how much", this answers "where and how long"
    "corpus_contamination_spans" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      Dedup.crossNgramRuns(
        docs.filter(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 50 === 0), col("doc_id"), col("text"),
        n = 3, maxDocFreq = 10, minRunGrams = 2)
    },
    // cross-document exact substring overlap: rare-gram inverted-index
    // self-join + gaps-and-islands run resolution (Lee et al. 2022 shape)
    "dedup_ngram_runs" -> { (s, dir) =>
      Dedup.sharedNgramRuns(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        n = 3, maxDocFreq = 10, minRunGrams = 2)
    },
    "dedup_simhash" -> { (s, dir) =>
      Dedup.simhashed(tPar(s, dir, "documents"), col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("fp"))
    },
    // k-NN similarity graph (the SemDeDup / graph-clustering input): each
    // doc keeps its top-3 most-similar neighbors among the LSH candidates
    // by exact verified Jaccard — no similarity threshold, a RANK cap, so
    // sparse regions still get neighbors. Symmetrized before ranking
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
    // bucket whose membership exceeds the cap, for upstream handling — the
    // boilerplate clusters the pairing stage deliberately skipped
    "dedup_oversized_buckets" -> { (s, dir) =>
      Dedup.oversizedBuckets(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        n = 3, k = 8, bands = 4, maxBucket = 2
      )
    },
    // full two-stage near-dup flow: LSH candidate generation -> exact
    // n-gram-Jaccard verification, the production dedup shape (candidates
    // are cheap and approximate; only they pay the exact comparison)
    "dedup_near_verified" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val cands = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      cands
        .join(g.select(col("doc_id").as("id_lo"), col("grams").as("g_lo")), "id_lo")
        .join(g.select(col("doc_id").as("id_hi"), col("grams").as("g_hi")), "id_hi")
        // filter on the RAW similarity, round only for output — filtering
        // the rounded value would disagree with the oracle at the boundary
        .select(col("id_lo"), col("id_hi"), Dedup.jaccardSorted(col("g_lo"), col("g_hi")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("id_lo"), col("id_hi"), round(col("jac_raw"), 6).as("jac"))
    },
    // incremental ingestion dedup: every 5th doc arrives as the "new batch",
    // the rest are the existing corpus index; probe-join (never corpus×corpus)
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
    // production shape at 100 TB, where re-deriving the index per batch
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
    // cluster resolution: LSH candidates -> connected components -> one
    // canonical doc per near-dup cluster (the production dedup tail)
    "dedup_clusters" -> { (s, dir) =>
      val cands = Dedup.minhashLshPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      Dedup.connectedComponents(cands)
    },
    // end-to-end near-dedup: cluster labels joined back onto the corpus,
    // one survivor per cluster by quality (max n_chars, id tiebreak) —
    // the canonical-corpus selection a dedup pipeline actually ships.
    // Partitioned window (by cluster), never global
    "dedup_survivors" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val cands = Dedup.minhashLshPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val clusters = Dedup.connectedComponents(cands)
      val labeled = docs
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("canonical_id"), col("doc_id")))
      val w = Window.partitionBy(col("cluster_id")).orderBy(col("n_chars").desc, col("doc_id").asc)
      labeled
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"))
    },
    // corpus vocabulary: top-50 tokens by exact count (tie-broken by token
    // so the LIMIT boundary is deterministic in any engine)
    // gibberish/compression gate: Shannon bits-per-char from exact
    // (doc, char) counts — alphabet-bounded per-doc frames, the one ln
    // 9-dp-quantized into a decimal sum (PSI discipline)
    "text_entropy" -> { (s, dir) =>
      TextStats.charEntropy(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    // readability gate: Flesch-Kincaid grade from exact integer counts
    // (whitespace words, [.!?]+ sentence runs floored at 1, vowel-run
    // syllables floored at 1 per word) folded in one aggregate HOF —
    // map-only, one fixed-order IEEE tail
    "text_readability" -> { (s, dir) =>
      TextStats.readability(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    // tokenizer-coverage audit: per-doc OOV rate against the corpus' own
    // top-500 vocabulary — bounded TakeOrdered vocab broadcast as model
    // state, one membership join, exact integer ppm
    "text_oov_rate" -> { (s, dir) =>
      TextStats.oovRate(t(s, dir, "documents"), col("doc_id"), col("text"), topK = 500)
    },
    "text_vocab_topk" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    },
    // corpus rebalancing: deterministic hash-gated downsampling of the
    // dominant language stratum (reproducible across retries, unlike rand())
    "corpus_sample_stratified" -> { (s, dir) =>
      val docs = TextStats
        .langIdDF(t(s, dir, "documents"), col("doc_id"), col("text"))
        .withColumnRenamed("lang_pred", "lang")
      Curation.stratifiedSample(docs, col("doc_id"), col("lang"),
        rates = Map("en" -> 0.5), defaultRate = 1.0)
    },
    // composed training-data quality gate: language + quality score +
    // token-count bounds in one scan (no joins). The PlanOps.fence matters:
    // filtering on the derived score would otherwise inline the whole
    // profile expression tree into the pushed-down predicate, re-evaluating
    // it per reference (measured 8s -> 1.1s at 400k docs; see PlanOps)
    "corpus_filter" -> { (s, dir) =>
      graft.ops.PlanOps
        .fence(TextStats.profileNativeDF(t(s, dir, "documents"), col("doc_id"), col("text")))
        .filter(col("lang") === "en" && col("score") >= 0.5 &&
          col("n_tokens").between(5, 1000))
    },
    // CDC/MERGE apply: a deterministic changelog (updates for every 7th
    // order at seq 1, deletes for every 11th at seq 2) applied to the
    // orders snapshot — highest seq wins per key, deletes remove, one
    // shuffle total (see ChangeOps.applyChangelog)
    "scd_changelog_apply" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val upserts = base
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
        .withColumn("seq", lit(1L))
      val deletes = base
        .filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D"))
        .withColumn("seq", lit(2L))
      graft.ops.ChangeOps.applyChangelog(
        base, upserts.unionByName(deletes), Seq("o_orderkey"), "op", "seq")
    },
    // SCD Type-2 history from the same deterministic changelog: base rows
    // enter as seq-0 upserts; every 7th order re-priced at seq 1, every
    // 11th deleted at seq 2 — one validity interval per upsert, deletes
    // close their predecessor's interval
    // time travel: the table AS OF sequence time 2 — upserted keys show
    // their seq-1 version, keys deleted at seq 2 are absent (an interval
    // filter, not a join; the snapshot is a scan predicate)
    // snapshot DIFF — the inverse of the apply: derive I/U/D between two
    // full extracts when the source has no CDC feed; one full-outer join,
    // null-safe payload compare, change-proportional output
    // incremental VIEW maintenance: the per-(event_type, day) count+sum
    // view maintained from a signed delta batch (inserts +1, retractions
    // −1) — cost O(|delta|+touched groups), NO join, no base rescan; the
    // oracle proves the invariant by full recompute over the net row set
    "mv_delta_maintain" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir).select(
        col("event_type"),
        to_date(col("ts")).as("day"),
        col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      val inBase = col("event_id") % 3 =!= 0
      val baseView = ev
        .filter(inBase)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"), sum(coalesce(col("cents"), lit(0L))).as("sum_v"))
      val inserts = ev.filter(!inBase).withColumn("w", lit(1L))
      val retractions = ev.filter(inBase && col("event_id") % 11 === 0)
        .withColumn("w", lit(-1L))
      graft.ops.ChangeOps
        .maintainAggView(
          baseView, inserts.unionByName(retractions),
          Seq("event_type", "day"), col("w"), col("cents"))
        .select(
          col("event_type"), col("day"),
          col("cnt").cast("long").as("cnt"),
          col("sum_v").cast("long").as("sum_cents"))
    },
    "scd_snapshot_diff" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val prev = base.filter(col("o_orderkey") % 7 =!= 0)
      val next = base
        .filter(col("o_orderkey") % 5 =!= 0)
        .withColumn(
          "o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      graft.ops.ChangeOps.snapshotDiff(prev, next, "o_orderkey")
    },
    // clause-driven MERGE INTO (the lakehouse upsert API): matched+flag →
    // delete, matched → source payload wins, unmatched source → insert
    // (suppressed when delete-flagged), unmatched target passes through;
    // ONE null-safe full-outer join, change-proportional with a small src
    "scd_merge_into" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = base
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      val deletes = base.filter(col("o_orderkey") % 11 === 0)
      val inserts = base
        .filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 11000000L)
      graft.ops.ChangeOps.mergeInto(
        base, updates.unionByName(deletes).unionByName(inserts),
        "o_orderkey", col("o_orderkey") % 11 === 0)
    },
    // merge admission gate: duplicate-key source rows multiply matched
    // target rows through the merge's full-outer join, so the conflict
    // audit runs BEFORE a merge — one summary row (0/0 on this
    // contract-respecting source; nonzero = abort). Same source frame as
    // scd_merge_into, one partial-agg'd count.
    "merge_conflicts" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updates = base
        .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 11 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
      val deletes = base.filter(col("o_orderkey") % 11 === 0)
      val inserts = base
        .filter(col("o_orderkey") % 13 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 11000000L)
      graft.ops.ChangeOps
        .mergeConflicts(updates.unionByName(deletes).unionByName(inserts), "o_orderkey")
        .agg(
          count(lit(1)).as("n_conflict_keys"),
          coalesce(sum(col("n_rows")), lit(0L)).as("n_conflict_rows"))
    },
    "scd_snapshot_at" -> { (s, dir) =>
      val base = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val asInserts = base.withColumn("op", lit("U")).withColumn("seq", lit(0L))
      val upserts = base
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
        .withColumn("seq", lit(1L))
      val deletes = base
        .filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D"))
        .withColumn("seq", lit(2L))
      graft.ops.ChangeOps.snapshotAt(
        graft.ops.ChangeOps.changelogHistory(
          asInserts.unionByName(upserts).unionByName(deletes),
          Seq("o_orderkey"), "op", "seq"),
        t = 2L)
    },
    "scd_history" -> { (s, dir) =>
      val base = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val asInserts = base.withColumn("op", lit("U")).withColumn("seq", lit(0L))
      val upserts = base
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
        .withColumn("seq", lit(1L))
      val deletes = base
        .filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D"))
        .withColumn("seq", lit(2L))
      graft.ops.ChangeOps.changelogHistory(
        asInserts.unionByName(upserts).unionByName(deletes),
        Seq("o_orderkey"), "op", "seq")
    },
    // deterministic training-order shuffle: md5-derived (shard, pos)
    // coordinates — the reproducible global interleave a training run
    // reads shard by shard; per-shard windows, never a global sort
    "corpus_shuffle_shards" -> { (s, dir) =>
      Curation.shuffleShards(t(s, dir, "documents"), col("doc_id"), shards = 16)
    },
    // deterministic 80/10/10 train/val/test assignment — a pure map-side
    // hash gate (retry-stable, engine-reproducible; see Curation.hashSplit)
    "corpus_split_assign" -> { (s, dir) =>
      Curation.hashSplit(
        t(s, dir, "documents").select(col("doc_id")),
        col("doc_id"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
    },
    // leakage-safe split: the hash key is the near-dup CLUSTER id (LSH
    // candidates -> connected components), so every member of a near-dup
    // cluster lands in the same split — eval contamination by duplicates
    // straddling train/test is impossible by construction
    "corpus_split_leakage_safe" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val cands = Dedup.minhashLshPairs(
        tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val keyed = docs
        .join(Dedup.connectedComponents(cands), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("canonical_id"), col("doc_id")))
        .drop("canonical_id")
      Curation
        .hashSplit(keyed, col("cluster_id"), Seq("train" -> 800, "val" -> 100, "test" -> 100))
        .select(col("doc_id"), col("cluster_id"), col("split"))
    },
    // BPE tokenizer training on a deterministic corpus sample (every 10th
    // doc): 8 rounds of count-pairs → merge argmax → greedy rewrite, the
    // engine's second iterative driver-loop operator (after connected
    // components). The oracle unrolls the same 8 stages in SQL
    "text_bpe_merges" -> { (s, dir) =>
      TextStats.bpeMerges(
        t(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        col("doc_id"), col("text"), k = 8)
    },
    // the tokenizer's serving half: train the 8 merges on the sample (the
    // same driver loop text_bpe_merges runs), then APPLY them to the whole
    // corpus as 8 chained map-only rewrites — one stage, no shuffle. The
    // oracle replays training via the shared CTEs, then the same rewrites
    "text_bpe_encode" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val merges = TextStats
        .bpeMerges(docs.filter(col("doc_id") % 10 === 0), col("doc_id"), col("text"), k = 8)
        .orderBy(col("rank"))
        .collect()
        .map(r => (r.getString(1), r.getString(2)))
        .toSeq
      TextStats.bpeEncode(docs, col("doc_id"), col("text"), merges)
    },
    // corpus-familiarity quality signal: per-doc document-frequency stats
    // of its distinct 3-grams, hybrid hot-broadcast / cold-shuffle join
    // (the zipf-head answer that salting can't give — see TextStats)
    "text_familiarity" -> { (s, dir) =>
      TextStats.ngramFamiliarity(
        tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, hotK = 64)
    },
    // corpus-trained bigram LM scoring: per-doc mean log-prob + perplexity
    // under the add-one-smoothed transition model of the corpus itself —
    // the CCNet-style perplexity quality gate; hot transitions broadcast,
    // the model marginalizes from the count table, never the corpus
    "text_lm_score" -> { (s, dir) =>
      TextStats.lmScoreDF(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        corpusKey = s"documents|$dir", hotK = 64)
    },
    // in-engine trainable classifier: multinomial NB fit by pure counting
    // on the md5-gated train 80%, served broadcast on the held-out 20% —
    // the label-assignment audit (confusion matrix) as a query, with both
    // fit and serve deterministic (millinat log-probs, class-asc argmax)
    "text_nb_confusion" -> { (s, dir) =>
      Classify.nbConfusion(
        tPar(s, dir, "documents"), col("doc_id"), col("text"), col("lang"),
        trainPermille = 800, vocabK = 64, corpusKey = s"documents|$dir")
    },
    // corpus cartography: per-source distinctive terms by class-based
    // TF-IDF over a capped global vocabulary — every post-count frame is
    // model-state-sized, so the serving joins broadcast by doctrine
    "text_ctfidf_terms" -> { (s, dir) =>
      Classify.ctfidfTerms(
        tPar(s, dir, "documents"), col("source"), col("text"), vocabK = 256, topK = 5)
    },
    // ingest-boundary quarantine: parse a JSON-lines payload against a
    // declared schema and ROUTE malformed rows instead of failing the scan
    // — the ValidateOps.partition discipline applied where scraped corpora
    // break first. Payload synthesized deterministically (same concat both
    // engines); two corruption modes (head-chop, garbage swap) are both
    // fully unparseable, so `all required fields non-null` == json-valid
    "ingest_json_quarantine" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val p0 = concat(
        lit("{\"id\":"), col("doc_id").cast("string"),
        lit(",\"lang\":\""), coalesce(col("lang"), lit("xx")),
        lit("\",\"n\":"), col("n_chars").cast("string"), lit("}"))
      val base = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 7 === 3, substring(p0, 2, 1000000))
          .when(col("doc_id") % 11 === 5, concat(lit("garbage-"), col("doc_id").cast("string")))
          .otherwise(p0)
          .as("payload"))
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("lang", StringType), StructField("n", LongType)))
      graft.ops.IngestOps
        .parseWithQuarantine(base, col("payload"), schema, required = Seq("id", "lang", "n"))
        .select(
          col("doc_id"),
          col("ingest_ok"),
          when(col("ingest_ok"), col("parsed.lang")).as("lang_parsed"),
          when(col("ingest_ok"), col("parsed.n")).as("n_parsed"))
    },
    // dataset report ("data card"): doc counts, token sums and mean quality
    // per (split, lang) — the summary a training run publishes. The mean
    // rides an exact integer sum of the 4-decimal scores (one double
    // division at the end), so cross-partition order cannot perturb it
    "corpus_data_card" -> { (s, dir) =>
      val prof = graft.ops.PlanOps
        .fence(TextStats.profileNativeDF(t(s, dir, "documents"), col("doc_id"), col("text")))
      Curation
        .hashSplit(prof, col("doc_id"), Seq("train" -> 800, "val" -> 100, "test" -> 100))
        .groupBy(col("split"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(
            sum(round(col("score") * 10000).cast("long")) / (count(lit(1)) * lit(10000.0)),
            6
          ).as("mean_score"))
    },
    // data card v2 — the columns a real training-data report needs on top
    // of counts/tokens/quality: per-(split, lang) NEAR-DUP RATE (docs in a
    // verified LSH pair) and CONTAMINATION FRACTION (docs over the eval-
    // overlap threshold), composed from the same dedup and decontaminate
    // operators the standalone queries run — one definition, shared oracle
    // CTEs, so the report cannot drift from the gates it summarizes
    "corpus_data_card_v2" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val docsPar = tPar(s, dir, "documents")
      val prof = graft.ops.PlanOps
        .fence(TextStats.profileNativeDF(docs, col("doc_id"), col("text")))
      val split = Curation.hashSplit(
        prof, col("doc_id"), Seq("train" -> 800, "val" -> 100, "test" -> 100))
      val cands = Dedup.minhashLshPairs(
        docsPar, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
      val g = Dedup.shingled(docs, col("doc_id"), col("text"), 3)
      val ver = cands
        .join(g.select(col("doc_id").as("id_lo"), col("grams").as("g_lo")), "id_lo")
        .join(g.select(col("doc_id").as("id_hi"), col("grams").as("g_hi")), "id_hi")
        .filter(Dedup.jaccardSorted(col("g_lo"), col("g_hi")) >= 0.7)
      val dupIds = ver.select(col("id_lo").as("doc_id"))
        .unionByName(ver.select(col("id_hi").as("doc_id")))
        .distinct()
        .withColumn("is_dup", lit(true))
      val deco = Curation.decontaminate(
          docsPar.filter(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
          docsPar.filter(col("doc_id") % 50 === 0), col("text"),
          n = 5, threshPct = 10)
        .select(col("doc_id"), col("contaminated"))
      split
        .join(dupIds, Seq("doc_id"), "left")
        .join(deco, Seq("doc_id"), "left")
        .groupBy(col("split"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          round(
            sum(round(col("score") * 10000).cast("long")) / (count(lit(1)) * lit(10000.0)),
            6
          ).as("mean_score"),
          sum(coalesce(col("is_dup"), lit(false)).cast("long")).as("n_near_dup"),
          round(
            sum(coalesce(col("is_dup"), lit(false)).cast("long")) / count(lit(1)).cast("double"),
            6
          ).as("near_dup_rate"),
          sum(coalesce(col("contaminated"), lit(false)).cast("long")).as("n_contaminated"),
          round(
            sum(coalesce(col("contaminated"), lit(false)).cast("long")) / count(lit(1)).cast("double"),
            6
          ).as("contaminated_frac"))
    },
    // per-group top-k via the bounded-heap aggregator (≤ k state per
    // group, no per-group sort); oracle is the window-rank truth
    "w4_topk_per_group" -> { (s, dir) =>
      graft.ops.ReshapeOps.topKPerGroup(
        t(s, dir, "documents"), col("source"), col("n_chars"), col("doc_id"), k = 3)
    },
    // EXACT set-similarity join (Jaccard ≥ 19/20) by prefix filtering —
    // recall by theorem, precision by verify: the output IS the truth,
    // so the oracle computes it directly with no pruning replay
    "dedup_setsim_exact" -> { (s, dir) =>
      Dedup.prefixFilterPairs(
        tPar(s, dir, "documents"), col("doc_id"), col("text"), tauNum = 19, tauDen = 20)
    },
    // triangle census of the exact near-dup graph (setsim τ=19/20 edges
    // — the SAME spilled token table serves both queries): vertices,
    // edges, wedges, triangles, global clustering coefficient. Near-dup
    // clusters are near-cliques, so the triangle count is the
    // cluster-density audit a dedup report actually wants
    "graph_triangles" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.triangleStats(edges, "id_lo", "id_hi")
    },
    // community ids over the same near-dup pair graph (third consumer of
    // the shared setsim spill): 3 rounds of derandomized synchronous
    // label propagation — mode-of-neighbor-labels, ties to the smallest —
    // electing each near-clique's minimum doc id as its community id.
    // The oracle unrolls the identical three rounds in SQL
    "graph_label_prop" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.labelPropagation(
        edges, "id_lo", "id_hi", iters = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
    // multi-source BFS over the same near-dup pair graph: minimal hop
    // distances from the benchmark-doc seed set (doc_id % 100 == 0) out
    // to 3 hops — the contamination blast-radius trace; every round joins
    // only the fresh frontier (work frontier-proportional, never |V|)
    "graph_bfs" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      val sources = t(s, dir, "documents").filter(col("doc_id") % 100 === 0)
      graft.ops.GraphOps.bfsDistances(
        edges, "id_lo", "id_hi", sources, "doc_id", rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20|seed=mod100"))
    },
    // reachability-closure certificate for the bounded BFS: one probe
    // round past R — at_fixpoint=true proves nothing lies beyond 3 hops,
    // so the distance table IS the full closure, checked not assumed
    "graph_bfs_fixpoint" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      val sources = t(s, dir, "documents").filter(col("doc_id") % 100 === 0)
      graft.ops.GraphOps.bfsFixpoint(
        edges, "id_lo", "id_hi", sources, "doc_id", rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20|seed=mod100"))
    },
    // dense-subgraph certificate over the same near-dup pair graph (fourth
    // consumer of the shared setsim spill): 3 fixed rounds of bulk-
    // synchronous 2-core peeling — spam/template mills survive as
    // high-core near-cliques, organic pairwise near-dups peel away. The
    // oracle unrolls the identical rounds
    "graph_kcore" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.kcorePeel(
        edges, "id_lo", "id_hi", k = 2, rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
    // fixpoint certificate for the fixed-round peel above: peel the same
    // 3 rounds plus ONE probe round and report whether the survivor set
    // moved — at_fixpoint=true proves graph_kcore's answer IS the exact
    // 2-core (a fixpoint round removes nothing), turning the documented
    // "superset on long chains" caveat into a checked signal. The oracle
    // unrolls the identical 4 rounds and diffs the two survivor sets
    "graph_kcore_fixpoint" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.kcoreFixpoint(
        edges, "id_lo", "id_hi", k = 2, rounds = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
    // convergence certificate for the synchronous label propagation: run
    // the same 3 rounds plus one probe round and count nodes whose label
    // still moves — converged=true distinguishes a stable community
    // assignment from a truncated (or oscillating) one
    "graph_label_prop_fixpoint" -> { (s, dir) =>
      val edges = Dedup
        .prefixFilterPairs(tPar(s, dir, "documents"), col("doc_id"), col("text"), 19, 20)
        .select(col("id_lo"), col("id_hi"))
      graft.ops.GraphOps.labelPropFixpoint(
        edges, "id_lo", "id_hi", iters = 3,
        contentKey = Some(s"documents|$dir|pf19-20"))
    },
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
    // ---- similarity search ----------------------------------------------
    "ann_cosine_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      // self-dots staged per SIDE (computing them in the sim expression
      // would redo the query one N times and each candidate one Q times);
      // sim keeps the sqrt(naa*ncc) structure the oracle uses — it is NOT
      // bit-identical to sqrt(naa)*sqrt(ncc)
      val q = broadcast(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), qz(col("embedding")).as("qv"))
          .withColumn("naa", ldot(col("qv"), col("qv")))
      )
      val c = e
        .select(col("vec_id").as("cand_id"), qz(col("embedding")).as("cv"))
        .withColumn("ncc", ldot(col("cv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id"))
      c.join(q, col("query_id") =!= col("cand_id"))
        .withColumn(
          "sim",
          ldot(col("qv"), col("cv")).cast("double") /
            sqrt(col("naa").cast("double") * col("ncc").cast("double"))
        )
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("cand_id"), col("rank"), col("sim"))
    },
    // k-center greedy coreset (Gonzalez farthest-point): the 8 most
    // mutually-distant vectors — diversity-maximizing data selection;
    // k bounded driver rounds, incremental min maintenance, exact
    // integer L2² via the graft_l2sq kernel, ties to the smallest id
    "curation_coreset" -> { (s, dir) =>
      Similarity.kcenterCoreset(
        t(s, dir, "embeddings"), col("vec_id"), col("embedding"), k = 8)
    },
    // FILTERED vector search — the serving shape every vector store added
    // in 2024: top-k under a metadata predicate (label = 3). PRE-filter
    // semantics: the candidate scan applies the predicate BEFORE ranking
    // (post-filtering an unfiltered top-k silently under-returns when the
    // filter is selective); the predicate reaches the parquet scan as a
    // pushed filter, so the filtered corpus is all that's ever scored
    "ann_filtered_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = broadcast(
        e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), qz(col("embedding")).as("qv"))
          .withColumn("naa", ldot(col("qv"), col("qv")))
      )
      val c = e
        .filter(col("label") === 3)
        .select(col("vec_id").as("cand_id"), qz(col("embedding")).as("cv"))
        .withColumn("ncc", ldot(col("cv"), col("cv")))
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id"))
      c.join(q, col("query_id") =!= col("cand_id"))
        .withColumn(
          "sim",
          ldot(col("qv"), col("cv")).cast("double") /
            sqrt(col("naa").cast("double") * col("ncc").cast("double"))
        )
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("cand_id"), col("rank"), col("sim"))
    },
    // Approximate path (SRP-bucketed). md5-derived planes + integer-exact
    // quantized math => full DuckDB twin; recall also gated in SimilaritySpec.
    "ann_lsh_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.lshBucketTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, planes = 6, k = 5, multiProbe = true, tables = 4
      )
    },
    // radius search over the same SRP tables: every candidate with cosine
    // >= 0.3 of each probe (the fixture's pairwise cosines top out ~0.5,
    // so 0.3 is the regime with real matches) — data-dependent answer
    // size, exact integer threshold (d²·100 >= qq·cc·9, decimal cross-
    // products, no float boundary), LSH recall measured in SimilaritySpec
    "ann_range_search" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.lshRangeSearch(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        dim = 64, planes = 6, tauNum = 3, tauDen = 10, multiProbe = true, tables = 4)
    },
    // reciprocal-rank fusion of the two approximate rankers with
    // uncorrelated failure modes (IVF cell pruning vs SRP hyperplane
    // buckets): rank-only ensembling, no score calibration. Fusion depth
    // matches the serving k ON PURPOSE — deeper input lists dilute the
    // stronger ranker with the weaker tail (SimilaritySpec measures
    // 0.92 → 0.66 recall from depth 5 → 20)
    // scan-cheap → rerank-exact: int8 code-dot keeps 100 candidates per
    // query, exact quantized cosine re-ranks to 5 — the two-stage serving
    // shape that lifts int8's 0.68 recall@5 to ~1.0 (floor in
    // SimilaritySpec) while the exact scorer touches q·depth rows, not q·N
    "ann_int8_rerank" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.int8RerankTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", depth = 100, k = 5)
    },
    "ann_rrf_hybrid" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", nlist = 16, nprobe = 4, k = 5)
      val lsh = Similarity.lshBucketTopK(
        e, q, "vec_id", "embedding", dim = 64, planes = 6, k = 5, multiProbe = true, tables = 4)
      Similarity.rrfFuse(ivf, lsh, k = 5)
    },
    // cluster-balanced curation: k lowest-hash vectors per TRAINED k-means
    // cell (the ann_ivf_kmeans quantizer) — embedding-space-stratified
    // downsampling that covers every region instead of oversampling the
    // head; the oracle replays training + assignment + the per-cell gate
    "curation_cluster_balance" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      Curation.clusterBalancedSample(e, col("vec_id"), col("embedding"), cents, k = 20)
    },
    // embedding-space outlier audit under the SAME trained quantizer:
    // vectors beyond their cell's 9/10-quantile centroid distance are the
    // off-manifold fringe (mislabeled scrapes, OCR garbage) — integer
    // order-statistic threshold, strict-> flags, full DuckDB replay
    "curation_emb_outliers" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      Curation.centroidOutliers(e, col("vec_id"), col("embedding"), cents, pNum = 9, pDen = 10)
    },
    // IVF variant (coarse quantizer cells, nprobe probing). The centroid
    // sample is deterministic (nlist lowest ids) and the math integer-exact,
    // so the whole assignment+probe+rank pipeline has a DuckDB twin.
    "ann_ivf_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        nlist = 16, nprobe = 4, k = 5)
    },
    // TRAINED IVF: two fixed Lloyd's iterations refine the sampled coarse
    // quantizer before serving — the oracle replays the training verbatim
    // (each iteration unrolled as assign→mean CTEs, the text_bpe_merges
    // pattern), so centroid drift between engines would hash-mismatch.
    "ann_ivf_kmeans" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        nlist = 8, nprobe = 2, k = 5, trainIters = 2)
    },
    // product quantization: train 4 sub-codebooks (one Lloyd's iteration,
    // seeded from the 4 lowest-id vectors' slices), PQ-encode the corpus,
    // and serve top-k by asymmetric distance — nsub table lookups per
    // candidate instead of dim multiplies. The oracle replays training,
    // coding, and the ADC sum per subspace in exact integer math.
    "ann_pq_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
      Similarity.pqAdcTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", books, k = 5)
    },
    // PQ as candidate generator, exact cosine as ranker — the honest
    // serving posture for flat PQ on cluster-free data (isotropic vectors
    // are PQ's pathological case as a RANKER, but landing the true top-5
    // anywhere in the ADC top-100 is a far weaker ask; the rerank recovers
    // the order — recall floor 0.80, measured 0.92, in SimilaritySpec).
    // 8x8 codes on purpose: candidate recall is what bounds final recall,
    // and the 8-bit 4x4 code only lands ~54% of the true top-5 in its
    // top-100 on isotropic data
    "ann_pq_rerank" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 8, nlistSub = 8, iters = 1)
      Similarity.pqRerankTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", books, depth = 100, k = 5)
    },
    // IVFPQ — FAISS's serving composition: the TRAINED coarse quantizer
    // (same 8-cell/2-iteration model as ann_ivf_kmeans) prunes candidates
    // to 2 probed cells, and ranking is PQ asymmetric distance (same 4x4
    // codebooks as ann_pq_topk). The oracle composes both oracles' CTEs.
    "ann_ivfpq_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
      Similarity.ivfPqTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding", coarse, nprobe = 2, books, k = 5)
    },
    // BATCH scoring against the PERSISTED serving index: the (cell, codes,
    // id) frame is written bucketBy(cell) once, and a 50-query batch (the
    // too-big-to-broadcast case) shuffle-joins it with no exchange on the
    // index side. Same ranking semantics as the inline composition —
    // layout is execution, not meaning — so the oracle differs only in
    // probe predicate and k.
    "ann_index_scored" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val coarse = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val books = Similarity.pqTrain(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
      val tbl = Scratch.table("ann_idx")
      Scratch.tableOnce(tbl, dir)(
        Similarity.persistAnnIndex(e, "vec_id", "embedding", coarse, books, tbl, buckets = 8))
      Similarity.scoreAgainstAnnIndex(
        s, tbl, e.filter(col("vec_id") < 50), "vec_id", "embedding",
        coarse, books, nprobe = 2, k = 3)
    },
    // recall@k as a DRIVER-CHECKED number, not just a spec-side assertion:
    // the three approximate serving paths (4-table multiprobe SRP-LSH,
    // sample-centroid IVF 16/4, 4x4 PQ/ADC) audited against brute-force
    // truth on a deterministic md5-gated query stratum (67 of 500 vectors;
    // at 1000x the corpus you raise the mod 1000x — truth cost unchanged,
    // the blockingQuality fixed-eval-set discipline). Output is one row per
    // ranker with recall as exact integer ppm; the oracle replays truth AND
    // all three ranker chains, so a recall regression hash-mismatches.
    "ann_recall_audit" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val stratum = e.filter(
        graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 8L) === 0)
      Similarity.recallAudit(
        e, stratum, "vec_id", "embedding", k = 5,
        rankers = Seq(
          "ivf_16_4" -> ((c, q) =>
            Similarity.ivfTopK(c, q, "vec_id", "embedding", nlist = 16, nprobe = 4, k = 5)),
          "lsh_srp_4t" -> ((c, q) =>
            Similarity.lshBucketTopK(
              c, q, "vec_id", "embedding",
              dim = 64, planes = 6, k = 5, multiProbe = true, tables = 4)),
          "pq_adc_4x4" -> ((c, q) => {
            val books = Similarity.pqTrain(c, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
            Similarity.pqAdcTopK(c, q, "vec_id", "embedding", books, k = 5)
          })))
    },
    // ---- text analysis ---------------------------------------------------
    "text_lang_id" -> { (s, dir) =>
      TextStats.langIdDF(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    // the native-expression fast path under the lexicon scoring: one
    // allocation-free graft_occ_counts pass (GraftExtensions) instead of 16
    // replace-and-measure copies — same counts, same oracle vocabulary
    "text_lang_stats_native" -> { (s, dir) =>
      TextStats.langScoresNativeDF(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    "text_lang_ngram" -> { (s, dir) =>
      TextStats.langIdNgramDF(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    "text_quality" -> { (s, dir) =>
      TextStats.qualityDF(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    "text_token_stats" -> { (s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        TextStats.subwordCount(col("text")).as("n_subwords")
      )
    },
    "text_fingerprint" -> { (s, dir) =>
      tPar(s, dir, "documents").select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
    },
    // corpus length distribution: exact per-bucket doc counts + bounds (the
    // standard curation diagnostic before choosing token-length cutoffs)
    "text_length_histogram" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(TextStats.tokenCount(col("text")).as("n_tokens"))
        .withColumn("bucket", least(floor(col("n_tokens") / 10), lit(20)).cast("long"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n_docs"),
          min("n_tokens").as("min_tokens"),
          max("n_tokens").as("max_tokens")
        )
    },
    // ---- multimodal plumbing ---------------------------------------------
    "mm_payload_meta" -> { (s, dir) =>
      Multimodal
        .fromText(t(s, dir, "documents"), "doc_id", "text")
        .select(
          col("asset_id"),
          col("media_type"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.digest").as("digest"),
          col("decoded.width").as("width"),
          col("decoded.height").as("height")
        )
    },
    // frame-sampling plumbing: one row per sampled frame with its byte range
    "mm_frame_sample" -> { (s, dir) =>
      Multimodal
        .sampleFrames(
          Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text"),
          frameBytes = 64, everyNth = 2
        )
        .select(col("asset_id"), col("sample_idx"), col("frame_idx"),
          col("byte_start"), col("byte_len"))
    },
    // mapPartitions decode path (per-partition codec context; the stub
    // codec's dims formula is deterministic byte arithmetic, reproduced in
    // the DuckDB twin via per-char code points — fixture text is ASCII)
    "mm_decode_partitioned" -> { (s, dir) =>
      Multimodal
        .decodePartitioned(Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
    },
    // REAL image decode end-to-end: genuine PNG/BMP bytes are encoded
    // executor-side (javax.imageio) from id-derived pixels, then decoded
    // back by the real codec; the oracle recomputes dims + raw pixel sum
    // arithmetically from the same id formula — a lossy or fake decode
    // path cannot hash-match it
    "mm_decode_real" -> { (s, dir) =>
      Multimodal
        .decodeImages(Multimodal.synthImages(tPar(s, dir, "documents"), "doc_id"))
        .toDF()
    },
    // blur detection: variance-of-Laplacian sharpness over the REAL
    // decode path — exact Long 4-neighbour Laplacian squares, one rounded
    // mean; sub-3x3 images report 0/NULL instead of a fake score
    "mm_image_sharpness" -> { (s, dir) =>
      Multimodal
        .imageSharpness(Multimodal.synthImages(tPar(s, dir, "documents"), "doc_id"))
        .toDF()
    },
    // vision data-card: per-image 8-bin luma histogram over the REAL
    // decode — the full brightness distribution next to the exposure
    // scalars; map-only flatMap, empty bins absent
    "mm_image_histogram" -> { (s, dir) =>
      Multimodal
        .imageHistogram(Multimodal.synthImages(tPar(s, dir, "documents"), "doc_id"), bins = 8)
        .toDF()
    },
    // exposure audit: exact-integer mean luma, population RMS contrast
    // (fixed-order IEEE √ tail), and histogram-rail clip counts over the
    // REAL decode path — the under/over-exposure + flat-frame gate
    "mm_image_exposure" -> { (s, dir) =>
      Multimodal
        .imageExposure(Multimodal.synthImages(tPar(s, dir, "documents"), "doc_id"))
        .toDF()
    },
    // REAL JPEG decode end-to-end: genuine baseline-JFIF bytes encoded
    // executor-side at quality 1.0 from CONSTANT-gray id-derived images —
    // the one shape lossy JPEG round-trips exactly (DC-only blocks) — then
    // decoded back by the real codec; oracle: pix_sum = w·h·v arithmetic
    "mm_decode_jpeg" -> { (s, dir) =>
      Multimodal
        .decodeImages(Multimodal.synthJpegImages(tPar(s, dir, "documents"), "doc_id"))
        .toDF()
    },
    // REAL perceptual hash: genuine PNG/BMP bytes decoded, NN-sampled to a
    // 9x7 grid (resizeImages' integer-div convention), 56-bit dHash; the
    // oracle replays the grid sampling + gradient bits arithmetically from
    // the id-derived pixel formula — a wrong decode or sampling cannot match
    "mm_image_dhash" -> { (s, dir) =>
      Multimodal
        .dHashImages(Multimodal.synthImages(tPar(s, dir, "documents"), "doc_id"))
        .toDF()
    },
    // image near-dup pairs over the dHash fingerprints: 4x14-bit banded-LSH
    // candidates + exact bit_count(xor) Hamming verify — the text-LSH shape
    // in Hamming space; oracle shares the dhash CTE and replays the bands
    "mm_image_neardup" -> { (s, dir) =>
      Multimodal
        .dhashNearDupPairs(
          Multimodal
            .dHashImages(Multimodal.synthImages(tPar(s, dir, "documents"), "doc_id"))
            .toDF(),
          maxHamming = 8)
    },
    // REAL multi-frame decode end-to-end: genuine animated GIF89a bytes
    // (explicit gray palette → lossless index coding) encoded executor-side,
    // then getNumImages/read(i) samples every 2nd frame; the oracle
    // recomputes frame count, dims, and per-frame pixel sums arithmetically
    "mm_frames_real" -> { (s, dir) =>
      Multimodal
        .decodeFrames(
          Multimodal.synthGifAnimations(tPar(s, dir, "documents"), "doc_id"),
          everyNth = 2)
        .toDF()
    },
    // REAL video demux end-to-end: genuine RIFF/AVI (MJPEG) containers
    // assembled executor-side with constant-gray q=1.0 JPEG frames (the
    // exact-round-trip shape); the demuxer walks the chunk tree, checks the
    // avih frame count, decodes every 2nd frame; oracle: pix_sum = w·h·v_f
    "mm_video_frames" -> { (s, dir) =>
      Multimodal
        .demuxVideoFrames(
          Multimodal.synthMjpegVideos(tPar(s, dir, "documents"), "doc_id"),
          everyNth = 2)
        .toDF()
    },
    // shot-boundary detection over the REAL demux+decode path: per-pixel
    // mean luma delta between consecutive frames, cut at >100 (the synth
    // frame values step by 17 mod 256, so only the mod-wrap transitions
    // fire — data-dependent across assets, arithmetic the oracle replays)
    "mm_video_scene_cuts" -> { (s, dir) =>
      Multimodal.sceneCuts(
        Multimodal.synthMjpegVideos(tPar(s, dir, "documents"), "doc_id"),
        thresholdPerPixel = 100)
    },
    // REAL audio decode end-to-end: genuine RIFF/WAVE PCM-16 bytes encoded
    // executor-side (javax.sound.sampled) from id-derived samples, decoded
    // back by the real codec; PCM is lossless so the oracle recomputes
    // rate/count/amplitude-sum arithmetically
    "mm_decode_audio" -> { (s, dir) =>
      Multimodal
        .decodeAudio(Multimodal.synthWavAudio(tPar(s, dir, "documents"), "doc_id"))
        .toDF()
    },
    // REAL audio fingerprint: decode the WAV payload, 57 integer-div
    // envelope frames, exact Σs² energies, 56 gradient bits; the oracle
    // replays the frame boundaries and energies from the id-derived PCM
    "mm_audio_fingerprint" -> { (s, dir) =>
      Multimodal
        .audioFingerprints(Multimodal.synthWavAudio(tPar(s, dir, "documents"), "doc_id"))
        .toDF()
    },
    // audio near-dup pairs over the energy-envelope fingerprints — the
    // same banded Hamming LSH as the image dHash family
    "mm_audio_neardup" -> { (s, dir) =>
      Multimodal.hammingNearDupPairs(
        Multimodal
          .audioFingerprints(Multimodal.synthWavAudio(tPar(s, dir, "documents"), "doc_id"))
          .toDF()
          .withColumnRenamed("fingerprint", "fp"),
        "fp",
        maxHamming = 8)
    },
    // silence / dropout / clipping audit over the REAL WAV decode: exact
    // counts under |s|<100 and at |s|>=1000, integer ppm share, and the
    // longest consecutive silent run (row-local scan; the oracle needs a
    // gaps-and-islands window to replay it)
    "mm_audio_silence" -> { (s, dir) =>
      Multimodal
        .audioSilence(
          Multimodal.synthWavAudio(tPar(s, dir, "documents"), "doc_id"),
          silenceThreshold = 100, clipThreshold = 1000)
        .toDF()
    },
    // REAL audio analysis end-to-end: decode the WAV payload, then frame
    // the 16-bit sample stream (50 samples/frame) into short-time energy +
    // zero-crossing counts — all integer math, so the oracle recomputes
    // every frame descriptor arithmetically from the synth formula
    "mm_audio_features" -> { (s, dir) =>
      Multimodal
        .audioFrameFeatures(
          Multimodal.synthWavAudio(tPar(s, dir, "documents"), "doc_id"),
          frameLen = 50)
        .toDF()
    },
    // REAL resize end-to-end: synth → decode → integer-exact NN resample →
    // re-encode → decode again; the oracle recomputes the resampled pixel
    // sum arithmetically (all integer division, no float scale), so a
    // lossy re-encode or wrong sample mapping cannot hash-match
    "mm_resize_real" -> { (s, dir) =>
      Multimodal
        .decodeImages(
          Multimodal.resizeImages(
            Multimodal.synthImages(tPar(s, dir, "documents"), "doc_id"), maxSide = 8))
        .toDF()
    },
    // corpus-level line dedup (boilerplate removal, CCNet/RefinedWeb
    // shape): frame every doc with synthetic nav/footer lines (the fixture
    // has no newlines), then strip lines occurring in > maxDocs distinct
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
    // ---- events / sessionization ------------------------------------------
    "ev_sessionize" -> { (s, dir) =>
      val sessions = Sessionize.sessionizeBatch(Fixtures.events(s, dir), "user_id", "ts", "event_id", 30)
      Sessionize.sessionStats(sessions, "user_id", "ts", "value")
    },
    "ev_tumbling" -> { (s, dir) =>
      Sessionize
        .tumblingCounts(Fixtures.events(s, dir), "ts", "event_type")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"),
          col("n"),
          col("total_value")
        )
    },
    "ev_sliding" -> { (s, dir) =>
      Sessionize
        .slidingCounts(Fixtures.events(s, dir), "ts", "event_type", 60, 30)
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"),
          col("n")
        )
    },
    // Embedding-cosine near-dup (SRP buckets). md5-derived planes +
    // quantized math => full DuckDB twin; recall tested in DedupSpec.
    "dedup_embedding" -> { (s, dir) =>
      Dedup.embeddingNearDupPairs(
        tPar(s, dir, "embeddings"), col("vec_id"), col("embedding"),
        dim = 64, planes = 4, threshold = 0.2
      )
    },
    // embedding-space incremental dedup: every 5th vector arrives as the
    // new batch and probes the corpus's SRP-bucket index — the semantic
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
    // within-cell pruning verbatim. tau is data-relative: the synthetic
    // embeddings top out near cos 0.51, so 0.42 prunes the densest tail.
    "dedup_semantic_pairs" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      Dedup.semanticPairs(e, col("vec_id"), col("embedding"), cents, tau = 0.42)
    },
    // the kept set under the greedy lowest-id rule: drop any vector with a
    // lower-id within-cell neighbor at cos >= tau
    "dedup_semantic_survivors" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      Dedup.semanticSurvivors(e, col("vec_id"), col("embedding"), cents, tau = 0.42)
        .select(col("vec_id"))
    },
    // the PERSISTED-index form: the corpus's (cell, id, vec, nrm) frame is
    // written bucketBy(cell) once (layout time) and every 5th vector
    // arrives as the incoming batch probing it exchange-free on the
    // corpus side — the semantic twin of dedup_incremental_bucketed.
    // The quantizer is trained on the FULL corpus (train once, serve
    // batches), so the oracle shares the ann_ivf_kmeans training CTEs.
    "dedup_semantic_incremental" -> { (s, dir) =>
      val e = tPar(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val corpus = e.filter(col("vec_id") % 5 =!= 0)
      val incoming = e.filter(col("vec_id") % 5 === 0)
      val tbl = Scratch.table("sem_idx")
      Scratch.tableOnce(tbl, dir)(
        Dedup.persistSemanticIndex(corpus, col("vec_id"), col("embedding"), cents, tbl, buckets = 8))
      Dedup.probeSemanticIndex(s, tbl, incoming, col("vec_id"), col("embedding"), cents, tau = 0.42)
    },
    // ---- curation: packing / scrubbing / repetition / sketches / rank ----
    // sequence packing: token-budget packs per salt group (distributed —
    // the window sorts 8 independent salt partitions, never one global task)
    "curate_pack_sequences" -> { (s, dir) =>
      Curation
        .packSequences(
          t(s, dir, "documents"),
          col("doc_id"),
          TextStats.tokenCount(col("text")),
          budget = 512,
          salts = 8
        )
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"), col("pack_id"), col("pack_pos"))
    },
    // DSIR-style importance scores: hashed-token bucket weights estimated
    // from the en-language target vs the whole raw corpus (integer-ratio
    // surrogate for the paper's log-ratio — see Curation.dsirBucketWeights),
    // then each doc scored as the exact long sum of its tokens' weights
    "curation_dsir_scores" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val w = Curation.dsirBucketWeights(docs, docs.filter(col("lang") === "en"), col("text"))
      Curation
        .dsirScores(docs, col("doc_id"), col("text"), w)
        .select(col("id").as("doc_id"), col("score"))
    },
    // the selection tail: top-100 docs by importance (score desc, id
    // tiebreak) — a TakeOrdered, never a global window
    "curation_dsir_select" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val w = Curation.dsirBucketWeights(docs, docs.filter(col("lang") === "en"), col("text"))
      Curation
        .dsirScores(docs, col("doc_id"), col("text"), w)
        .select(col("id").as("doc_id"), col("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(100)
    },
    // token-budget selection ("take the best 50k tokens"): quality scores
    // quantized to a 10⁴ grid, per-score token histogram folded into
    // ALL/NONE/PARTIAL verdicts (bounded model state), only the one
    // straddling score class pays a running-sum window. The oracle replays
    // the equivalent single greedy running sum in (score desc, id) order
    "curation_token_budget" -> { (s, dir) =>
      val q = TextStats.qualityDF(t(s, dir, "documents"), col("doc_id"), col("text"))
      Curation.tokenBudgetSelect(
        q, col("doc_id"), round(col("score") * 10000, 0).cast("long"), col("n_tokens"),
        budget = 50000L)
    },
    // PII scrub with audit counts; the fixture corpus has no PII, so a
    // deterministic slice gets synthetic emails/phones appended first
    "text_pii_scrub" -> { (s, dir) =>
      val aug = t(s, dir, "documents").select(
        col("doc_id"),
        when(
          col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"))
        ).when(
          col("doc_id") % 13 === 0,
          concat(col("text"), lit(" call 312-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        ).otherwise(col("text")).as("text")
      )
      TextStats.scrubbedDF(aug, col("doc_id"), col("text"))
    },
    "text_repetition" -> { (s, dir) =>
      TextStats.repetitionDF(tPar(s, dir, "documents"), col("doc_id"), col("text"))
    },
    // KMV distinct-token sketch (k=16 so the estimation path is live at the
    // fixture vocab size) with the exact count riding along as the audit
    "sketch_distinct_kmv" -> { (s, dir) =>
      val tokens = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      Sketches.kmvDistinct(tokens, col("token"), k = 16)
    },
    "text_bm25_topk" -> { (s, dir) =>
      Ranking.bm25TopK(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        terms = Seq("spark", "query", "window")
      )
    },
    // KMV set algebra: part keys shipped before vs since 1998 — union,
    // intersection and Jaccard estimates composed from two k-min sketches
    // (k=64: the estimation path is live; overlap fraction drives the rest)
    "sketch_kmv_setops" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      Sketches.kmvSetOps(
        li.filter(col("l_shipdate") < lit("1998-01-01")),
        col("l_partkey").cast("string"),
        li.filter(col("l_shipdate") >= lit("1998-01-01")),
        col("l_partkey").cast("string"),
        k = 64
      )
    },
    // compaction / bin-packing maintenance (the post-CDC layout pass):
    // a deliberately fragmented partitioned layout (12-way repartition
    // before partitionBy → ~12 small files per partition) is rewritten
    // into target-size files — same partitions, same rows, fewer files.
    // The returned frame is the compacted table's CONTENT, so the oracle
    // (the original table) proves the rewrite is a row-level bijection;
    // the file-count drop itself is asserted in LayoutOpsSpec
    "layout_compact" -> { (s, dir) =>
      val frag = Scratch.dir("layout_frag", dir)
      Scratch.once(frag) {
        t(s, dir, "orders")
          .repartition(12)
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(frag)
      }
      val compacted = Scratch.dir("layout_compacted", dir)
      Scratch.once(compacted) {
        graft.ops.LayoutOps.compact(
          s, frag, compacted, "o_orderpriority", targetRowsPerFile = 4096)
      }
      s.read.parquet(compacted)
    },
    // file-level data skipping (the lakehouse manifest read path): a
    // range-clustered unpartitioned layout + its min/max manifest answer
    // a key-range predicate opening only the files that can match — the
    // oracle (the plain filtered table) proves no row is lost or invented;
    // the file-count drop itself is asserted in LayoutOpsSpec
    "layout_skipping_scan" -> { (s, dir) =>
      val ranged = Scratch.dir("layout_ranged", dir)
      Scratch.once(ranged) {
        t(s, dir, "orders")
          .repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite").parquet(ranged)
      }
      val m = graft.ops.LayoutOps.manifest(s, ranged, Seq("o_orderkey"))
      // one-row scalar collect: the global max is table metadata, the
      // probe bound is its lowest decile (floor division, engine-exact)
      val maxKey = m.agg(max(col("max_o_orderkey"))).collect()(0).getLong(0)
      graft.ops.LayoutOps.skippingScan(
        s, ranged, m, "o_orderkey", lo = 1L, hi = maxKey / 10)
    },
    // incremental manifest maintenance: half the layout's files seed the
    // manifest, manifestAppend folds in the rest scanning ONLY them; the
    // maintained manifest's global rollup must equal the table's own
    // stats — which is what the oracle checks without seeing file paths
    "layout_manifest_maintain" -> { (s, dir) =>
      val ranged = Scratch.dir("layout_ranged", dir)
      Scratch.once(ranged) {
        t(s, dir, "orders")
          .repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite").parquet(ranged)
      }
      // driver-side listing diff — metadata, like a transaction-log read
      val all = s.read.parquet(ranged).inputFiles.sorted
      val prior = graft.ops.LayoutOps.manifestOf(
        s.read.parquet(all.take(all.length / 2).toIndexedSeq: _*), Seq("o_orderkey"))
      graft.ops.LayoutOps
        .manifestAppend(s, ranged, prior, Seq("o_orderkey"))
        .agg(
          sum(col("n_rows")).cast("long").as("n_rows"),
          min(col("min_o_orderkey")).as("min_key"),
          max(col("max_o_orderkey")).as("max_key"))
    },
    // the full OPTIMIZE story: a Z-ORDERED layout + the min/max manifest
    // skip files on a predicate over EITHER interleaved dimension — the
    // reason lakehouses z-order at all (a linear sort only bounds its
    // leading column; the Morton curve bounds both per file)
    "layout_zorder_skip" -> { (s, dir) =>
      val zdir = Scratch.dir("layout_z2d", dir)
      Scratch.once(zdir) {
        graft.ops.ZOrderOps
          .zorderLayout(
            t(s, dir, "lineitem")
              .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity")),
            "l_partkey", "l_suppkey", bits = 15, partitions = 8)
          .drop("zval")
          .write.mode("overwrite").parquet(zdir)
      }
      val m = graft.ops.LayoutOps.manifest(s, zdir, Seq("l_partkey", "l_suppkey"))
      // one-row scalar collect (table metadata); probe the lowest 5% of
      // one dimension — the z-curve bounds BOTH dims per file, so either
      // dimension prunes (LayoutOpsSpec asserts both)
      val maxPart = m.agg(max(col("max_l_partkey"))).collect()(0).getLong(0)
      graft.ops.LayoutOps.skippingScan(s, zdir, m, "l_partkey", lo = 1L, hi = maxPart / 20)
    },
    // file-level point lookup (the equality twin of the min/max skip):
    // a hash-bucket posting index over the SAME range-clustered layout
    // routes an IN-list probe to the files that can hold those keys; the
    // residual filter makes collisions an I/O cost, never a wrong row
    "layout_point_lookup" -> { (s, dir) =>
      val ranged = Scratch.dir("layout_ranged", dir)
      Scratch.once(ranged) {
        t(s, dir, "orders")
          .repartitionByRange(8, col("o_orderkey"))
          .write.mode("overwrite").parquet(ranged)
      }
      val idx = graft.ops.LayoutOps.bucketIndex(s, ranged, "o_orderkey", buckets = 4096)
      graft.ops.LayoutOps.pointLookupScan(
        s, ranged, idx, "o_orderkey", keys = Seq(1L, 2L, 3L, 5L, 7L), buckets = 4096)
    },
    // Z-order (Morton) clustering value: the exact bit-interleave every
    // row would be laid out by — the layout itself is asserted in
    // ZOrderSpec; the oracle checks the curve arithmetic per row
    "layout_zorder" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          ZOrderOps.zValue(col("l_partkey"), col("l_suppkey"), bits = 15).as("zval"))
    },
    // benchmark decontamination: every 50th doc plays the eval set; train
    // docs with >= 10% distinct-5-gram overlap against it are flagged
    "corpus_decontaminate" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      Curation.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 50 === 0), col("text"),
        n = 5, threshPct = 10
      )
    },
    // RAG chunking: 50-token windows every 25 tokens, one row per chunk
    "curate_chunk_windows" -> { (s, dir) =>
      Curation.chunkWindows(
        t(s, dir, "documents"), col("doc_id"), col("text"), chunkTokens = 50, stride = 25)
    },
    // PSL-backed registrable domain (the exact rule the two-label
    // heuristic approximates): a public-suffix dimension table joins
    // against every host's exploded label-suffixes, longest match wins —
    // a.b.co.uk groups under b.co.uk, a bare public suffix has no
    // registrable domain (NULL), unknown TLDs fall back to the heuristic.
    // Synthetic hosts exercise all four paths; the oracle replays the
    // longest-suffix election in SQL over the same VALUES dimension
    "curate_url_domain" -> { (s, dir) =>
      import s.implicits._
      val psl = Seq(
        "com", "net", "org", "uk", "co.uk", "ac.uk", "au", "com.au",
        "jp", "co.jp", "io", "gov").toDF("suffix")
      val d = t(s, dir, "documents")
      val id = col("doc_id")
      val host = when(id % 6 === 0,
        concat(lit("deep.sub."), (id % 7).cast("string"),
          lit(".shop"), (id % 5).cast("string"), lit(".co.uk")))
        .when(id % 6 === 1, concat(lit("site"), (id % 5).cast("string"), lit(".COM")))
        .when(id % 6 === 2, concat(lit("a.site"), (id % 5).cast("string"), lit(".ac.uk")))
        .when(id % 6 === 3, concat(lit("node"), (id % 5).cast("string"), lit(".example.zz")))
        .when(id % 6 === 4, lit("co.uk"))
        .otherwise(concat(lit("img"), (id % 3).cast("string"),
          lit(".cdn"), (id % 5).cast("string"), lit(".com.au")))
      graft.ext.Web.registrableDomains(d, id, host, psl)
    },
    // URL canonicalization + URL-level dedup (the pre-content-dedup
    // collapse every crawl pipeline runs): id-derived synthetic URLs
    // exercise every rule — scheme/host case, www, default port, trailing
    // slash, utm strip, param sort, fragment — and ids congruent mod 350
    // collide post-canonicalization, so the survivor election is real.
    // The oracle replays the full normalization in SQL
    "curate_url_canon" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val id = col("doc_id")
      val url = concat(
        when(id % 2 === 0, lit("HTTPS")).otherwise(lit("https")), lit("://"),
        when(id % 3 === 0, lit("WWW.")).otherwise(lit("")),
        lit("Site"), (id % 5).cast("string"), lit(".COM"),
        when(id % 3 === 0, lit(":443")).otherwise(lit("")),
        lit("/Docs/"), (id % 50).cast("string"),
        when(id % 4 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&b="), (id % 7).cast("string"), lit("&a=1"),
        when(id % 5 === 0, concat(lit("#sec"), id.cast("string"))).otherwise(lit("")))
      graft.ext.Web.urlDedup(d.select(id), id, url)
    },
    // corpus-internal repeated-span diagnostic: per-doc fraction of
    // distinct 5-grams shared with at least one other document
    "text_dup_span_frac" -> { (s, dir) =>
      Curation.dupSpanFraction(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 5)
    },
    // point-in-time join: each click picks up the user's latest purchase
    // at-or-before it (union + one window pass — merge-join shape, no
    // per-key cross product)
    "ev_asof_join" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalOps
        .asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("value"), "event_id")
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("purchase_us"),
          col("asof_value").as("purchase_value")
        )
    },
    // cumulative-unique-users curve: first-seen collapse (no cumulative
    // distinct state), per-day rollups, running total over the bounded
    // |days| frame — the growth denominator
    "ev_cumulative_uniques" -> { (s, dir) =>
      TemporalOps.cumulativeUniques(Fixtures.events(s, dir), col("user_id"), col("ts"))
    },
    // weekly-seasonality decomposition: per-(event_type, day) totals vs
    // the (event_type, day-of-week) baseline — dow as epoch_days mod 7
    // (engine-neutral), exact decimal means, residual = actual − baseline;
    // one daily rollup + a broadcast baseline join, no raw-row window
    "ev_seasonal_baseline" -> { (s, dir) =>
      TemporalOps.seasonalBaseline(
        Fixtures.events(s, dir),
        col("event_type"), col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
    },
    // NEAREST as-of: each click's closest purchase in either direction,
    // equidistant ties resolving backward — two window passes over ONE
    // key shuffle (the second reuses the exchange), row-local pick
    "ev_asof_nearest" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalOps
        .asofJoinNearest(clicks, purchases, "user_id", "ts", "ts", Seq("value"), "event_id")
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("purchase_us"),
          col("asof_dir"),
          col("asof_value").as("purchase_value")
        )
    },
    // forward as-of: each click's NEXT purchase at-or-after it (time-to-
    // conversion shape; same one-shuffle merge plan, reversed ts order)
    "ev_asof_forward" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      TemporalOps
        .asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("value"), "event_id", forward = true)
        .select(
          col("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("purchase_us"),
          col("asof_value").as("purchase_value")
        )
    },
    // interval join: events of the same user within ±30 min of each error
    // event, aggregated per anchor (bucketized equi-join, not a theta join)
    "ev_range_join" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val anchors = ev
        .filter(col("event_type") === "error")
        .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("a_ts"))
      val others = ev.select(
        col("user_id"), col("ts").as("e_ts"), col("event_id").as("e_id"), col("value"))
      val near = TemporalOps
        .rangeJoin(anchors, others, "user_id", "a_ts", "e_ts", tolSec = 1800)
        .filter(col("e_id") =!= col("anchor_id"))
        .groupBy(col("anchor_id"))
        .agg(
          count(lit(1)).as("n_nearby"),
          sum(col("value").cast("decimal(18,2)")).as("sv")
        )
      anchors
        .join(near, Seq("anchor_id"), "left")
        .select(
          col("anchor_id"),
          col("user_id"),
          unix_micros(col("a_ts")).as("ts_us"),
          coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
          coalesce(col("sv"), lit(0).cast("decimal(18,2)")).cast("double").as("total_value")
        )
    },
    // exact interpolated quantiles of the doc-length distribution (the
    // validation twin of approx_percentile; integer inputs => engine-exact)
    "stats_quantiles" -> { (s, dir) =>
      Stats.exactQuantiles(
        t(s, dir, "documents"), col("n_chars"), Seq(0.25, 0.5, 0.75, 0.9))
    },
    // decile banding without ntile()-over-() (that global window is the
    // single-task sort the two-phase quantiles exist to avoid): 9 exact
    // cut points collected as bounded driver scalars, then map-only
    // assignment by comparison fold
    "stats_deciles" -> { (s, dir) =>
      Stats
        .quantileBuckets(
          t(s, dir, "documents"), col("doc_id"), col("n_chars"),
          (1 to 9).map(_ / 10.0))
        .select(col("id").as("doc_id"), col("v"), col("q_bucket"))
    },
    // Pearson correlation chars~tokens via integer moment sums (the
    // engine-exact alternative to corr()'s merge-order-dependent stream)
    "stats_corr" -> { (s, dir) =>
      Stats.corrExact(
        t(s, dir, "documents"), col("n_chars"), TextStats.tokenCount(col("text")))
    },
    // the grouped profile a curation user actually runs: corr(chars, tokens)
    // per source — keyed moments partial-aggregate, |sources| rows shuffle
    "stats_corr_by_source" -> { (s, dir) =>
      Stats.corrExactBy(
        t(s, dir, "documents"), col("source"), col("n_chars"),
        TextStats.tokenCount(col("text")))
    },
    // distribution-drift monitor: per-source two-sample KS distance of the
    // n_chars distribution between two md5-hash snapshot halves (id parity
    // won't do: the fixture derives source FROM doc_id, so parity is
    // constant within a source) — decimal(38,0) cross-product numerator,
    // one rounded double at the end, one-sided groups dropped (KS
    // undefined, not zero)
    "stats_ks_drift" -> { (s, dir) =>
      Stats.ksDrift(
        t(s, dir, "documents"), col("source"), col("n_chars"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // deterministic round-robin source interleave (the dataloader order):
    // position p reads source p mod |S|, within-source order is the epoch-
    // salted md5 shuffle — every contiguous slice carries every source
    "corpus_interleave_rr" -> { (s, dir) =>
      Curation.interleaveRoundRobin(
        t(s, dir, "documents"), col("doc_id"), col("source"), epoch = 1)
    },
    // categorical drift: per-source total-variation distance of the LANG
    // mix between the same md5-hash halves — the unordered-category
    // complement of the KS monitor, same integer cross-product discipline
    "stats_tvd_drift" -> { (s, dir) =>
      Stats.tvdDrift(
        t(s, dir, "documents"), col("source"), col("lang"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // scorecard-standard drift: per-source PSI of the lang mix between the
    // same md5 halves — log-weighted, so small-category shifts score high;
    // Laplace-smoothed, 9-dp-quantized terms summed in exact decimal
    "stats_psi_drift" -> { (s, dir) =>
      Stats.psiDrift(
        t(s, dir, "documents"), col("source"), col("lang"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // bounded symmetric drift: per-source Jensen-Shannon divergence (base
    // 2, [0,1]) of the lang mix — the trendable companion to the PSI
    // threshold alert; zero cells are finite by construction, no smoothing
    "stats_jsd_drift" -> { (s, dir) =>
      Stats.jsdDrift(
        t(s, dir, "documents"), col("source"), col("lang"),
        graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 2L) === 0)
    },
    // drift SIGNIFICANCE: Welch's unequal-variance t per event_type on the
    // cent-quantized value between md5 halves — exact decimal moments, a
    // transcendental-free IEEE tail, + Welch–Satterthwaite df
    "stats_welch_t" -> { (s, dir) =>
      Stats.welchT(
        Fixtures.events(s, dir).filter(col("value").isNotNull),
        col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long"),
        graft.ops.Hashing.md5Mod(col("event_id").cast("string"), 2L) === 0)
    },
    // uncertainty at scale: Poisson-bootstrap CI for per-type mean cents —
    // B=32 deterministic Poisson(1) weight columns, ALL replicate sums in
    // ONE partial-agg'd pass (never B resampling shuffles), CI row-local
    // off the sorted replicate array
    "stats_bootstrap_ci" -> { (s, dir) =>
      Stats.bootstrapMeanCI(
        Fixtures.events(s, dir),
        col("event_type"), col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long"),
        reps = 32)
    },
    // growth accounting: per-day new/retained/resurrected/churning user
    // decomposition (7-day gap, churn right-censored at the data edge);
    // distinct user-days once, lag/lead over ACTIVE days only
    "ev_growth_accounting" -> { (s, dir) =>
      TemporalOps.growthAccounting(
        Fixtures.events(s, dir), col("user_id"), col("ts"), gapDays = 7)
    },
    // product-analytics session paths: each session rendered as its
    // ordered event-type string, top-20 by frequency — per-session state
    // bounded by the gap rule, TakeOrdered over the path vocabulary
    "ev_path_sessions" -> { (s, dir) =>
      graft.streaming.Sessionize.sessionPaths(
        Fixtures.events(s, dir), "user_id", "ts", "event_id", "event_type",
        gapMinutes = 30, topK = 20)
    },
    // robust feature scaling: (v − median)/IQR per source — ONE quantile
    // sort serves all three quartiles, stats broadcast back; IQR=0 groups
    // scale to NULL, never ±∞
    "stats_robust_scale" -> { (s, dir) =>
      Stats.robustScale(
        t(s, dir, "documents"), col("source"), col("doc_id"), col("n_chars"))
    },
    // change-point LOCALIZATION: per-event-type CUSUM over daily cents —
    // the WHEN companion to the KS/TVD/PSI drift monitors; all-integer
    // scaled walk Σ(N·x − S_N), |peak| at the last pre-shift day
    "stats_cusum_changepoint" -> { (s, dir) =>
      Stats.cusumChangepoint(
        Fixtures.events(s, dir),
        col("event_type"), to_date(col("ts")),
        floor(col("value") * 100 + lit(0.5)).cast("long"))
    },
    // categorical ASSOCIATION audit: per-source chi-square of independence
    // between lang and a length bucket + Cramér's V effect size — zero
    // cells folded in algebraically (χ² = n + Σ_obs[(O−E)²/E − E]), exact
    // decimal margins, 9-dp-quantized IEEE terms in an exact decimal sum
    "stats_chi2_assoc" -> { (s, dir) =>
      Stats.chi2Assoc(
        t(s, dir, "documents"),
        col("source"), col("lang"), expr("least(n_chars div 150, 5L)"))
    },
    // Unicode NFC canonicalization (the native graft_nfc Expression):
    // decomposed suffixes (e+combining acute, A+combining ring) are
    // composed before digesting — both engines implement the same Unicode
    // algorithm, so the md5 of the normalized text is byte-exact
    "text_nfc_normalize" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"), lit(" café Å")).as("t"))
        .select(
          col("doc_id"),
          length(col("t")).as("len_raw"),
          length(expr("graft_nfc(t)")).as("len_nfc"),
          md5(expr("graft_nfc(t)")).as("h"))
    },
    // per-source outlier flags via the all-integer z-score predicate —
    // (n·x − S)² > 9·(n·SS − S²), no float anywhere, boundary rows can't
    // flip between engines
    "stats_outliers" -> { (s, dir) =>
      Stats.outliersExact(
        t(s, dir, "documents"), col("source"), col("doc_id"), col("n_chars"), k = 3)
    },
    // robust (median/MAD) outliers on event values — Hampel's k=3 rule in
    // the doubled-integer domain, so the interpolated medians are exact
    // Longs and the flag can never flip on float rounding
    "stats_mad_outliers" -> { (s, dir) =>
      Stats.madOutliers(
        Fixtures
          .events(s, dir)
          .select(col("event_id"), expr("cast(floor(value * 100) as long)").as("cents")),
        col("event_id"), col("cents"), k = 3)
    },
    // EXACT heavy hitters via the count-min gate: output is identical to
    // the plain HAVING-threshold truth (count-min never underestimates),
    // but the exact pass's shuffle carries only gate survivors
    "text_heavy_hitters" -> { (s, dir) =>
      val tokens = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      Sketches
        .heavyHittersExact(tokens, col("token"), threshold = 500L, depth = 4, width = 256)
        .withColumnRenamed("item", "token")
    },
    // fuzzy record linkage: pigeonhole segment blocking + levenshtein
    // verify over a typo fixture (md5-derived 9-char keys, one letter
    // substitution per non-multiple-of-5 id) — 100 clusters of 5, all
    // C(5,2) in-cluster pairs within distance 2, equal-length so the
    // segment guarantee is exact; oracle replays fixture, blocks, verify
    "fuzzy_name_pairs" -> { (s, dir) =>
      graft.ops.FuzzyOps.editBlockedPairs(
        fuzzyNames(s, dir), col("id"), col("s"), maxDist = 2, maxBlock = 64)
    },
    // asymmetric containment join over 3-gram sets (|A∩B|/|A| >= 9/10):
    // the quote/subset detector Jaccard misses — containment prefix on
    // the probe side, full-gram inverted index on the contained-in side,
    // one merge-walk verify per deduped candidate; all compares integer
    "dedup_containment" -> { (s, dir) =>
      Dedup.containmentPairs(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        tauNum = 9, tauDen = 10, shingle = 3)
    },
    // blocking-quality audit: MEASURED pair completeness of the segment
    // blocker against exact all-pairs truth on the md5 eval stratum
    // (1/20) — the assumed pigeonhole recall, checked; truth cost is
    // fixed eval state, blocked pairs restrict via two semi-joins
    "er_blocking_quality" -> { (s, dir) =>
      graft.ops.FuzzyOps.blockingQuality(
        fuzzyNames(s, dir), col("id"), col("s"),
        maxDist = 2, maxBlock = 64, strataMod = 20L)
    },
    // end-to-end entity resolution: the blocked edit-distance matcher's
    // pairs become entity clusters via pointer-jumping CC, singletons keep
    // their own id, and every record carries its entity + member count —
    // the block → match → cluster → label composition an MDM pipeline runs
    "er_entities" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val names = fuzzyNames(s, dir)
      val pairs = graft.ops.FuzzyOps
        .editBlockedPairs(names, col("id"), col("s"), maxDist = 2, maxBlock = 64)
        .select(col("id_lo"), col("id_hi"))
      val clusters = Dedup.connectedComponents(pairs).withColumnRenamed("doc_id", "id")
      names
        .join(clusters, Seq("id"), "left")
        .withColumn("entity_id", coalesce(col("canonical_id"), col("id")))
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("entity_id"))))
        .select(col("id"), col("entity_id"), col("n_members"))
    },
    // hot-key DIAGNOSTIC: the exact per-key weight audit you run before
    // paying for a salting rewrite — top-20 heaviest user_ids with integer
    // ppm share and ×-mean weight; per-key partial agg + scalar totals, no
    // raw-row shuffle, TakeOrdered top-K
    "audit_key_skew" -> { (s, dir) =>
      graft.ops.SkewOps.keySkewAudit(Fixtures.events(s, dir), col("user_id"), topK = 20)
    },
    // skew-safe aggregation: the two-stage salted group-by, bit-identical
    // to the direct aggregate (algebraic functions commute with sharding)
    "agg_salted_skew" -> { (s, dir) =>
      graft.ops.SkewOps.saltedAgg(
        t(s, dir, "documents"), col("source"), col("n_chars"), col("doc_id"), salts = 16)
    },
    // the join-side skew pattern: salted equi-join, result identical to
    // the plain join (each big row meets its dim rows in one shard); the
    // salt count is auto-derived from a count-min key-frequency pre-pass
    "j8_salted_join" -> { (s, dir) =>
      graft.ops.SkewOps.saltedJoinAuto(
        t(s, dir, "lineitem").select(col("l_suppkey"), col("l_orderkey"), col("l_quantity")),
        t(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"), col("s_name")),
        "l_suppkey", col("l_orderkey"))
    },
    // bloom-gated shuffle join: probe rows whose key can't be in the
    // build side are dropped MAP-SIDE before the exchange; no false
    // negatives → identical to the plain join the oracle runs, for any
    // (m, k) — sketch sizing tunes shuffle bytes, never the answer
    "j9_bloom_gated_join" -> { (s, dir) =>
      graft.ops.LinkOps
        .bloomGatedJoin(
          t(s, dir, "lineitem").select(col("l_partkey"), col("l_quantity")),
          t(s, dir, "part").filter(col("p_size") === 10).select(col("p_partkey"), col("p_name")),
          "l_partkey", "p_partkey", m = 1L << 14, k = 4)
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
    },
    // exact-size-k deterministic sample — TakeOrdered over the md5 hash,
    // no global sort, retry-stable (vs rand())
    "corpus_sample_exact_k" -> { (s, dir) =>
      Curation.sampleExactK(
        t(s, dir, "documents").select(col("doc_id"), col("source")), col("doc_id"), k = 200)
    },
    // privacy release gate: k-anonymity + l-diversity per quasi-identifier
    // group — exact counts, row-local verdicts; the semi-join against
    // passing groups is the actual release filter
    "privacy_k_anonymity" -> { (s, dir) =>
      Curation.kAnonymity(
        t(s, dir, "documents").withColumn("len_bucket", col("n_chars") % 10),
        Seq(col("source"), col("len_bucket")), col("lang"), k = 5, l = 2)
    },
    // curation gate FUNNEL: cumulative survivors through the ordered gate
    // chain in ONE partial-agg'd pass — the data-card table that explains
    // WHERE the corpus is lost; ppm exact integer div
    "curation_gate_funnel" -> { (s, dir) =>
      Curation.gateFunnel(
        t(s, dir, "documents"),
        Seq(
          "nonempty" -> (length(trim(col("text"))) > 0),
          "english" -> (col("lang") === "en"),
          "min_len" -> (col("n_chars") >= 100),
          "max_len" -> (col("n_chars") <= 1500)))
    },
    // ε-DP count release: Laplace(1/ε) via deterministic inverse-CDF on
    // the md5 grid — per-(event_type, day) noised counts, true counts
    // never published; row-local algebra on the partial-agg'd aggregate
    "privacy_dp_counts" -> { (s, dir) =>
      Curation.dpNoisyCounts(
        Fixtures.events(s, dir).withColumn("day", to_date(col("ts"))),
        Seq(col("event_type"), col("day")), eps = 1.0)
    },
    // join-size estimation from two count-min sketches: the CM inner-
    // product bound (min_j Σ_w A[j,w]·B[j,w]) vs the true join count —
    // the optimizer-statistics probe that prices a join from O(d·w)
    // summaries without rescanning either side
    "sketch_join_size" -> { (s, dir) =>
      val a = t(s, dir, "lineitem").select(col("l_orderkey").cast("string").as("k"))
      val b = t(s, dir, "orders").select(col("o_orderkey").cast("string").as("k"))
      val ca = Sketches.countMinCells(a, col("k"), depth = 4, width = 512)
      val cb = Sketches.countMinCells(b, col("k"), depth = 4, width = 512)
      Sketches
        .countMinJoinSize(ca, cb, depth = 4)
        // two one-row frames: the cross join is a scalar attach
        .crossJoin(a.join(b, "k").agg(count(lit(1)).as("true_join_rows")))
    },
    // weighted exact-k draw (Efraimidis–Spirakis A-Res): probability
    // proportional to n_chars, without replacement — the length-weighted
    // corpus sample; TakeOrdered over ln(u)/w, no global sort
    "corpus_sample_weighted" -> { (s, dir) =>
      Curation.sampleWeighted(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("doc_id"), col("n_chars"), k = 150)
    },
    // per-group exact-k cap: at most 5 docs per source, chosen by the same
    // md5 gate — partitioned-window ranking, no global order
    "corpus_sample_k_per_group" -> { (s, dir) =>
      Curation.sampleExactKPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), k = 5)
    },
    // int8 embedding quantization (storage/serving compression) — fixed-
    // order double arithmetic, bit-identical codes in any engine
    "emb_quantize_int8" -> { (s, dir) =>
      Similarity.quantizeInt8(t(s, dir, "embeddings"), col("vec_id"), col("embedding"))
    },
    // the serving composition over those codes: integer-dot top-k
    "ann_int8_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      Similarity.int8TopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    },
    // group-level quality gate: drop whole sources whose mean doc length
    // misses the bar — an aggregate decision no per-row filter expresses
    "corpus_filter_by_group" -> { (s, dir) =>
      Curation.filterByGroupMean(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("n_chars"), minMean = 300.0)
    },
    // static domain mixing: rebalance sources to 3:2:1:... target
    // proportions, bottleneck stratum kept whole, others hash-downsampled
    "corpus_mix_weighted" -> { (s, dir) =>
      Curation.mixToTarget(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"),
        weights = Map("src0" -> 3, "src1" -> 2), defaultWeight = 1)
    },
    // per-group quantile curation: each source keeps only docs at or
    // above its OWN median length (type-1 order statistic, integer rank
    // math, value-ties kept) — a global cut would gut small strata
    "corpus_filter_quantile" -> { (s, dir) =>
      Curation.filterByGroupQuantile(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("n_chars"), pNum = 1, pDen = 2)
    },
    // temperature-flattened mixing (target share ∝ n^(1/2), the
    // multilingual-LM sampling rule): weights derived from the counts
    // themselves — floor(sqrt(n)·1e6), IEEE-exact in any engine — with
    // the same bottleneck-at-100% md5 gate as corpus_mix_weighted
    "corpus_mix_temperature" -> { (s, dir) =>
      Curation.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"))
    },
    // per-label embedding centroids: exact quantized sums + means, one row
    // per (label, dim) — class prototypes / IVF centroid init
    "emb_label_centroid" -> { (s, dir) =>
      Similarity
        .groupCentroids(t(s, dir, "embeddings"), col("label"), col("embedding"))
        .select(col("grp").as("label"), col("pos"), col("n_vecs"), col("sum_q"), col("mean_q"))
    },
    // per-label embedding diversity: mean pairwise cosine via the
    // sum-of-vectors identity — O(n·dim), no pairwise join; the collapse
    // detector for synthetic or near-duplicate strata
    "emb_label_diversity" -> { (s, dir) =>
      Similarity.groupDiversity(t(s, dir, "embeddings"), col("label"), col("embedding"))
    },
    // EWMA smoothing (α=1/4, 8-row tail) per user: integer weight algebra,
    // one rounded division — the monitoring smoother beside ev_rolling
    "ts_ewma" -> { (s, dir) =>
      TemporalOps
        .ewmaSmooth(Fixtures.events(s, dir), "user_id", "ts", "event_id", "value", nRows = 8)
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("n_window"), col("ewma"))
    },
    // rolling 5-event window per user: decimal-exact running sum + count
    "ev_rolling" -> { (s, dir) =>
      TemporalOps
        .rollingSum(Fixtures.events(s, dir), "user_id", "ts", "event_id", "value", nRows = 5)
        .select(
          col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("roll_sum"), col("n_window"))
    },
    // rolling z-score anomaly flags, float-free: the |x−μ| > k·σ compare
    // cross-multiplied into Long arithmetic ((n·x−S)² > k²·(nQ−S²)) over
    // cent-quantized values — the windowed form of the stats_outliers
    // exactness contract, so the flag cannot flip on float rounding.
    // nRows=12 with k=3: a window's own point can reach at most
    // (n−1)/√n̅ σ from its mean, so k=3 needs n ≥ 11 to be able to fire
    "ev_anomaly_roll" -> { (s, dir) =>
      TemporalOps
        .rollingZOutliers(
          Fixtures.events(s, dir)
            .select(
              col("event_id"), col("user_id"), col("ts"),
              expr("cast(floor(value * 100) as long)").as("cents")),
          "user_id", "ts", "event_id", "cents", nRows = 12, k = 3)
        .select(
          col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("n_window"), col("win_sum"), col("flagged"))
    },
    // time-series resampling with forward fill: an hourly grid per user
    // (generated in-plan — sequence + explode, no driver loop), each point
    // carrying the user's latest event at-or-before it via the SAME as-of
    // operator queries use directly — operator composition, not a one-off
    "ev_resample_ffill" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val grid = ev
        .groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("INTERVAL 1 HOUR"))).as("gts"))
      TemporalOps
        .asofJoin(
          grid,
          ev.select(col("user_id"), col("ts"), col("value"), col("event_id")),
          "user_id", "gts", "ts", Seq("value"), "event_id")
        .select(
          col("user_id"),
          unix_micros(col("gts")).as("gts_us"),
          unix_micros(col("asof_ts")).as("last_ts_us"),
          col("asof_value").as("last_value"))
    },
    // conversion funnel: each user's first click, first purchase at-or-after
    // it, latency, and purchase count after the click — one window pass to
    // pin the anchor, one aggregate; unconverted users kept via left join
    // event-type transition matrix (Markov counts): per-user lag window
    // (per-user sort, never global) + a bounded |types|² pair count
    "ev_transitions" -> { (s, dir) =>
      TemporalOps.transitionMatrix(
        Fixtures.events(s, dir), "user_id", "ts", "event_id", "event_type")
    },
    // fixed-grid DAILY resample + LOCF gap-fill: per (user, day) latest
    // observation (micros-exact ordering), grid spans first..last observed
    // day per user, last value carried forward across the gaps
    "ts_resample_locf" -> { (s, dir) =>
      TemporalOps.resampleLocf(
        Fixtures.events(s, dir), "user_id", "ts", "event_id", "value", stepSec = 86400L)
    },
    // fixed-iteration (3) integer PageRank over the per-user props.k
    // transition graph — rank propagation as join+agg rounds, all-integer
    // so the oracle unrolls the identical three iterations in SQL
    "graph_pagerank" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = Fixtures
        .events(s, dir)
        .select(
          col("user_id"), col("ts"), col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("dst"))
        .withColumn("src", lag(col("dst"), 1).over(w))
        .filter(col("src").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("w"))
      graft.ops.GraphOps.pageRank(edges, "src", "dst", "w", iters = 3)
    },
    // last-touch attribution: every purchase credits the latest click
    // at-or-before it — the as-of join composed over a filtered stream
    // (nulls when the user never clicked before buying)
    "ev_attribution_last_touch" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"))
      TemporalOps
        .asofJoin(purchases, clicks, "user_id", "ts", "cts", Seq("cid"), "cid")
        .select(
          col("user_id"),
          col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("purchase_us"),
          col("asof_cid").as("click_id"),
          unix_micros(col("asof_ts")).as("click_us"))
    },
    // LINEAR multi-touch attribution over a BOUNDED 3-day lookback: every
    // click within [purchase - 3d, purchase] shares the credit equally,
    // in integer cents — credit = cents div n with the remainder assigned
    // to the most recent click (ties to the greatest click id, the
    // asofJoin tie rule), so Σ credit == cents exactly and any engine
    // replays the split. Purchases with no click in the horizon emit no
    // rows (no touch, no credit — inner-join semantics).
    // Scale: the horizon is what makes this survivable — production
    // attribution always bounds the window, and the bucketized
    // lookbackJoin bounds per-(user, bucket) fanout by clicks-per-2-
    // horizons, never clicks-per-lifetime (a bot user with 10⁴ lifetime
    // clicks costs only its in-horizon rows). One window per purchase key
    // after the join.
    "ev_attribution_linear" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"), col("ts"), col("event_id").as("purchase_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      val j = TemporalOps.lookbackJoin(
        purchases, clicks, "user_id", "ts", "cts", horizonSec = 3L * 86400L)
      val byP = Window.partitionBy(col("purchase_id"))
      j.withColumn("n_touches", count(lit(1)).over(byP))
        .withColumn(
          "rn",
          row_number().over(byP.orderBy(col("cts").desc, col("click_id").desc)))
        .select(
          col("user_id"),
          col("purchase_id"),
          col("click_id"),
          col("n_touches"),
          (expr("cents div n_touches") +
            when(col("rn") === 1, expr("cents % n_touches")).otherwise(0L)).as("credit_cents"))
    },
    // U-SHAPED (position-based) attribution over the same 3-day lookback:
    // the first and last touch each take 40%, the middles share the
    // remaining 20% equally — all in integer cents with every remainder
    // assigned to the most recent touch, so Σ credit == cents exactly.
    // n=1 takes everything; n=2 splits half/half (remainder to the most
    // recent). Same bounded lookbackJoin shape as the linear query; the
    // role column makes the split auditable
    "ev_attribution_ushape" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"), col("ts"), col("event_id").as("purchase_id"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"), col("event_id").as("click_id"))
      val j = TemporalOps.lookbackJoin(
        purchases, clicks, "user_id", "ts", "cts", horizonSec = 3L * 86400L)
      val byP = Window.partitionBy(col("purchase_id"))
      val t = j
        .withColumn("n_touches", count(lit(1)).over(byP))
        .withColumn(
          "rn",
          row_number().over(byP.orderBy(col("cts").desc, col("click_id").desc)))
      val n = col("n_touches")
      val role = when(n === 1, lit("solo"))
        .when(col("rn") === 1, lit("last"))
        .when(col("rn") === n, lit("first"))
        .otherwise(lit("middle"))
      val fl = expr("cents * 40 div 100") // first/last share when n >= 3
      val half = expr("cents div 2")
      val mid = (col("cents") - fl * 2) // middles' pool when n >= 3
      val perMid = expr("(cents - 2 * (cents * 40 div 100)) div (n_touches - 2)")
      val credit = when(n === 1, col("cents"))
        .when(n === 2, when(col("rn") === 1, col("cents") - half).otherwise(half))
        .otherwise(
          when(col("rn") === n, fl)
            .when(col("rn") === 1, fl + (mid - perMid * (n - 2))) // last: share + remainder
            .otherwise(perMid))
      t.select(
        col("user_id"),
        col("purchase_id"),
        col("click_id"),
        col("n_touches"),
        role.as("role"),
        credit.as("credit_cents"))
    },
    "ev_funnel" -> { (s, dir) =>
      val ev = Fixtures.events(s, dir)
      // anchor via aggregate + join back, NOT a per-user window: the window
      // form sorts every event inside the shuffle; this shape is one
      // partial-agg plus a join on the same key. NO broadcast hint: anchors
      // is one row per clicking user — user-grain, so it scales WITH the
      // data, and a forced broadcast would collect-and-ship O(|users|) at
      // 100x. AQE picks broadcast at runtime when the frame measures small
      // and falls back to a shuffled join when it doesn't.
      val anchors = ev
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "click", col("ts"))).as("c_ts"))
        .filter(col("c_ts").isNotNull)
      val conv = ev
        .filter(col("event_type") === "purchase")
        .join(anchors, Seq("user_id"))
        .filter(col("ts") >= col("c_ts"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("p_ts"), count(lit(1)).as("n_purchases_after"))
      anchors
        .join(conv, Seq("user_id"), "left")
        .select(
          col("user_id"),
          unix_micros(col("c_ts")).as("click_us"),
          unix_micros(col("p_ts")).as("purchase_us"),
          (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("latency_us"),
          coalesce(col("n_purchases_after"), lit(0L)).as("n_purchases_after"))
    },
    // cohort retention: first-seen-week cohorts x week offset x distinct
    // returning users — aggregate-then-probe shape, no per-user window.
    // broadcastCohorts=false: the cohort frame is USER-GRAIN (grows with
    // the data), so the registered query leaves the join choice to AQE;
    // the opt-in broadcast fast path stays for small-tenant callers
    "ev_cohort_retention" -> { (s, dir) =>
      TemporalOps.cohortRetention(
        Fixtures.events(s, dir), "user_id", "ts", broadcastCohorts = false)
    },
    // JSON column parsing: extract props.k and profile it per event type
    "ev_props_json" -> { (s, dir) =>
      Fixtures
        .events(s, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    },
    // fuzzy matching: Levenshtein distance between consecutive docs' 40-char
    // prefixes (the record-linkage primitive; both engines implement the
    // standard Wagner-Fischer metric)
    "text_edit_distance" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), substring(col("text"), 1, 40).as("prefix"))
      d.as("a")
        .join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
        .select(
          col("a.doc_id").as("id_lo"),
          col("b.doc_id").as("id_hi"),
          levenshtein(col("a.prefix"), col("b.prefix")).as("dist"))
    },
    // grouped exact median via PARTITIONED windows — scales across groups,
    // unlike the single global sort of stats_quantiles
    "stats_median_by_source" -> { (s, dir) =>
      Stats
        .groupedQuantile(t(s, dir, "documents"), col("source"), col("n_chars"), p = 0.5)
        .select(col("grp").as("source"), col("q").as("median"))
    },
    // count-min point-frequency estimates for probe tokens, exact counts
    // riding along as the audit ("zebra" is absent from the fixture vocab)
    "sketch_countmin" -> { (s, dir) =>
      import s.implicits._
      val tokens = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
      val cells = Sketches.countMinCells(tokens, col("token"), depth = 4, width = 256)
      val probes = Seq("spark", "table", "the", "zebra").toDF("item")
      val est = Sketches.countMinEstimate(cells, probes, col("item"), depth = 4, width = 256)
      val exact = tokens.groupBy(col("token").as("item")).agg(count(lit(1)).as("exact"))
      est
        .join(exact, Seq("item"), "left")
        .select(col("item").as("token"), col("est"), coalesce(col("exact"), lit(0L)).as("exact"))
    },
    // HyperLogLog register table: the integer-exact, mergeable-by-max half
    // of HLL (the float estimate stays driver-side; see Sketches scaladoc).
    // 2^8 = 256 registers over ~10k distinct custkeys
    "sketch_hll_registers" -> { (s, dir) =>
      Sketches.hllRegisters(t(s, dir, "orders"), col("o_custkey"), p = 8)
    },
    // per-group HLL rollup unit: one register table per order status —
    // max-merge any subset of groups for their combined distinct count
    "sketch_hll_by_group" -> { (s, dir) =>
      Sketches.hllRegistersByGroup(
        t(s, dir, "orders"), col("o_orderstatus"), col("o_custkey"), p = 8)
    },
    // mergeable quantile sketch (KLL-style levels, hash-derandomized):
    // level-4 gate keeps ~1/16 of orders at weight 16; deciles read off
    // the (value, key)-ranked sample. Engine-exact: the md5 gate, the
    // string-keyed tie order, and the double ceil all replay in DuckDB.
    "sketch_kll_quantiles" -> { (s, dir) =>
      val sk = Sketches.kllSketch(
        t(s, dir, "orders"), col("o_totalprice"), col("o_orderkey"), level = 4)
      Sketches.kllQuantiles(sk, (1 to 9).map(_ / 10.0))
    },
    // per-group profile quartiles off one grouped sketch pass — the
    // per-source/per-language distribution report at sketch cost
    "sketch_kll_by_group" -> { (s, dir) =>
      val sk = Sketches.kllSketchGrouped(
        t(s, dir, "orders"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"), level = 3)
      Sketches.kllQuantilesByGroup(sk, col("grp"), Seq(0.25, 0.5, 0.75))
    },
    // Bloom-filter membership (one-sided error): build the bit set over
    // custkeys that have orders, probe every customer, and ride the exact
    // membership along as the audit column — rows where maybe=true but
    // actual=false ARE the sketch's false positives, visible in the output
    "sketch_bloom_probe" -> { (s, dir) =>
      val bits = Sketches.bloomBits(
        t(s, dir, "orders"), col("o_custkey"), m = 65536L, k = 3)
      val probed = Sketches.bloomProbe(
        bits, t(s, dir, "customer"), col("c_custkey"), m = 65536L, k = 3)
      val actual = t(s, dir, "orders")
        .select(col("o_custkey").cast("string").as("item"))
        .distinct()
        .withColumn("actual", lit(true))
      probed
        .join(actual, Seq("item"), "left")
        .select(
          col("item").as("custkey"),
          col("maybe"),
          coalesce(col("actual"), lit(false)).as("actual"))
    },
  )

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
    // symmetrize, top-3 per node by (jac DESC, dst)
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
    // the persisted-bucketed probe is an EXECUTION-layout variant: the
    // pair set is defined identically, so the oracle is shared verbatim
    "dedup_incremental_bucketed" -> incrementalProbeSql,
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
    "corpus_sample_stratified" ->
      s"""WITH p AS (SELECT doc_id, concat(' ', lower(coalesce(text, '')), ' ') AS p FROM documents),
          sc AS (SELECT doc_id, ${langScoreSqls.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")} FROM p),
          b AS (SELECT *, greatest(${langScoreSqls.map(x => "s_" + x._1).mkString(", ")}) AS best FROM sc),
          lng AS (
            SELECT doc_id,
              CASE ${langScoreSqls.map { case (l, _) => s"WHEN s_$l = best AND best > 0 THEN '$l'" }.mkString(" ")}
                   ELSE 'und' END AS lang
            FROM b)
          SELECT doc_id, lang FROM lng
          WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000
                < CASE WHEN lang = 'en' THEN 500 ELSE 1000 END""",
    "scd_changelog_apply" -> changelogApplySql,
    // merge twin: the clause outcomes enumerated over the key arithmetic
    "scd_merge_into" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
                       FROM orders)
         SELECT k AS o_orderkey, st AS o_orderstatus, tp AS o_totalprice
         FROM base WHERE k % 11 <> 0 AND NOT (k % 7 = 0)
         UNION ALL
         SELECT k, st, tp + 1000 FROM base WHERE k % 7 = 0 AND k % 11 <> 0
         UNION ALL
         SELECT k + 11000000, st, tp FROM base
         WHERE k % 13 = 0 AND (k + 11000000) % 11 <> 0""",
    // merge source-uniqueness audit: replay the same source union, count
    // keys with multiplicity > 1 (none on fixtures)
    "merge_conflicts" ->
      """WITH src AS (
           SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 11 <> 0
           UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 11 = 0
           UNION ALL SELECT o_orderkey + 11000000 FROM orders WHERE o_orderkey % 13 = 0),
         c AS (SELECT k, count(*) AS n FROM src GROUP BY k HAVING count(*) > 1)
         SELECT CAST(count(*) AS BIGINT) AS n_conflict_keys,
                CAST(coalesce(sum(n), 0) AS BIGINT) AS n_conflict_rows
         FROM c""",
    // IVM invariant twin: the maintained view must equal a FULL recompute
    // over the net row set (base minus retracted plus inserted) — the
    // oracle does that recompute directly, never seeing the delta path
    "mv_delta_maintain" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS BIGINT)
                  AS sum_cents
         FROM events
         WHERE event_id % 3 = 0 OR event_id % 11 <> 0
         GROUP BY 1, 2""",
    // snapshot twin: the history CTE filtered to intervals covering t=2
    "scd_snapshot_diff" ->
      """WITH p AS (SELECT o_orderkey k, o_orderstatus s, o_totalprice t
                    FROM orders WHERE o_orderkey % 7 <> 0),
         n AS (SELECT o_orderkey k, o_orderstatus s,
                      CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1 ELSE o_totalprice END t
               FROM orders WHERE o_orderkey % 5 <> 0),
         j AS (SELECT p.k pk, p.s ps, p.t pt, n.k nk, n.s ns, n.t nt
               FROM p FULL OUTER JOIN n ON p.k = n.k),
         c AS (SELECT *, CASE WHEN pk IS NULL THEN 'I' WHEN nk IS NULL THEN 'D'
                              WHEN NOT (ps IS NOT DISTINCT FROM ns AND pt IS NOT DISTINCT FROM nt)
                              THEN 'U' END AS op
               FROM j)
         SELECT coalesce(nk, pk) AS o_orderkey,
                CASE WHEN op = 'D' THEN ps ELSE ns END AS o_orderstatus,
                CASE WHEN op = 'D' THEN pt ELSE nt END AS o_totalprice,
                op
         FROM c WHERE op IS NOT NULL""",
    "scd_snapshot_at" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
         rows AS (
           SELECT o_orderkey, o_totalprice, 0 AS vf,
             CASE WHEN o_orderkey % 7 = 0 THEN 1
                  WHEN o_orderkey % 11 = 0 THEN 2 END AS vt
           FROM base
           UNION ALL
           SELECT o_orderkey, o_totalprice + 1000, 1,
             CASE WHEN o_orderkey % 11 = 0 THEN 2 END
           FROM base WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_totalprice, CAST(vf AS BIGINT) AS valid_from
         FROM rows WHERE vf <= 2 AND (vt IS NULL OR 2 < vt)""",
    "scd_history" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice FROM orders),
         rows AS (
           SELECT o_orderkey, o_totalprice, 0 AS vf,
             CASE WHEN o_orderkey % 7 = 0 THEN 1
                  WHEN o_orderkey % 11 = 0 THEN 2 END AS vt
           FROM base
           UNION ALL
           SELECT o_orderkey, o_totalprice + 1000, 1,
             CASE WHEN o_orderkey % 11 = 0 THEN 2 END
           FROM base WHERE o_orderkey % 7 = 0)
         SELECT o_orderkey, o_totalprice,
           CAST(vf AS BIGINT) AS valid_from,
           CAST(vt AS BIGINT) AS valid_to,
           (vt IS NULL) AS is_current
         FROM rows""",
    "corpus_split_assign" ->
      """SELECT doc_id,
           CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test' END AS split
         FROM (
           SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS h
           FROM documents) t""",
    "corpus_shuffle_shards" ->
      """WITH h AS (
           SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
           FROM documents)
         SELECT doc_id,
                CAST(h % 16 AS INTEGER) AS shard,
                CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS BIGINT) AS pos
         FROM h""",
    "corpus_split_leakage_safe" ->
      (clusterChainSql + """
        , cl AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)
        , lab AS (
          SELECT d.doc_id, coalesce(cl.canonical_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN cl USING (doc_id))
        SELECT doc_id, cluster_id,
          CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test' END AS split
        FROM (
          SELECT doc_id, cluster_id,
            CAST(concat('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS h
          FROM lab) t"""),
    "text_bpe_merges" -> bpeMergesSql,
    "text_bpe_encode" -> bpeEncodeSql,
    "text_familiarity" ->
      (gramsCte + """
        , e AS (SELECT doc_id, unnest(grams) AS gram FROM g)
        , dfc AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY gram)
        SELECT e.doc_id,
          CAST(count(*) AS BIGINT) AS n_grams,
          CAST(sum(dfc.df) AS BIGINT) AS df_sum,
          round(CAST(sum(dfc.df) AS DOUBLE) / count(*), 6) AS fam_avg
        FROM e JOIN dfc USING (gram)
        GROUP BY e.doc_id"""),
    "text_lm_score" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w
                    FROM documents
                    WHERE len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) >= 2),
         bg AS (SELECT doc_id,
                       unnest(list_transform(range(1, len(w)), i -> concat(w[i], ' ', w[i+1]))) AS b
                FROM w),
         pd AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS m FROM bg GROUP BY 1, 2),
         model AS (SELECT b, CAST(sum(m) AS BIGINT) AS cb FROM pd GROUP BY b),
         heads AS (SELECT split_part(b, ' ', 1) AS w1, CAST(sum(cb) AS BIGINT) AS ch
                   FROM model GROUP BY 1),
         voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
                 FROM (SELECT unnest(w) AS tok FROM w) WHERE length(tok) > 0),
         trm AS (SELECT pd.doc_id, pd.m,
                        pd.m * CAST(round(1000.0 * ln(CAST(model.cb + 1 AS DOUBLE) /
                                                      CAST(heads.ch + voc.v AS DOUBLE)), 0)
                                    AS BIGINT) AS term
                 FROM pd JOIN model USING (b)
                         JOIN heads ON heads.w1 = split_part(pd.b, ' ', 1)
                         CROSS JOIN voc),
         agg AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
                        round(CAST(sum(term) AS DOUBLE) / (1000.0 * CAST(sum(m) AS DOUBLE)), 6) AS avg_lp
                 FROM trm GROUP BY doc_id)
         SELECT doc_id, n_bigrams, avg_lp, round(exp(-avg_lp), 4) AS ppl FROM agg""",
    "text_nb_confusion" -> nbConfusionSql,
    "ingest_json_quarantine" -> ingestQuarantineSql,
    "text_ctfidf_terms" ->
      """WITH tk AS (SELECT cls, tok FROM (
             SELECT source AS cls,
                    unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS tok
             FROM documents) WHERE length(tok) > 0),
         ctc AS (SELECT cls, tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2),
         vocab AS (SELECT tok FROM (
             SELECT tok, sum(c) AS g FROM ctc GROUP BY tok
             ORDER BY g DESC, tok ASC LIMIT 256)),
         iv AS (SELECT ctc.* FROM ctc JOIN vocab USING (tok)),
         tcls AS (SELECT cls, CAST(sum(c) AS BIGINT) AS t FROM ctc GROUP BY 1),
         dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cf FROM iv GROUP BY 1),
         ncl AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM tcls),
         sc AS (SELECT iv.cls, iv.tok,
                  CAST(round(1000000.0 * (CAST(iv.c AS DOUBLE) / CAST(tcls.t AS DOUBLE)) *
                             ln(CAST(n.nc + 1 AS DOUBLE) / CAST(dfc.cf AS DOUBLE)), 0) AS BIGINT) AS score_micro
                FROM iv JOIN tcls USING (cls) JOIN dfc USING (tok) CROSS JOIN ncl n),
         rkd AS (SELECT cls, tok, score_micro,
                   row_number() OVER (PARTITION BY cls ORDER BY score_micro DESC, tok ASC) AS rk
                 FROM sc)
         SELECT cls, rk, tok, score_micro FROM rkd WHERE rk <= 5""",
    "text_vocab_topk" ->
      """SELECT token, count(*) AS n FROM (
           SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents) t
         WHERE length(token) > 0
         GROUP BY token ORDER BY n DESC, token LIMIT 50""",
    "text_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
                      FROM documents),
         t2 AS (SELECT doc_id, token FROM tok WHERE length(token) > 0),
         v AS (SELECT token, TRUE AS iv FROM (
                 SELECT token, count(*) AS n FROM t2 GROUP BY 1
                 ORDER BY n DESC, token LIMIT 500)),
         j AS (SELECT t2.doc_id, v.iv FROM t2 LEFT JOIN v USING (token))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                CAST(sum(CASE WHEN iv IS NULL THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
                  AS oov_ppm
         FROM j GROUP BY 1""",
    "text_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), '')) AS ch
                     FROM documents),
         cnt AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM ch GROUP BY 1, 2),
         tot AS (SELECT *, CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM cnt),
         trm AS (SELECT doc_id, n,
                   CAST(round(-(p * ln(p)) / 0.6931471805599453 * 1000000.0) AS BIGINT) AS t_micro
                 FROM (SELECT doc_id, n,
                         CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM tot))
         SELECT doc_id, max(n) AS n_chars_counted,
                CAST(count(*) AS BIGINT) AS n_distinct_chars,
                round(CAST(sum(t_micro) AS DOUBLE) / 1000000.0, 6) AS entropy_bits
         FROM trm GROUP BY doc_id""",
    "stats_bootstrap_ci" -> bootstrapOracleSql(32),
    // growth-accounting twin: lag/lead over distinct user-days + the
    // right-censoring scalar
    "ev_growth_accounting" ->
      """WITH act AS (SELECT DISTINCT user_id AS k, CAST(ts AS DATE) AS day FROM events),
         mx AS (SELECT max(day) AS maxd FROM act),
         x AS (SELECT k, day,
                 lag(day) OVER (PARTITION BY k ORDER BY day) AS prev,
                 lead(day) OVER (PARTITION BY k ORDER BY day) AS nxt
               FROM act)
         SELECT day,
                CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
                CAST(sum(CASE WHEN prev IS NOT NULL AND day - prev <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                CAST(sum(CASE WHEN prev IS NOT NULL AND day - prev > 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
                CAST(sum(CASE WHEN (nxt IS NULL OR nxt - day > 7)
                               AND day <= (SELECT maxd FROM mx) - 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_churning
         FROM x GROUP BY day""",
    // path twin: the session CTE + in-session ordered string_agg
    "ev_path_sessions" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, event_type,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events
         ), y AS (
           SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                          THEN 1 ELSE 0 END AS brk
           FROM x
         ), z AS (
           SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM y
         ), p AS (
           SELECT user_id, session_id,
                  string_agg(event_type, '->' ORDER BY ts, event_id) AS path
           FROM z GROUP BY 1, 2)
         SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         FROM p GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""",
    // robust-scale twin: the manual (n−1)p rank interpolation (the
    // median_by_source discipline — never trust quantile_cont parity)
    "stats_robust_scale" ->
      """WITH v AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v FROM documents),
         r AS (SELECT grp, v,
                 CAST(row_number() OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS rn,
                 CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
               FROM v),
         q AS (SELECT grp,
                 max(CASE WHEN rn = CAST(floor((n-1) * 0.25) AS BIGINT) + 1 THEN v END) AS vlo25,
                 max(CASE WHEN rn = CAST(ceil((n-1) * 0.25) AS BIGINT) + 1 THEN v END) AS vhi25,
                 max(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1 THEN v END) AS vlo50,
                 max(CASE WHEN rn = CAST(ceil((n-1) * 0.5) AS BIGINT) + 1 THEN v END) AS vhi50,
                 max(CASE WHEN rn = CAST(floor((n-1) * 0.75) AS BIGINT) + 1 THEN v END) AS vlo75,
                 max(CASE WHEN rn = CAST(ceil((n-1) * 0.75) AS BIGINT) + 1 THEN v END) AS vhi75,
                 max((n-1) * 0.25) AS p25, max(CAST(floor((n-1) * 0.25) AS BIGINT)) AS l25,
                 max((n-1) * 0.5) AS p50, max(CAST(floor((n-1) * 0.5) AS BIGINT)) AS l50,
                 max((n-1) * 0.75) AS p75, max(CAST(floor((n-1) * 0.75) AS BIGINT)) AS l75
               FROM r GROUP BY grp),
         s AS (SELECT grp,
                 CAST(vlo25 AS DOUBLE) + (CAST(vhi25 AS DOUBLE) - CAST(vlo25 AS DOUBLE)) * (p25 - CAST(l25 AS DOUBLE)) AS q25,
                 CAST(vlo50 AS DOUBLE) + (CAST(vhi50 AS DOUBLE) - CAST(vlo50 AS DOUBLE)) * (p50 - CAST(l50 AS DOUBLE)) AS q50,
                 CAST(vlo75 AS DOUBLE) + (CAST(vhi75 AS DOUBLE) - CAST(vlo75 AS DOUBLE)) * (p75 - CAST(l75 AS DOUBLE)) AS q75
               FROM q)
         SELECT d.source AS grp, d.doc_id AS id, CAST(d.n_chars AS BIGINT) AS v,
                s.q50 AS median, s.q75 - s.q25 AS iqr,
                CASE WHEN s.q75 - s.q25 > 0
                     THEN round((CAST(d.n_chars AS DOUBLE) - s.q50) / (s.q75 - s.q25), 6)
                END AS scaled
         FROM documents d JOIN s ON s.grp = d.source""",
    "stats_cusum_changepoint" ->
      """WITH daily AS (SELECT event_type AS grp, CAST(ts AS DATE) AS day,
                CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS HUGEINT) AS x
              FROM events GROUP BY 1, 2),
         r AS (SELECT *,
                 CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS ndays,
                 CAST(sum(x) OVER (PARTITION BY grp) AS HUGEINT) AS sn
               FROM daily),
         c AS (SELECT *,
                 CAST(sum(x * ndays - sn)
                   OVER (PARTITION BY grp ORDER BY day ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS cw
               FROM r),
         p AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY abs(cw) DESC, day) AS pick
               FROM c)
         SELECT grp, ndays AS n_days, day AS cp_day, CAST(abs(cw) AS BIGINT) AS max_abs_cusum
         FROM p WHERE pick = 1""",
    "text_readability" ->
      """WITH w AS (SELECT doc_id,
                list_filter(regexp_split_to_array(trim(lower(coalesce(text, ''))), '\s+'),
                            x -> length(x) > 0) AS toks,
                coalesce(text, '') AS t
              FROM documents),
         c AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 greatest(CAST(1 AS BIGINT),
                          CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT)) AS n_sentences,
                 CAST(list_sum(list_transform(toks,
                   x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))) AS BIGINT)
                   AS n_syllables
               FROM w WHERE len(toks) > 0)
         SELECT doc_id, n_words, n_sentences, n_syllables,
                round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) +
                      11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) -
                      15.59, 6) AS fk_grade
         FROM c""",
    // seasonal twin: identical epoch_days-mod-7 dow, exact daily totals,
    // one rounded division for the baseline, residual off the rounded value
    "ev_seasonal_baseline" ->
      """WITH daily AS (SELECT event_type AS key, CAST(ts AS DATE) AS day,
                CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS BIGINT)
                  AS day_total
              FROM events GROUP BY 1, 2),
         d2 AS (SELECT *, CAST((day - DATE '1970-01-01') % 7 AS INTEGER) AS dow FROM daily),
         b AS (SELECT key, dow,
                 round(CAST(sum(CAST(day_total AS HUGEINT)) AS DOUBLE) /
                       CAST(count(*) AS DOUBLE), 6) AS baseline
               FROM d2 GROUP BY 1, 2)
         SELECT d.key, d.day, d.dow, d.day_total, b.baseline,
                round(CAST(d.day_total AS DOUBLE) - b.baseline, 6) AS residual
         FROM d2 d JOIN b USING (key, dow)""",
    "corpus_filter" ->
      (profileCte + """
          SELECT doc_id, lang, score, n_tokens FROM scored
          WHERE lang = 'en' AND score >= 0.5 AND n_tokens BETWEEN 5 AND 1000"""),
    "corpus_data_card" ->
      (profileCte + """
          , sp AS (
            SELECT lang, score, n_tokens,
              CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test' END AS split
            FROM (
              SELECT *,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS h
              FROM scored) t)
          SELECT split, lang,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            round(sum(CAST(round(score * 10000) AS BIGINT)) / (count(*) * 10000.0), 6)
              AS mean_score
          FROM sp GROUP BY 1, 2"""),
    // v2 composes the verified-pair chain (gramsCte + banding, verbatim
    // from the dedup oracles) and the decontaminate chain (5-grams off the
    // SAME w CTE) under the v1 profile/split — shared CTEs, no drift
    "corpus_data_card_v2" ->
      (profileCte + gramsCte.replaceFirst("""\s*WITH""", ", ") + sigBandedCandsCte + """
          , ver AS (
            SELECT id_lo, id_hi FROM cands
            JOIN g ga ON ga.doc_id = id_lo
            JOIN g gb ON gb.doc_id = id_hi
            WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                  / len(list_distinct(list_concat(ga.grams, gb.grams))) >= 0.7
          ), dup AS (
            SELECT DISTINCT doc_id FROM (
              SELECT id_lo AS doc_id FROM ver UNION ALL SELECT id_hi AS doc_id FROM ver)
          ), g5 AS (
            SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
              i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))) AS grams5 FROM w
          ), bg AS (SELECT DISTINCT unnest(grams5) AS gram FROM g5 WHERE doc_id % 50 = 0
          ), contam AS (
            SELECT t.doc_id
            FROM (SELECT doc_id, CAST(len(grams5) AS BIGINT) AS n_grams
                  FROM g5 WHERE doc_id % 50 <> 0) t
            LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
                       FROM (SELECT doc_id, unnest(grams5) AS gram
                             FROM g5 WHERE doc_id % 50 <> 0) e
                       JOIN bg USING (gram) GROUP BY doc_id) h ON t.doc_id = h.doc_id
            WHERE coalesce(h.n_hits, 0) * 100 >= t.n_grams * 10
          ), sp AS (
            SELECT s.doc_id, s.lang, s.score, s.n_tokens,
              CASE WHEN h < 800 THEN 'train' WHEN h < 900 THEN 'val' ELSE 'test' END AS split
            FROM (
              SELECT *,
                CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS h
              FROM scored) s)
          SELECT split, lang,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            round(sum(CAST(round(score * 10000) AS BIGINT)) / (count(*) * 10000.0), 6)
              AS mean_score,
            CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
            round(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  / CAST(count(*) AS DOUBLE), 6) AS near_dup_rate,
            CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
            round(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  / CAST(count(*) AS DOUBLE), 6) AS contaminated_frac
          FROM sp LEFT JOIN dup d ON sp.doc_id = d.doc_id
                  LEFT JOIN contam c ON sp.doc_id = c.doc_id
          GROUP BY 1, 2"""),
    "ngram_jaccard" ->
      (gramsCte + """
        SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
          CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) = 0 THEN 0.0
               ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) END AS jac
        FROM g a JOIN g b ON b.doc_id = a.doc_id + 1"""),
    "w4_topk_per_group" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY n_chars DESC, doc_id DESC) AS rn
                    FROM documents)
         SELECT source AS grp, CAST(rn AS INTEGER) AS rank,
                CAST(n_chars AS BIGINT) AS value, doc_id AS id
         FROM r WHERE rn <= 3""",
    // exact operator → the oracle is the direct truth (any-token join +
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
    "graph_triangles" ->
      """WITH tok0 AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
                       FROM documents),
         tok AS (SELECT doc_id, token FROM tok0 WHERE length(token) > 0),
         sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1),
         pair AS (SELECT a.doc_id AS lo, b.doc_id AS hi, CAST(count(*) AS BIGINT) AS inter
                  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         e AS (SELECT lo AS a, hi AS b
               FROM pair JOIN sz sa ON sa.doc_id = lo JOIN sz sb ON sb.doc_id = hi
               WHERE inter * 20 >= 19 * (sa.n + sb.n - inter)),
         deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
                 FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
         tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
                 FROM e e1 JOIN e e2 ON e2.a = e1.b
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         ds AS (SELECT CAST(count(*) AS BIGINT) AS n_vertices,
                       CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
         ec AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
         SELECT ds.n_vertices, ec.n_edges, ds.n_wedges, tri.n_triangles,
                CASE WHEN ds.n_wedges > 0
                     THEN round(3.0 * tri.n_triangles / ds.n_wedges, 6) END AS clustering
         FROM ds, ec, tri""",
    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
         s AS (
           SELECT query_id, cand_id,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CAST(floor(CAST(qv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) *
               CAST(floor(CAST(cv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CAST(floor(CAST(qv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) *
               CAST(floor(CAST(qv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS BIGINT) AS naa,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CAST(floor(CAST(cv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) *
               CAST(floor(CAST(cv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS BIGINT) AS ncc
           FROM c JOIN q ON query_id <> cand_id
         ), scored AS (
           SELECT query_id, cand_id, CAST(dot AS DOUBLE) / sqrt(CAST(naa AS DOUBLE) * CAST(ncc AS DOUBLE)) AS sim
           FROM s
         ), ranked AS (
           SELECT query_id, cand_id, sim,
                  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
           FROM scored
         )
         SELECT query_id, cand_id, rank, sim FROM ranked WHERE rank <= 5""",
    "curation_coreset" -> coresetOracleSql(8),
    // filtered twin: the exact-cosine chain with the metadata predicate
    // applied at the candidate scan (pre-filter semantics)
    "ann_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings WHERE label = 3),
         s AS (
           SELECT query_id, cand_id,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CAST(floor(CAST(qv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) *
               CAST(floor(CAST(cv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CAST(floor(CAST(qv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) *
               CAST(floor(CAST(qv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS BIGINT) AS naa,
             CAST(list_sum(list_transform(range(1, 65), i ->
               CAST(floor(CAST(cv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) *
               CAST(floor(CAST(cv[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT))) AS BIGINT) AS ncc
           FROM c JOIN q ON query_id <> cand_id
         ), scored AS (
           SELECT query_id, cand_id, CAST(dot AS DOUBLE) / sqrt(CAST(naa AS DOUBLE) * CAST(ncc AS DOUBLE)) AS sim
           FROM s
         ), ranked AS (
           SELECT query_id, cand_id, sim,
                  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
           FROM scored
         )
         SELECT query_id, cand_id, rank, sim FROM ranked WHERE rank <= 5""",
    "text_lang_id" ->
      s"""WITH p AS (SELECT doc_id, concat(' ', lower(coalesce(text, '')), ' ') AS p FROM documents),
          sc AS (SELECT doc_id, ${langScoreSqls.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")} FROM p),
          b AS (SELECT *, greatest(${langScoreSqls.map(x => "s_" + x._1).mkString(", ")}) AS best FROM sc)
          SELECT doc_id,
            CASE ${langScoreSqls.map { case (l, _) => s"WHEN s_$l = best AND best > 0 THEN '$l'" }.mkString(" ")}
                 ELSE 'und' END AS lang_pred
          FROM b""",
    "text_lang_stats_native" ->
      s"""WITH p AS (SELECT doc_id, concat(' ', lower(coalesce(text, '')), ' ') AS p FROM documents)
          SELECT doc_id, ${langScoreSqls.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")} FROM p""",
    "text_lang_ngram" ->
      s"""WITH p AS (SELECT doc_id, concat(' ', lower(coalesce(text, '')), ' ') AS p FROM documents),
          sc AS (SELECT doc_id, ${ngramScoreSqls.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")} FROM p),
          b AS (SELECT *, greatest(${ngramScoreSqls.map(x => "s_" + x._1).mkString(", ")}) AS best FROM sc)
          SELECT doc_id,
            CASE ${ngramScoreSqls.map { case (l, _) => s"WHEN s_$l = best AND best > 0 THEN '$l'" }.mkString(" ")}
                 ELSE 'und' END AS lang_pred
          FROM b""",
    "text_quality" ->
      s"""WITH base AS (
            SELECT doc_id,
              concat(' ', lower(coalesce(text, '')), ' ') AS p,
              CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
              CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
              CAST(length(coalesce(text, '')) - length(regexp_replace(coalesce(text, ''), '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct
            FROM documents
          ), scored AS (
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              CASE WHEN n_chars >= 50 AND n_chars <= 5000 THEN 1.0 ELSE 0.0 END AS len_ok,
              CASE WHEN n_tokens > 0 THEN CAST((${TextStats.StopwordLexicons.flatMap(_._2).map(occSql).mkString(" + ")}) AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stop_ratio,
              CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio
            FROM base
          )
          SELECT doc_id, n_tokens,
            round(len_ok * 0.4 + least(stop_ratio * 2.0, 1.0) * 0.4 +
                  CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END, 4) AS score
          FROM scored""",
    "text_length_histogram" ->
      """WITH tok AS (
           SELECT CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
           FROM documents)
         SELECT CAST(least(n_tokens // 10, 20) AS BIGINT) AS bucket,
                count(*) AS n_docs,
                CAST(min(n_tokens) AS BIGINT) AS min_tokens,
                CAST(max(n_tokens) AS BIGINT) AS max_tokens
         FROM tok GROUP BY 1""",
    "text_token_stats" ->
      """SELECT doc_id,
         CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
              ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) END AS n_tokens,
         CAST(len(regexp_extract_all(coalesce(text, ''), '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_subwords
         FROM documents""",
    "text_fingerprint" ->
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS words FROM documents),
          h AS (
            SELECT doc_id, list_transform(words, x -> CAST(
              ${hexval("substr(md5(x), 1, 1)")} * 4096 +
              ${hexval("substr(md5(x), 2, 1)")} * 256 +
              ${hexval("substr(md5(x), 3, 1)")} * 16 +
              ${hexval("substr(md5(x), 4, 1)")} AS BIGINT)) AS hs
            FROM w
          )
          SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), hs), (a, b) -> (a * 131 + b) % 2147483647) AS fp
          FROM h""",
    "mm_payload_meta" ->
      """SELECT doc_id AS asset_id, 'text/plain' AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS digest,
         CAST(strpos('0123456789abcdef', substr(sha256(text), 1, 1)) * 64 AS INTEGER) AS width,
         CAST(strpos('0123456789abcdef', substr(sha256(text), 2, 1)) * 64 AS INTEGER) AS height
         FROM documents""",
    "ev_sessionize" ->
      """WITH x AS (
           SELECT user_id, ts, event_id, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events
         ), y AS (
           SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                          THEN 1 ELSE 0 END AS brk
           FROM x
         ), z AS (
           SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM y
         )
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM z GROUP BY user_id, session_id""",
    "ev_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
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
    "mm_decode_partitioned" ->
      """WITH ch AS (
           SELECT doc_id,
             list_transform(range(1, length(coalesce(text, '')) + 1),
               i -> ascii(substr(text, i, 1))) AS codes
           FROM documents)
         SELECT doc_id AS asset_id, 'text/plain' AS media_type,
           CAST(len(codes) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN len(codes) = 0 THEN 0
                     ELSE (list_sum(codes) % 16 + 1) * 64 END AS INTEGER) AS width,
           CAST(CASE WHEN len(codes) = 0 THEN 0
                     ELSE (list_reduce(list_prepend(CAST(0 AS BIGINT),
                            list_transform(codes, c -> CAST(c % 16 AS BIGINT))),
                            (a, b) -> xor(a, b)) + 1) * 64 END AS INTEGER) AS height
         FROM ch""",
    "mm_decode_real" -> decodeRealOracleSql,
    // sharpness twin: the id-derived pixel formula replayed through the
    // 4-neighbour Laplacian on the interior grid; sums exact integers
    "mm_image_sharpness" ->
      """WITH dims AS (
           SELECT doc_id AS id,
                  CAST(1 + doc_id % 13 AS INTEGER) AS w,
                  CAST(1 + doc_id % 11 AS INTEGER) AS h
           FROM documents),
         lap AS (
           SELECT d.id,
             (4 * ((d.id * 31 + 7 * x.g + 13 * y.g) % 256)
                - ((d.id * 31 + 7 * (x.g - 1) + 13 * y.g) % 256)
                - ((d.id * 31 + 7 * (x.g + 1) + 13 * y.g) % 256)
                - ((d.id * 31 + 7 * x.g + 13 * (y.g - 1)) % 256)
                - ((d.id * 31 + 7 * x.g + 13 * (y.g + 1)) % 256)) AS l
           FROM dims d
           CROSS JOIN generate_series(1, 11) AS x(g)
           CROSS JOIN generate_series(1, 9) AS y(g)
           WHERE x.g <= d.w - 2 AND y.g <= d.h - 2),
         agg AS (SELECT id, CAST(count(*) AS BIGINT) AS n, CAST(sum(l * l) AS BIGINT) AS sq
                 FROM lap GROUP BY id)
         SELECT d.id AS asset_id,
                CASE WHEN d.id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END AS media_type,
                d.w AS width, d.h AS height,
                coalesce(agg.n, 0) AS n_interior,
                coalesce(agg.sq, 0) AS lap_sq_sum,
                CASE WHEN agg.n > 0 THEN round(CAST(agg.sq AS DOUBLE) / CAST(agg.n AS DOUBLE), 6) END
                  AS lap_mean
         FROM dims d LEFT JOIN agg ON agg.id = d.id""",
    // histogram twin: the pixel formula bucketed by p // 32, zero bins out
    "mm_image_histogram" ->
      """WITH dims AS (
           SELECT doc_id AS id,
                  CAST(1 + doc_id % 13 AS INTEGER) AS w,
                  CAST(1 + doc_id % 11 AS INTEGER) AS h
           FROM documents),
         px AS (
           SELECT d.id, ((d.id * 31 + 7 * x.g + 13 * y.g) % 256) AS p
           FROM dims d
           CROSS JOIN generate_series(0, 12) AS x(g)
           CROSS JOIN generate_series(0, 10) AS y(g)
           WHERE x.g < d.w AND y.g < d.h)
         SELECT id AS asset_id, CAST(p // 32 AS INTEGER) AS bin,
                CAST(count(*) AS BIGINT) AS cnt
         FROM px GROUP BY 1, 2""",
    // exposure twin: the id-derived pixel formula over the FULL grid —
    // exact sums, the fixed-order √((n·Σp²−(Σp)²))/n tail, rail counts
    "mm_image_exposure" ->
      """WITH dims AS (
           SELECT doc_id AS id,
                  CAST(1 + doc_id % 13 AS INTEGER) AS w,
                  CAST(1 + doc_id % 11 AS INTEGER) AS h
           FROM documents),
         px AS (
           SELECT d.id, d.w, d.h, ((d.id * 31 + 7 * x.g + 13 * y.g) % 256) AS p
           FROM dims d
           CROSS JOIN generate_series(0, 12) AS x(g)
           CROSS JOIN generate_series(0, 10) AS y(g)
           WHERE x.g < d.w AND y.g < d.h),
         agg AS (SELECT id, w, h, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(p) AS BIGINT) AS s, CAST(sum(p * p) AS BIGINT) AS ss,
                   CAST(sum(CASE WHEN p <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS lo,
                   CAST(sum(CASE WHEN p >= 253 THEN 1 ELSE 0 END) AS BIGINT) AS hi
                 FROM px GROUP BY 1, 2, 3)
         SELECT id AS asset_id,
                CASE WHEN id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END AS media_type,
                w AS width, h AS height, n AS n_px,
                round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_luma,
                round(sqrt(CAST(n * ss - s * s AS DOUBLE)) / CAST(n AS DOUBLE), 6)
                  AS rms_contrast,
                lo AS n_clip_lo, hi AS n_clip_hi
         FROM agg""",
    // silence twin: the id-derived PCM formula with a gaps-and-islands
    // window for the max consecutive silent run the engine scans row-local
    "mm_audio_silence" ->
      """WITH dims AS (
           SELECT doc_id AS id, CAST(100 + doc_id % 200 AS INTEGER) AS n,
                  CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS rate
           FROM documents),
         smp AS (SELECT d.id, d.n, d.rate, i.g AS i,
                   abs((d.id * 31 + 7 * i.g) % 2003 - 1001) AS a
                 FROM dims d CROSS JOIN generate_series(0, 298) AS i(g)
                 WHERE i.g < d.n),
         sil AS (SELECT id, i, i - row_number() OVER (PARTITION BY id ORDER BY i) AS grp
                 FROM smp WHERE a < 100),
         runs AS (SELECT id, CAST(count(*) AS BIGINT) AS run FROM sil GROUP BY id, grp),
         mx AS (SELECT id, max(run) AS max_run FROM runs GROUP BY id),
         agg AS (SELECT id, max(n) AS n, max(rate) AS rate,
                   CAST(sum(CASE WHEN a < 100 THEN 1 ELSE 0 END) AS BIGINT) AS silent,
                   CAST(sum(CASE WHEN a >= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS clipped
                 FROM smp GROUP BY id)
         SELECT a.id AS asset_id, a.rate AS sample_rate, CAST(a.n AS BIGINT) AS n_samples,
                a.silent AS n_silent,
                CAST(a.silent * 1000000 // a.n AS BIGINT) AS silent_ppm,
                coalesce(m.max_run, 0) AS max_silent_run,
                a.clipped AS n_clipped
         FROM agg a LEFT JOIN mx m ON m.id = a.id""",
    "mm_image_dhash" -> dhashOracleSql,
    "mm_image_neardup" -> dhashNearDupOracleSql,
    "mm_audio_fingerprint" -> audioFpOracleSql,
    "mm_audio_neardup" -> audioNearDupOracleSql,
    "mm_decode_jpeg" ->
      """SELECT doc_id AS asset_id,
                'image/jpeg' AS media_type,
                CAST(1 + doc_id % 13 AS INTEGER) AS width,
                CAST(1 + doc_id % 11 AS INTEGER) AS height,
                CAST((1 + doc_id % 13) * (1 + doc_id % 11) * ((doc_id * 31) % 256) AS BIGINT) AS pix_sum
         FROM documents""",
    "mm_frames_real" ->
      """WITH a AS (
           SELECT doc_id AS id,
                  CAST(1 + doc_id % 13 AS INTEGER) AS width,
                  CAST(5 + doc_id % 11 AS INTEGER) AS height,
                  CAST(1 + doc_id % 4 AS INTEGER) AS n_frames
           FROM documents),
         fr AS (
           SELECT id, width, height, n_frames, CAST(unnest(range(0, n_frames)) AS INTEGER) AS f
           FROM a),
         sel AS (SELECT * FROM fr WHERE f % 2 = 0)
         SELECT s.id AS asset_id,
                'image/gif' AS media_type,
                s.f AS frame_idx,
                s.n_frames,
                s.width,
                s.height,
                CAST(sum((s.id * 31 + s.f * 17 + 7 * x.g + 13 * y.g) % 256) AS BIGINT) AS pix_sum
         FROM sel s
         CROSS JOIN generate_series(0, 12) AS x(g)
         CROSS JOIN generate_series(0, 14) AS y(g)
         WHERE x.g < s.width AND y.g < s.height
         GROUP BY 1, 2, 3, 4, 5, 6""",
    // scene-cut replay: frame value (id*31 + f*17) % 256, delta_sum =
    // w*h*|v_f - v_{f-1}|, cut iff |Δv| > 100 (the cross-multiplied form)
    "mm_video_scene_cuts" ->
      """WITH a AS (
           SELECT doc_id AS id,
                  CAST(1 + doc_id % 13 AS INTEGER) AS width,
                  CAST(1 + doc_id % 11 AS INTEGER) AS height,
                  CAST(1 + doc_id % 3 AS INTEGER) AS n_frames
           FROM documents),
         fr AS (
           SELECT id, width, height, CAST(unnest(range(0, n_frames)) AS INTEGER) AS f
           FROM a),
         fv AS (SELECT id, width, height, f, (id * 31 + f * 17) % 256 AS v FROM fr),
         d AS (
           SELECT id, width, height, f, v,
                  lag(v) OVER (PARTITION BY id ORDER BY f) AS pv
           FROM fv)
         SELECT id AS asset_id, f AS frame_idx,
                CAST(width * height * abs(v - pv) AS BIGINT) AS delta_sum,
                abs(v - pv) > 100 AS is_cut
         FROM d WHERE pv IS NOT NULL""",
    "mm_video_frames" ->
      """WITH a AS (
           SELECT doc_id AS id,
                  CAST(1 + doc_id % 13 AS INTEGER) AS width,
                  CAST(1 + doc_id % 11 AS INTEGER) AS height,
                  CAST(1 + doc_id % 3 AS INTEGER) AS n_frames
           FROM documents),
         fr AS (
           SELECT id, width, height, n_frames, CAST(unnest(range(0, n_frames)) AS INTEGER) AS f
           FROM a)
         SELECT id AS asset_id,
                'video/x-msvideo' AS media_type,
                f AS frame_idx,
                n_frames,
                width,
                height,
                CAST(width * height * ((id * 31 + f * 17) % 256) AS BIGINT) AS pix_sum
         FROM fr
         WHERE f % 2 = 0""",
    "mm_decode_audio" ->
      """WITH a AS (
           SELECT doc_id AS id, CAST(100 + doc_id % 200 AS BIGINT) AS n
           FROM documents)
         SELECT a.id AS asset_id,
                'audio/wav' AS media_type,
                CAST(CASE WHEN a.id % 2 = 0 THEN 8000 ELSE 16000 END AS INTEGER) AS sample_rate,
                CAST(1 AS INTEGER) AS channels,
                CAST(16 AS INTEGER) AS bits,
                a.n AS n_samples,
                CAST(sum((a.id * 31 + 7 * i.g) % 2003 - 1001) AS BIGINT) AS amp_sum
         FROM a
         CROSS JOIN generate_series(0, 298) AS i(g)
         WHERE i.g < a.n
         GROUP BY 1, 2, 3, 4, 5, 6""",
    "mm_audio_features" ->
      """WITH a AS (
           SELECT doc_id AS id, CAST(100 + doc_id % 200 AS BIGINT) AS n
           FROM documents),
         s AS (
           SELECT a.id, i.g AS i,
                  (a.id * 31 + 7 * i.g) % 2003 - 1001 AS v,
                  i.g // 50 AS f
           FROM a CROSS JOIN generate_series(0, 298) AS i(g)
           WHERE i.g < a.n),
         w AS (
           SELECT id, i, v, f,
                  lag(v) OVER (PARTITION BY id ORDER BY i) AS pv
           FROM s)
         SELECT id AS asset_id,
                CAST(f AS INTEGER) AS frame_idx,
                CAST(count(*) AS BIGINT) AS n_samples,
                CAST(sum(v * v) AS BIGINT) AS energy,
                CAST(sum(CASE WHEN i % 50 > 0 AND pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS zero_crossings
         FROM w GROUP BY 1, 2""",
    "mm_resize_real" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(1 + doc_id % 13 AS BIGINT) AS w,
                  CAST(1 + doc_id % 11 AS BIGINT) AS h
           FROM documents),
         t AS (
           SELECT doc_id, w, h,
                  CASE WHEN w <= 8 AND h <= 8 THEN w
                       ELSE greatest(1, (w * 8) // greatest(w, h)) END AS tw,
                  CASE WHEN w <= 8 AND h <= 8 THEN h
                       ELSE greatest(1, (h * 8) // greatest(w, h)) END AS th
           FROM dims)
         SELECT t.doc_id AS asset_id,
                CASE WHEN t.doc_id % 2 = 0 THEN 'image/png' ELSE 'image/bmp' END AS media_type,
                CAST(t.tw AS INTEGER) AS width,
                CAST(t.th AS INTEGER) AS height,
                CAST(sum((t.doc_id * 31
                          + 7 * ((x.g * t.w) // t.tw)
                          + 13 * ((y.g * t.h) // t.th)) % 256) AS BIGINT) AS pix_sum
         FROM t
         CROSS JOIN generate_series(0, 12) AS x(g)
         CROSS JOIN generate_series(0, 10) AS y(g)
         WHERE x.g < t.tw AND y.g < t.th
         GROUP BY 1, 2, 3, 4""",
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
    "dedup_semantic_incremental" ->
      (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , av AS (
          SELECT a.cell, a.vec_id, z.q FROM assign a JOIN qz z USING (vec_id)
        ), sprs AS (
          SELECT x.vec_id AS new_id, y.vec_id AS corpus_id,
                 round(${cosSql("x.q", "y.q")}, 6) AS sim
          FROM av x JOIN av y
            ON x.cell = y.cell AND x.vec_id % 5 = 0 AND y.vec_id % 5 <> 0
        )
        SELECT new_id, corpus_id, sim FROM sprs WHERE sim >= 0.42"""),
    "ann_lsh_topk" ->
      (qzCte + s"""
        , bkt AS (
${(0 until 4).map(t => s"          SELECT vec_id, q, $t AS tbl, ${srpBucketSql(6, t * 6)} AS bucket FROM qz").mkString("\n          UNION ALL\n")}
        ), probes AS (
          SELECT vec_id AS query_id, tbl,
                 unnest(list_distinct([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
                                       xor(bucket, 8), xor(bucket, 16), xor(bucket, 32)])) AS bucket
          FROM bkt WHERE vec_id < 10
        ), cand AS (
          SELECT DISTINCT p.query_id, c.vec_id AS cand_id
          FROM probes p JOIN bkt c ON c.tbl = p.tbl AND c.bucket = p.bucket
          WHERE c.vec_id <> p.query_id
        ), scored AS (
          SELECT u.query_id, u.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM cand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        ), ranked AS (
          SELECT query_id, cand_id, sim,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, cand_id, rank, round(sim, 6) AS sim FROM ranked WHERE rank <= 5"""),
    // radius-search twin: the ann_lsh_topk candidate chain verbatim, then
    // the exact integer threshold instead of a rank cut (HUGEINT cross-
    // products; tau = 8/10 → d²·100 ≥ qq·cc·64)
    "ann_range_search" ->
      (qzCte + s"""
        , bkt AS (
${(0 until 4).map(t => s"          SELECT vec_id, q, $t AS tbl, ${srpBucketSql(6, t * 6)} AS bucket FROM qz").mkString("\n          UNION ALL\n")}
        ), probes AS (
          SELECT vec_id AS query_id, tbl,
                 unnest(list_distinct([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
                                       xor(bucket, 8), xor(bucket, 16), xor(bucket, 32)])) AS bucket
          FROM bkt WHERE vec_id < 10
        ), cand AS (
          SELECT DISTINCT p.query_id, c.vec_id AS cand_id
          FROM probes p JOIN bkt c ON c.tbl = p.tbl AND c.bucket = p.bucket
          WHERE c.vec_id <> p.query_id
        ), scored AS (
          SELECT u.query_id, u.cand_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> qa.q[i] * qb.q[i])) AS HUGEINT) AS d,
                 CAST(list_sum(list_transform(range(1, 65), i -> qa.q[i] * qa.q[i])) AS HUGEINT) AS qq,
                 CAST(list_sum(list_transform(range(1, 65), i -> qb.q[i] * qb.q[i])) AS HUGEINT) AS cc
          FROM cand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        )
        SELECT query_id, cand_id,
               round(CAST(d AS DOUBLE) / (sqrt(CAST(qq AS DOUBLE)) * sqrt(CAST(cc AS DOUBLE))), 6) AS sim
        FROM scored
        WHERE d >= 0 AND d * d * 100 >= qq * cc * 9"""),
    // RRF fusion twin: both depth-20 ranker chains replayed (IVF 16/4 with
    // i-prefixed CTEs, 4-table SRP-LSH with l-prefixed CTEs), then the
    // rank-only reciprocal sum — 1.0/(60 + rank) is one IEEE division per
    // term, bit-identical across engines
    "ann_rrf_hybrid" ->
      (qzCte + s"""
        , icent AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, q AS cq
          FROM (SELECT vec_id, q FROM qz ORDER BY vec_id LIMIT 16)
        ), icdist AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, 65), i -> (z.q[i] - c.cq[i]) * (z.q[i] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN icent c
        ), iassign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM icdist) WHERE rn = 1
        ), iqprobe AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM icdist WHERE vec_id < 10) WHERE rn <= 4
        ), icand AS (
          SELECT DISTINCT p.query_id, a.vec_id AS cand_id
          FROM iqprobe p JOIN iassign a ON a.cell = p.cell
          WHERE a.vec_id <> p.query_id
        ), iscored AS (
          SELECT u.query_id, u.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM icand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        ), iranked AS (
          SELECT query_id, cand_id,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
          FROM iscored
        ), lbkt AS (
${(0 until 4).map(t => s"          SELECT vec_id, q, $t AS tbl, ${srpBucketSql(6, t * 6)} AS bucket FROM qz").mkString("\n          UNION ALL\n")}
        ), lprobes AS (
          SELECT vec_id AS query_id, tbl,
                 unnest(list_distinct([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
                                       xor(bucket, 8), xor(bucket, 16), xor(bucket, 32)])) AS bucket
          FROM lbkt WHERE vec_id < 10
        ), lcand AS (
          SELECT DISTINCT p.query_id, c.vec_id AS cand_id
          FROM lprobes p JOIN lbkt c ON c.tbl = p.tbl AND c.bucket = p.bucket
          WHERE c.vec_id <> p.query_id
        ), lscored AS (
          SELECT u.query_id, u.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM lcand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        ), lranked AS (
          SELECT query_id, cand_id,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
          FROM lscored
        ), fused AS (
          SELECT COALESCE(i.query_id, l.query_id) AS query_id,
                 COALESCE(i.cand_id, l.cand_id) AS cand_id,
                 COALESCE(1.0 / (60 + i.rank), 0) + COALESCE(1.0 / (60 + l.rank), 0) AS rrf
          FROM (SELECT * FROM iranked WHERE rank <= 5) i
          FULL OUTER JOIN (SELECT * FROM lranked WHERE rank <= 5) l
            ON i.query_id = l.query_id AND i.cand_id = l.cand_id
        ), rr AS (
          SELECT query_id, cand_id, rrf,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, cand_id) AS INTEGER) AS rank
          FROM fused
        )
        SELECT query_id, cand_id, rank, round(rrf, 6) AS rrf FROM rr WHERE rank <= 5"""),
    // cluster-balanced curation twin: the trained-quantizer assignment is
    // ivfKmeansCtesSql's `assign` verbatim; the per-cell keep gate is the
    // md5 hash order with id tie-break
    "curation_cluster_balance" ->
      (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , rk AS (
          SELECT a.cell, a.vec_id,
                 CAST(row_number() OVER (PARTITION BY a.cell
                   ORDER BY CAST(concat('0x', substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000,
                            a.vec_id) AS INTEGER) AS rk
          FROM assign a
        )
        SELECT cell, vec_id, rk FROM rk WHERE rk <= 20"""),
    // embedding-outlier twin: trained-quantizer distances are
    // ivfKmeansCtesSql's `cdist` verbatim; assigned distance = per-vector
    // min (first-cell tie rule), threshold = type-1 order statistic at
    // rank ceil(9n/10) per cell, strict > flags (cut ties stay inliers)
    "curation_emb_outliers" ->
      (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , ad AS (
          SELECT vec_id, cell, d FROM (
            SELECT vec_id, cell, d, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM cdist) WHERE rn = 1
        ), rkd AS (
          SELECT cell, vec_id, d,
                 row_number() OVER (PARTITION BY cell ORDER BY d) AS rk,
                 count(*) OVER (PARTITION BY cell) AS n
          FROM ad
        ), thr AS (
          SELECT cell, d AS thr FROM rkd WHERE rk = CAST((9 * n + 9) // 10 AS BIGINT)
        )
        SELECT a.cell, a.vec_id, CAST(a.d AS BIGINT) AS d2, a.d > t.thr AS is_outlier
        FROM ad a JOIN thr t ON a.cell = t.cell"""),
    "ann_ivf_topk" ->
      (qzCte + s"""
        , cent AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell, q AS cq
          FROM (SELECT vec_id, q FROM qz ORDER BY vec_id LIMIT 16)
        ), cdist AS (
          SELECT z.vec_id, c.cell,
                 list_sum(list_transform(range(1, 65), i -> (z.q[i] - c.cq[i]) * (z.q[i] - c.cq[i]))) AS d
          FROM qz z CROSS JOIN cent c
        ), assign AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM cdist) WHERE rn = 1
        ), qprobe AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
            FROM cdist WHERE vec_id < 10) WHERE rn <= 4
        ), cand AS (
          SELECT DISTINCT p.query_id, a.vec_id AS cand_id
          FROM qprobe p JOIN assign a ON a.cell = p.cell
          WHERE a.vec_id <> p.query_id
        ), scored AS (
          SELECT u.query_id, u.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM cand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        ), ranked AS (
          SELECT query_id, cand_id, sim,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, cand_id, rank, round(sim, 6) AS sim FROM ranked WHERE rank <= 5"""),
    "ann_pq_topk" -> pqAdcSql,
    "ann_pq_rerank" -> pqRerankSql,
    "ann_ivf_kmeans" -> (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , cand AS (
          SELECT DISTINCT p.query_id, a.vec_id AS cand_id
          FROM qprobe p JOIN assign a ON a.cell = p.cell
          WHERE a.vec_id <> p.query_id
        ), scored AS (
          SELECT u.query_id, u.cand_id, ${cosSql("qa.q", "qb.q")} AS sim
          FROM cand u
          JOIN qz qa ON qa.vec_id = u.query_id
          JOIN qz qb ON qb.vec_id = u.cand_id
        ), ranked AS (
          SELECT query_id, cand_id, sim,
                 CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
          FROM scored
        )
        SELECT query_id, cand_id, rank, round(sim, 6) AS sim FROM ranked WHERE rank <= 5"""),
    "ann_ivfpq_topk" -> ivfPqSql,
    "ann_index_scored" -> annIndexScoredSql,
    "ann_recall_audit" -> recallAuditSql,
    "mm_frame_sample" ->
      """WITH a AS (
           SELECT doc_id AS asset_id,
                  CAST(floor(octet_length(encode(text)) / 64) AS INTEGER) AS n
           FROM documents)
         SELECT asset_id,
                CAST(f // 2 AS INTEGER) AS sample_idx,
                CAST(f AS INTEGER) AS frame_idx,
                CAST(f * 64 AS INTEGER) AS byte_start,
                CAST(64 AS INTEGER) AS byte_len
         FROM a, unnest(range(0, n)) t(f)
         WHERE f % 2 = 0""",
    "ev_sliding" ->
      """WITH half AS (
           SELECT event_type,
             to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) AS w0
           FROM events
         ), windows AS (
           SELECT event_type, unnest([w0, w0 - INTERVAL 30 MINUTE]) AS window_start
           FROM half
         )
         SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS n
         FROM windows GROUP BY 1, 2""",
    "curate_pack_sequences" ->
      // budget 512 is a power of two, so floor((cum - n)/512.0) is an exact
      // binary division in both engines (the packSequences contract)
      """WITH d AS (
           SELECT doc_id, doc_id % 8 AS salt,
             CAST(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
           FROM documents
         ), c AS (
           SELECT doc_id, salt, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY salt ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           FROM d
         ), p AS (
           SELECT doc_id, n_tokens, cum_tokens,
             salt * 1099511627776 + CAST(floor((cum_tokens - n_tokens) / 512.0) AS BIGINT) AS pack_id
           FROM c
         )
         SELECT doc_id, n_tokens, cum_tokens, pack_id,
           CAST(row_number() OVER (PARTITION BY pack_id ORDER BY doc_id) AS BIGINT) AS pack_pos
         FROM p""",
    // greedy replay of the two-phase selection: one running token sum in
    // (quantized score desc, id) order, selected iff the inclusive total fits
    "curation_token_budget" ->
      s"""WITH base AS (
            SELECT doc_id,
              concat(' ', lower(coalesce(text, '')), ' ') AS p,
              CAST(length(coalesce(text, '')) AS DOUBLE) AS n_chars,
              CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
              CAST(length(coalesce(text, '')) - length(regexp_replace(coalesce(text, ''), '[.,;:!?]', '', 'g')) AS DOUBLE) AS punct
            FROM documents
          ), scored AS (
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
              CASE WHEN n_chars >= 50 AND n_chars <= 5000 THEN 1.0 ELSE 0.0 END AS len_ok,
              CASE WHEN n_tokens > 0 THEN CAST((${TextStats.StopwordLexicons.flatMap(_._2).map(occSql).mkString(" + ")}) AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stop_ratio,
              CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0.0 END AS punct_ratio
            FROM base
          ), q AS (
            SELECT doc_id, n_tokens,
              round(len_ok * 0.4 + least(stop_ratio * 2.0, 1.0) * 0.4 +
                    CASE WHEN punct_ratio <= 0.1 THEN 0.2 ELSE 0.0 END, 4) AS score
            FROM scored
          ), s AS (
            SELECT doc_id AS id, CAST(round(score * 10000, 0) AS BIGINT) AS score, n_tokens FROM q
          ), r AS (
            SELECT id, score, n_tokens,
              CAST(sum(n_tokens) OVER (ORDER BY score DESC, id) AS BIGINT) AS cum FROM s
          )
          SELECT id, score, n_tokens, cum <= 50000 AS selected FROM r""",
    "curation_dsir_scores" -> dsirScoresSql,
    "curation_dsir_select" ->
      (dsirCtesSql + """
         , sc AS (
           SELECT tb.doc_id, CAST(sum(wt.w) AS BIGINT) AS score
           FROM tb JOIN wt USING (bucket) GROUP BY tb.doc_id
         )
         SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 100"""),
    "text_pii_scrub" ->
      s"""WITH aug AS (
            SELECT doc_id,
              CASE WHEN doc_id % 7 = 0
                     THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com')
                   WHEN doc_id % 13 = 0
                     THEN concat(text, ' call 312-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                   ELSE text END AS text
            FROM documents
          )
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '${TextStats.EmailRe}')) AS BIGINT) AS n_emails,
            CAST(len(regexp_extract_all(text, '${TextStats.PhoneRe}')) AS BIGINT) AS n_phones,
            regexp_replace(regexp_replace(text, '${TextStats.EmailRe}', '<EMAIL>', 'g'),
                           '${TextStats.PhoneRe}', '<PHONE>', 'g') AS scrubbed
          FROM aug""",
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w FROM documents),
         m AS (
           SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
             CAST(greatest(len(w) - 1, 0) AS BIGINT) AS nb,
             list_transform(range(1, CAST(greatest(len(w) - 1, 0) AS INTEGER) + 1),
               i -> concat_ws(' ', w[i], w[i+1])) AS bg,
             list_aggregate(list_transform(list_distinct(w), u -> len(list_filter(w, x -> x = u))), 'max') AS topn
           FROM w
         )
         SELECT doc_id, n_words, n_uniq,
           round(CASE WHEN n_words = 0 THEN 0.0
                 ELSE CAST(n_words - n_uniq AS DOUBLE) / n_words END, 6) AS dup_word_frac,
           round(CASE WHEN nb = 0 THEN 0.0
                 ELSE CAST(nb - len(list_distinct(bg)) AS DOUBLE) / nb END, 6) AS dup_bigram_frac,
           round(CASE WHEN n_words = 0 THEN 0.0
                 ELSE CAST(topn AS DOUBLE) / n_words END, 6) AS top_word_share
         FROM m""",
    "sketch_distinct_kmv" ->
      """WITH tok AS (
           SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM documents
         ), tok2 AS (SELECT t FROM tok WHERE length(t) > 0),
         h AS (SELECT DISTINCT CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) AS h FROM tok2),
         kmin AS (SELECT h FROM h ORDER BY h LIMIT 16),
         agg AS (SELECT max(h) AS kth_min, CAST(count(*) AS BIGINT) AS k_actual FROM kmin)
         SELECT CAST(16 AS BIGINT) AS k, k_actual, kth_min,
           CASE WHEN k_actual < 16 THEN k_actual ELSE (15 * 4294967296) // kth_min END AS est_distinct
         FROM agg""",
    "sketch_kmv_setops" ->
      """WITH ha AS (SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
                     FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'),
         kha AS (SELECT h FROM ha ORDER BY h LIMIT 64),
         hb AS (SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
                FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'),
         khb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
         u AS (SELECT DISTINCT h FROM (SELECT h FROM kha UNION ALL SELECT h FROM khb) ORDER BY h LIMIT 64),
         agg AS (SELECT max(h) AS kth_min, CAST(count(*) AS BIGINT) AS k_actual,
                        CAST(sum(CASE WHEN h IN (SELECT h FROM kha) AND h IN (SELECT h FROM khb)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS overlap
                 FROM u),
         est AS (SELECT k_actual, kth_min, overlap,
                        CASE WHEN k_actual < 64 THEN k_actual
                             ELSE (63 * 4294967296) // kth_min END AS est_union
                 FROM agg)
         SELECT CAST(64 AS BIGINT) AS k, k_actual, kth_min, est_union, overlap,
                (overlap * est_union) // k_actual AS est_intersect,
                (overlap * 10000) // k_actual AS jaccard_bp
         FROM est""",
    // per-row unrolled bit interleave — (l_orderkey, l_linenumber) is NOT
    // unique in the fixture, so a generate_series+GROUP BY would collapse rows
    "layout_zorder" ->
      s"""SELECT l_orderkey, l_linenumber,
                 CAST(${(0 until 15)
        .map(i => s"(((l_partkey >> $i) & 1) << ${2 * i}) + (((l_suppkey >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")} AS BIGINT) AS zval
         FROM lineitem""",
    // compaction is content-preserving by contract: the compacted layout
    // must read back as exactly the source table, row for row
    "layout_compact" -> "SELECT * FROM orders",
    "layout_skipping_scan" ->
      """SELECT * FROM orders
         WHERE o_orderkey >= 1
           AND o_orderkey <= (SELECT max(o_orderkey) FROM orders) // 10""",
    "layout_point_lookup" ->
      "SELECT * FROM orders WHERE o_orderkey IN (1, 2, 3, 5, 7)",
    "layout_manifest_maintain" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM orders""",
    "layout_zorder_skip" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM lineitem
         WHERE l_partkey >= 1
           AND l_partkey <= (SELECT max(l_partkey) FROM lineitem) // 20""",
    "corpus_decontaminate" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         g5 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))) AS grams FROM w),
         bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g5 WHERE doc_id % 50 = 0),
         tr AS (SELECT doc_id, grams FROM g5 WHERE doc_id % 50 <> 0),
         tot AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM tr),
         hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
                 FROM (SELECT doc_id, unnest(grams) AS gram FROM tr) e JOIN bg USING (gram)
                 GROUP BY doc_id)
         SELECT t.doc_id, t.n_grams, coalesce(h.n_hits, 0) AS n_hits,
                (coalesce(h.n_hits, 0) * 100 >= t.n_grams * 10) AS contaminated
         FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id""",
    "curate_chunk_windows" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         x AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, w FROM w),
         o AS (SELECT doc_id, n_words, w, unnest(range(0, CAST(n_words AS INTEGER), 25)) AS off FROM x)
         SELECT doc_id, n_words,
                CAST(off // 25 AS INTEGER) AS chunk_idx,
                CAST(off AS INTEGER) AS off,
                array_to_string(w[off + 1 : off + 50], ' ') AS chunk,
                CAST(len(w[off + 1 : off + 50]) AS INTEGER) AS n_chunk_tokens
         FROM o""",
    // longest-suffix election replay: same PSL dimension (VALUES), same
    // suffix explode + max(i) + slice arithmetic as Web.registrableDomains
    "curate_url_domain" ->
      """WITH psl AS (SELECT * FROM (VALUES ('com'),('net'),('org'),('uk'),('co.uk'),('ac.uk'),
                  ('au'),('com.au'),('jp'),('co.jp'),('io'),('gov')) t(suffix)),
         base AS (SELECT doc_id AS id, lower(CASE CAST(doc_id % 6 AS INTEGER)
           WHEN 0 THEN 'deep.sub.' || CAST(doc_id % 7 AS VARCHAR) || '.shop' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
           WHEN 1 THEN 'site' || CAST(doc_id % 5 AS VARCHAR) || '.COM'
           WHEN 2 THEN 'a.site' || CAST(doc_id % 5 AS VARCHAR) || '.ac.uk'
           WHEN 3 THEN 'node' || CAST(doc_id % 5 AS VARCHAR) || '.example.zz'
           WHEN 4 THEN 'co.uk'
           ELSE 'img' || CAST(doc_id % 3 AS VARCHAR) || '.cdn' || CAST(doc_id % 5 AS VARCHAR) || '.com.au' END) AS host
          FROM documents),
         parts AS (SELECT id, host, string_split(host, '.') AS ls FROM base),
         c2 AS (SELECT id, unnest(range(1, len(ls) + 1)) AS i,
                  array_to_string(ls[-unnest(range(1, len(ls) + 1)):], '.') AS cand FROM parts),
         best AS (SELECT c2.id, max(c2.i) AS ns FROM c2 JOIN psl ON c2.cand = psl.suffix GROUP BY 1)
         SELECT p.id, p.host,
           CASE WHEN regexp_matches(p.host, '^\[') OR regexp_matches(p.host, '^[0-9.]+$') THEN NULL
                WHEN b.ns IS NULL THEN
                  CASE WHEN len(p.ls) >= 2 THEN p.ls[-2] || '.' || p.ls[-1] ELSE p.host END
                WHEN len(p.ls) <= b.ns THEN NULL
                ELSE array_to_string(p.ls[-(CAST(b.ns AS INTEGER)+1):], '.') END AS domain
         FROM parts p LEFT JOIN best b USING (id)""",
    // full normalization replay: same regexes, same param filter+sort,
    // same default-port/trailing-slash/www rules as Web.normalizeUrl
    "curate_url_canon" ->
      """WITH raw AS (
           SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
             (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
             'Site' || CAST(doc_id % 5 AS VARCHAR) || '.COM' ||
             (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END) ||
             '/Docs/' || CAST(doc_id % 50 AS VARCHAR) ||
             (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
             '?utm_source=feed&b=' || CAST(doc_id % 7 AS VARCHAR) || '&a=1' ||
             (CASE WHEN doc_id % 5 = 0 THEN '#sec' || CAST(doc_id AS VARCHAR) ELSE '' END) AS url
           FROM documents),
         parts AS (
           SELECT doc_id,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
             regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
             regexp_extract(url, '\?([^#]*)', 1) AS q
           FROM raw),
         p2 AS (
           SELECT doc_id, scheme,
             regexp_replace(regexp_extract(hostport, '^([^:]*)', 1), '^www\.', '') AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
                  ELSE regexp_replace(rawpath, '/+$', '') END AS path,
             list_sort(list_filter(string_split(q, '&'),
               p -> p <> '' AND NOT regexp_matches(p, '^utm_'))) AS kept
           FROM parts),
         norm AS (
           SELECT doc_id,
             scheme || '://' || host ||
             (CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
                        AND NOT (scheme = 'http' AND port = '80')
                   THEN ':' || port ELSE '' END) ||
             path ||
             (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END) AS url_norm,
             CASE WHEN len(string_split(host, '.')) >= 2
                  THEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
                  ELSE host END AS domain
           FROM p2)
         SELECT doc_id AS id, url_norm, domain,
                min(doc_id) OVER (PARTITION BY url_norm) AS canonical_id
         FROM norm""",
    "text_dup_span_frac" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
         g5 AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(w) - 4, 1) + 1),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))) AS grams FROM w),
         e AS (SELECT doc_id, unnest(grams) AS gram FROM g5),
         d AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df FROM e)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS dup_frac
         FROM d GROUP BY doc_id""",
    "ev_asof_join" -> evAsofJoinSql,
    "ev_asof_forward" ->
      """WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         p0 AS (SELECT user_id, ts, value,
                  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'purchase'),
         p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
         SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
                epoch_us(p.ts) AS purchase_us, p.value AS purchase_value
         FROM clicks c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts""",
    // nearest twin: backward + forward DuckDB ASOF joins combined with the
    // same strict-< forward pick and backward tie rule the engine applies
    "ev_asof_nearest" -> evAsofNearestSql,
    "ev_range_join" ->
      """WITH anchors AS (SELECT event_id AS anchor_id, user_id, ts AS a_ts FROM events WHERE event_type = 'error'),
         near AS (
           SELECT a.anchor_id, count(*) AS n_nearby, sum(CAST(e.value AS DECIMAL(18,2))) AS sv
           FROM anchors a JOIN events e
             ON e.user_id = a.user_id AND e.event_id <> a.anchor_id
            AND abs(epoch_us(e.ts) - epoch_us(a.a_ts)) <= 1800000000
           GROUP BY 1)
         SELECT a.anchor_id, a.user_id, epoch_us(a.a_ts) AS ts_us,
                coalesce(n.n_nearby, 0) AS n_nearby,
                CAST(coalesce(n.sv, 0) AS DOUBLE) AS total_value
         FROM anchors a LEFT JOIN near n USING (anchor_id)""",
    "stats_quantiles" ->
      """WITH v AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents),
         r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
         p AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                              CAST(0.75 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p),
         k AS (SELECT p, (n - 1) * p AS pos,
                      CAST(floor((n - 1) * p) AS BIGINT) AS lo,
                      CAST(ceil((n - 1) * p) AS BIGINT) AS hi
               FROM p, c)
         SELECT k.p,
                CAST(a.v AS DOUBLE) + (CAST(b.v AS DOUBLE) - CAST(a.v AS DOUBLE)) * (k.pos - CAST(k.lo AS DOUBLE)) AS q
         FROM k JOIN r a ON a.rn = k.lo + 1 JOIN r b ON b.rn = k.hi + 1""",
    "stats_deciles" ->
      """WITH v AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents
                    WHERE n_chars IS NOT NULL),
         r AS (SELECT v AS sv, row_number() OVER (ORDER BY v) AS rn FROM v),
         c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
         p AS (SELECT unnest([CAST(0.1 AS DOUBLE), CAST(0.2 AS DOUBLE), CAST(0.3 AS DOUBLE),
                              CAST(0.4 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(0.6 AS DOUBLE),
                              CAST(0.7 AS DOUBLE), CAST(0.8 AS DOUBLE), CAST(0.9 AS DOUBLE)]) AS p),
         k AS (SELECT p, (n - 1) * p AS pos,
                      CAST(floor((n - 1) * p) AS BIGINT) AS lo,
                      CAST(ceil((n - 1) * p) AS BIGINT) AS hi
               FROM p, c),
         cuts AS (
           SELECT CAST(a.sv AS DOUBLE) +
                  (CAST(b.sv AS DOUBLE) - CAST(a.sv AS DOUBLE)) * (k.pos - CAST(k.lo AS DOUBLE)) AS q
           FROM k JOIN r a ON a.rn = k.lo + 1 JOIN r b ON b.rn = k.hi + 1)
         SELECT v.doc_id, v.v,
                CAST(1 + sum(CASE WHEN CAST(v.v AS DOUBLE) > cu.q THEN 1 ELSE 0 END) AS INTEGER)
                  AS q_bucket
         FROM v CROSS JOIN cuts cu
         GROUP BY 1, 2""",
    "text_nfc_normalize" ->
      """SELECT doc_id,
                CAST(length(t) AS INTEGER) AS len_raw,
                CAST(length(nfc_normalize(t)) AS INTEGER) AS len_nfc,
                md5(nfc_normalize(t)) AS h
         FROM (SELECT doc_id,
                      text || ' cafe' || chr(769) || ' ' || chr(65) || chr(778) AS t
               FROM documents)""",
    "stats_outliers" ->
      """WITH m AS (
           SELECT source,
                  CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(n_chars) AS HUGEINT) AS s,
                  CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS ss
           FROM documents GROUP BY source)
         SELECT d.source AS grp, d.doc_id AS id, CAST(d.n_chars AS BIGINT) AS x,
                ((m.n * d.n_chars - m.s) * (m.n * d.n_chars - m.s)) > 9 * (m.n * m.ss - m.s * m.s) AS is_outlier
         FROM documents d JOIN m USING (source)""",
    // doubled-integer median/MAD: quantile_cont on even ints is integral,
    // so the CASTs are exact and the flag is pure Long arithmetic
    "stats_mad_outliers" ->
      """WITH v AS (SELECT event_id AS id, CAST(floor(value * 100) AS BIGINT) AS x
                    FROM events WHERE value IS NOT NULL),
         m AS (SELECT CAST(quantile_cont(2 * x, 0.5) AS BIGINT) AS med2 FROM v),
         d AS (SELECT v.id, v.x, 2 * abs(2 * v.x - m.med2) AS dev4, m.med2 FROM v, m),
         mm AS (SELECT CAST(quantile_cont(dev4, 0.5) AS BIGINT) AS mad4 FROM d)
         SELECT d.id, d.x, d.dev4, d.med2, mm.mad4,
                d.dev4 > 3 * mm.mad4 AS is_outlier
         FROM d, mm""",
    // the heavy-hitter gate is exact (count-min only overestimates), so
    // the oracle is the plain threshold truth — no sketch replay needed
    "text_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS item FROM documents),
         tok2 AS (SELECT item FROM tok WHERE length(item) > 0)
         SELECT item AS token, CAST(count(*) AS BIGINT) AS cnt
         FROM tok2 GROUP BY 1 HAVING count(*) >= 500""",
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
    // containment twin: the shared 3-gram CTE + all-shared-gram pair
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
    // blocking-quality twin: the fuzzy-pair CTEs verbatim + stratum
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
    "ev_cumulative_uniques" ->
      """WITH ev AS (SELECT user_id AS k, CAST(ts AS DATE) AS day FROM events),
         act AS (SELECT day, CAST(count(DISTINCT k) AS BIGINT) AS n_active FROM ev GROUP BY 1),
         fs AS (SELECT k, min(day) AS day FROM ev GROUP BY 1),
         nw AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM fs GROUP BY 1)
         SELECT a.day, a.n_active, coalesce(n.n_new, 0) AS n_new,
                CAST(sum(coalesce(n.n_new, 0)) OVER
                     (ORDER BY a.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_cum_users
         FROM act a LEFT JOIN nw n ON n.day = a.day""",
    // ER twin: the fuzzy-pair CTEs verbatim + the recursive reach closure
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
    "stats_corr" ->
      """WITH b AS (SELECT CAST(n_chars AS BIGINT) AS x,
           CAST(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS y
           FROM documents),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM b)
         -- moments stay HUGEINT (the engine mirrors with decimal(38,0)),
         -- exact to ±1.7e38; only the final scalars narrow to DOUBLE
         SELECT n, CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
         FROM a""",
    "agg_salted_skew" ->
      """SELECT source AS key, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total,
                min(n_chars) AS vmin, max(n_chars) AS vmax
         FROM documents GROUP BY source""",
    "audit_key_skew" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1),
         t AS (SELECT CAST(sum(cnt) AS HUGEINT) AS tot, CAST(count(*) AS BIGINT) AS n_keys
               FROM c)
         SELECT key, cnt, n_keys,
                CAST(CAST(cnt AS HUGEINT) * 1000000 // tot AS BIGINT) AS share_ppm,
                CAST(CAST(cnt AS HUGEINT) * 1000 * n_keys // tot AS BIGINT) AS hot_x_milli
         FROM c, t ORDER BY cnt DESC, key ASC LIMIT 20""",
    "j8_salted_join" ->
      """SELECT l_suppkey, l_orderkey, l_quantity, s_name
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""",
    // the bloom gate is invisible to semantics — plain join truth
    "j9_bloom_gated_join" ->
      """SELECT p_partkey, p_name, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(l_quantity) AS BIGINT) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size = 10 GROUP BY 1, 2""",
    "corpus_sample_exact_k" ->
      """SELECT doc_id, source FROM documents
         ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT), doc_id
         LIMIT 200""",
    "privacy_k_anonymity" ->
      """SELECT source, n_chars % 10 AS len_bucket, CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive,
                count(*) >= 5 AS k_ok, count(DISTINCT lang) >= 2 AS l_ok
         FROM documents GROUP BY 1, 2""",
    // funnel twin: the cumulative AND chain summed once, unpivoted
    "curation_gate_funnel" ->
      """WITH a AS (SELECT
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) > 0
                          AND coalesce(lang = 'en', FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS c2,
           CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) > 0
                          AND coalesce(lang = 'en', FALSE)
                          AND coalesce(n_chars >= 100, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS c3,
           CAST(sum(CASE WHEN length(trim(coalesce(text, ''))) > 0
                          AND coalesce(lang = 'en', FALSE)
                          AND coalesce(n_chars >= 100, FALSE)
                          AND coalesce(n_chars <= 1500, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS c4
           FROM documents)
         SELECT CAST(1 AS INTEGER) AS stage_idx, 'nonempty' AS stage, n_total,
                c1 AS n_pass, CAST(c1 * 1000000 // n_total AS BIGINT) AS pass_ppm FROM a
         UNION ALL SELECT 2, 'english', n_total, c2, CAST(c2 * 1000000 // n_total AS BIGINT) FROM a
         UNION ALL SELECT 3, 'min_len', n_total, c3, CAST(c3 * 1000000 // n_total AS BIGINT) FROM a
         UNION ALL SELECT 4, 'max_len', n_total, c4, CAST(c4 * 1000000 // n_total AS BIGINT) FROM a""",
    // DP twin: identical deterministic inverse-CDF Laplace on the md5 grid;
    // the 6-dp noise round makes the one ln engine-portable (PSI argument)
    "privacy_dp_counts" -> dpCountsOracleSql,
    "sketch_join_size" ->
      """WITH a AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
         b AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM orders),
         ca AS (SELECT j,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', k)), 1, 8))
                    AS BIGINT) % 512 AS cell,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM a, range(0, 4) t(j) GROUP BY 1, 2),
         cb AS (SELECT j,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', k)), 1, 8))
                    AS BIGINT) % 512 AS cell,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM b, range(0, 4) t(j) GROUP BY 1, 2),
         ip AS (SELECT ca.j, sum(CAST(ca.cnt AS HUGEINT) * cb.cnt) AS ip
                FROM ca JOIN cb ON ca.j = cb.j AND ca.cell = cb.cell GROUP BY 1),
         est AS (SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) AS est_join_rows
                 FROM range(0, 4) t(j) LEFT JOIN ip ON ip.j = t.j),
         tr AS (SELECT CAST(count(*) AS BIGINT) AS true_join_rows
                FROM a JOIN b USING (k))
         SELECT est_join_rows, true_join_rows FROM est, tr""",
    "corpus_sample_weighted" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE CAST(n_chars AS DOUBLE) > 0
         ORDER BY ln(CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1 AS DOUBLE)
                     / 4294967296.0) / CAST(n_chars AS DOUBLE) DESC, doc_id
         LIMIT 150""",
    "corpus_sample_k_per_group" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source,
                  row_number() OVER (
                    PARTITION BY source
                    ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT), doc_id
                  ) AS rk
           FROM documents)
         WHERE rk <= 5""",
    "emb_quantize_int8" ->
      """WITH m AS (SELECT vec_id, embedding,
             list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS maxabs
           FROM embeddings),
         e AS (SELECT vec_id, maxabs, CAST(i - 1 AS INTEGER) AS pos,
                      CAST(embedding[i] AS DOUBLE) AS x
               FROM m, range(1, 65) t(i))
         SELECT vec_id, pos,
           CAST(CASE WHEN maxabs = 0 THEN 0
                ELSE floor(x * (127.0 / maxabs) + 0.5) END AS INTEGER) AS code
         FROM e""",
    "ann_int8_rerank" ->
      """WITH m AS (SELECT vec_id, embedding,
             list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS maxabs
           FROM embeddings),
         c8 AS (SELECT vec_id,
                 CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * (127.0 / maxabs) + 0.5) AS BIGINT)) END AS codes
               FROM m),
         q8 AS (SELECT vec_id AS query_id, codes AS qc FROM c8 WHERE vec_id < 10),
         s8 AS (SELECT q8.query_id, c8.vec_id AS cand_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> qc[i] * codes[i])) AS BIGINT) AS score
               FROM c8, q8 WHERE c8.vec_id <> q8.query_id),
         cand AS (SELECT query_id, cand_id FROM
                 (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rk
                  FROM s8)
                 WHERE rk <= 100),
         qv AS (SELECT vec_id AS query_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
                FROM embeddings WHERE vec_id < 10),
         cv AS (SELECT vec_id AS cand_id,
                  list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS cv
                FROM embeddings),
         ex AS (SELECT cand.query_id, cand.cand_id,
                  CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS BIGINT) AS naa,
                  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS ncc
                FROM cand JOIN qv USING (query_id) JOIN cv USING (cand_id)),
         scored AS (SELECT query_id, cand_id,
                  CAST(dot AS DOUBLE) / sqrt(CAST(naa AS DOUBLE) * CAST(ncc AS DOUBLE)) AS sim
                FROM ex),
         ranked AS (SELECT query_id, cand_id, sim,
                  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS INTEGER) AS rank
                FROM scored)
         SELECT query_id, cand_id, rank, sim FROM ranked WHERE rank <= 5""",
    "ann_int8_topk" ->
      """WITH m AS (SELECT vec_id, embedding,
             list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS maxabs
           FROM embeddings),
         c AS (SELECT vec_id,
                 CASE WHEN maxabs = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * (127.0 / maxabs) + 0.5) AS BIGINT)) END AS codes
               FROM m),
         q AS (SELECT vec_id AS query_id, codes AS qc FROM c WHERE vec_id < 5),
         s AS (SELECT q.query_id, c.vec_id AS cand_id,
                 CAST(list_sum(list_transform(range(1, 65), i -> qc[i] * codes[i])) AS BIGINT) AS score
               FROM c, q WHERE c.vec_id <> q.query_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cand_id) AS rk
               FROM s)
         SELECT query_id, cand_id, CAST(rk AS INTEGER) AS rank, score
         FROM r WHERE rk <= 10""",
    "stats_corr_by_source" ->
      """WITH b AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS x,
           CAST(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS y
           FROM documents),
         a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                      sum(x) AS sx, sum(y) AS sy,
                      sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
               FROM b GROUP BY grp)
         SELECT grp, n, CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
         FROM a""",
    // KS replay: same pooled-distinct-value formulation, HUGEINT cross
    // products, one rounded double ratio
    // interleave twin: same md5 epoch salt, same (hash, id) within-source
    // rank, same r*|S| + src_idx position arithmetic
    "corpus_interleave_rr" ->
      """WITH s AS (SELECT source, CAST(row_number() OVER (ORDER BY source) AS BIGINT) - 1 AS sidx
                FROM (SELECT DISTINCT source FROM documents)),
         n AS (SELECT CAST(count(*) AS BIGINT) AS nsrc FROM s),
         h AS (SELECT doc_id, source,
                 CAST(concat('0x', substr(md5(concat('e1#', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) AS hh
               FROM documents),
         r AS (SELECT doc_id, source,
                 CAST(row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS BIGINT) - 1 AS r
               FROM h)
         SELECT r.doc_id, r.source, r.r * n.nsrc + s.sidx AS pos
         FROM r JOIN s ON s.source = r.source CROSS JOIN n""",
    "stats_tvd_drift" ->
      """WITH base AS (SELECT source AS grp, lang AS cat,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, cat,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         tot AS (SELECT grp, cat, ca, cb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb
                 FROM cnt)
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(sum(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)) AS DOUBLE) /
                      (2.0 * CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)), 6) AS tvd
         FROM tot GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_ks_drift" ->
      """WITH base AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, v,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         cum AS (SELECT grp,
                   CAST(sum(ca) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cuma,
                   CAST(sum(cb) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cumb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb
                 FROM cnt)
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(max(abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)) AS DOUBLE) /
                      (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)), 6) AS ks
         FROM cum GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_psi_drift" ->
      """WITH base AS (SELECT source AS grp, lang AS cat,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, cat,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         tot AS (SELECT grp, ca, cb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb,
                   CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS ncat
                 FROM cnt),
         trm AS (SELECT grp, na, nb,
                   CAST(round((p - q) * ln(p / q), 9) AS DECIMAL(28,9)) AS term
                 FROM (SELECT grp, na, nb,
                         CAST(ca + 1 AS DOUBLE) / CAST(na + ncat AS DOUBLE) AS p,
                         CAST(cb + 1 AS DOUBLE) / CAST(nb + ncat AS DOUBLE) AS q
                       FROM tot))
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(sum(term) AS DOUBLE), 6) AS psi
         FROM trm GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_welch_t" ->
      """WITH base AS (SELECT event_type AS grp,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                  (CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM events WHERE value IS NOT NULL),
         m AS (SELECT grp,
                 sum(CASE WHEN a THEN 1 ELSE 0 END) AS na,
                 sum(CASE WHEN a THEN 0 ELSE 1 END) AS nb,
                 sum(CASE WHEN a THEN CAST(v AS HUGEINT) ELSE 0 END) AS sa,
                 sum(CASE WHEN a THEN 0 ELSE CAST(v AS HUGEINT) END) AS sb,
                 sum(CASE WHEN a THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS qa,
                 sum(CASE WHEN a THEN 0 ELSE CAST(v AS HUGEINT) * v END) AS qb
               FROM base GROUP BY grp
               HAVING na >= 2 AND nb >= 2),
         vv AS (SELECT grp, na, nb, sa, sb,
                  CAST(CAST(na AS HUGEINT) * qa - sa * sa AS DOUBLE) /
                    CAST(CAST(na AS HUGEINT) * (na - 1) AS DOUBLE) AS va,
                  CAST(CAST(nb AS HUGEINT) * qb - sb * sb AS DOUBLE) /
                    CAST(CAST(nb AS HUGEINT) * (nb - 1) AS DOUBLE) AS vb
                FROM m),
         se AS (SELECT grp, na, nb, sa, sb,
                  va / CAST(na AS DOUBLE) AS sea, vb / CAST(nb AS DOUBLE) AS seb
                FROM vv)
         SELECT grp, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                round((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
                       CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / sqrt(sea + seb), 6) AS t,
                round(((sea + seb) * (sea + seb)) /
                      (sea * sea / CAST(na - 1 AS DOUBLE) + seb * seb / CAST(nb - 1 AS DOUBLE)), 4) AS df
         FROM se WHERE sea + seb > 0""",
    "stats_jsd_drift" ->
      """WITH base AS (SELECT source AS grp, lang AS cat,
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0) AS a
                FROM documents),
         cnt AS (SELECT grp, cat,
                   sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                   sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
                 FROM base GROUP BY 1, 2),
         tot AS (SELECT grp, ca, cb,
                   CAST(sum(ca) OVER (PARTITION BY grp) AS BIGINT) AS na,
                   CAST(sum(cb) OVER (PARTITION BY grp) AS BIGINT) AS nb
                 FROM cnt),
         trm AS (SELECT grp, na, nb,
                   CAST(round(
                     0.5 * (CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0.0 END) +
                     0.5 * (CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0.0 END), 9) AS DECIMAL(28,9)) AS term
                 FROM (SELECT grp, na, nb, p, q, (p + q) / 2.0 AS m
                       FROM (SELECT grp, na, nb,
                               CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS p,
                               CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS q
                             FROM tot WHERE na > 0 AND nb > 0)))
         SELECT grp, max(na) AS n_a, max(nb) AS n_b,
                round(CAST(sum(term) AS DOUBLE) / 0.6931471805599453, 6) AS jsd
         FROM trm GROUP BY grp
         HAVING max(na) > 0 AND max(nb) > 0""",
    "stats_chi2_assoc" ->
      """WITH base AS (SELECT source AS grp, lang AS x, least(n_chars // 150, 5) AS y
                FROM documents),
         cells AS (SELECT grp, x, y, CAST(count(*) AS HUGEINT) AS o
                   FROM base GROUP BY 1, 2, 3),
         rk AS (SELECT *,
                  dense_rank() OVER (PARTITION BY grp ORDER BY x) AS drx,
                  dense_rank() OVER (PARTITION BY grp ORDER BY y) AS dry
                FROM cells),
         marg AS (SELECT grp, o,
                    CAST(sum(o) OVER (PARTITION BY grp) AS HUGEINT) AS n,
                    CAST(sum(o) OVER (PARTITION BY grp, x) AS HUGEINT) AS rt,
                    CAST(sum(o) OVER (PARTITION BY grp, y) AS HUGEINT) AS ct,
                    max(drx) OVER (PARTITION BY grp) AS r,
                    max(dry) OVER (PARTITION BY grp) AS c
                  FROM rk),
         trm AS (SELECT grp, n, r, c,
                   CAST(round(
                     CAST(o * n - rt * ct AS DOUBLE) * CAST(o * n - rt * ct AS DOUBLE) /
                       CAST(n * rt * ct AS DOUBLE) -
                     CAST(rt * ct AS DOUBLE) / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9)) AS term
                 FROM marg),
         agg AS (SELECT grp, CAST(max(n) AS BIGINT) AS n,
                   CAST(max(r) AS BIGINT) AS r, CAST(max(c) AS BIGINT) AS c,
                   round(CAST(max(n) AS DOUBLE) + CAST(sum(term) AS DOUBLE), 6) AS chi2
                 FROM trm GROUP BY grp
                 HAVING max(r) >= 2 AND max(c) >= 2)
         SELECT grp, n, r, c, (r - 1) * (c - 1) AS dof, chi2,
                round(sqrt(chi2 / (CAST(n AS DOUBLE) *
                                   CAST(least(r - 1, c - 1) AS DOUBLE))), 6) AS cramers_v
         FROM agg""",
    "emb_label_centroid" ->
      """WITH x AS (
           SELECT label, CAST(i - 1 AS INTEGER) AS pos,
                  CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
           FROM embeddings, range(1, 65) t(i))
         SELECT label, pos, CAST(count(*) AS BIGINT) AS n_vecs, CAST(sum(v) AS BIGINT) AS sum_q,
                CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_q
         FROM x GROUP BY label, pos""",
    "emb_label_diversity" ->
      """WITH q1 AS (
           SELECT vec_id, label,
             list_transform(range(1, 65),
               i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
           FROM embeddings),
         sd AS (
           SELECT vec_id, label, q,
             list_sum(list_transform(q, x -> x * x)) AS sdot
           FROM q1),
         un AS (
           SELECT vec_id, label,
             CASE WHEN sdot = 0 THEN list_transform(q, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(q,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 1000
                                    / sqrt(CAST(sdot AS DOUBLE)) + 0.5) AS BIGINT))
             END AS u
           FROM sd),
         e AS (
           SELECT label, CAST(i - 1 AS INTEGER) AS pos, u[i] AS ux
           FROM un, range(1, 65) t(i)),
         s1 AS (
           SELECT label, pos, count(*) AS n, sum(ux) AS s, sum(ux * ux) AS ss
           FROM e GROUP BY 1, 2),
         s2 AS (
           SELECT label, max(n) AS n_vecs, sum(s * s) AS dot_ss, sum(ss) AS self_sum
           FROM s1 GROUP BY 1)
         SELECT label,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(dot_ss AS BIGINT) AS dot_ss,
           CAST(self_sum AS BIGINT) AS self_sum,
           round(CAST(dot_ss - self_sum AS DOUBLE)
                 / (n_vecs * (n_vecs - 1)) / 1000000, 6) AS mean_cos
         FROM s2 WHERE n_vecs >= 2""",
    // EWMA twin: the bounded window replayed as an rn band self-join; the
    // lag weights (aD−aN)^j·aD^(N−1−j) are the exact integers the Spark
    // side bakes as literals, so num/den are integer sums in both engines
    "ts_ewma" ->
      """WITH e AS (SELECT user_id, event_id, ts,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
                    FROM events WHERE value IS NOT NULL),
         r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM e)
         SELECT a.user_id, a.event_id, epoch_us(a.ts) AS ts_us,
                CAST(count(*) AS INTEGER) AS n_window,
                round(CAST(sum(b.q * CASE a.rn - b.rn
                         WHEN 0 THEN 16384 WHEN 1 THEN 12288 WHEN 2 THEN 9216 WHEN 3 THEN 6912
                         WHEN 4 THEN 5184 WHEN 5 THEN 3888 WHEN 6 THEN 2916 WHEN 7 THEN 2187
                       END) AS DOUBLE) /
                      CAST(sum(CASE a.rn - b.rn
                         WHEN 0 THEN 16384 WHEN 1 THEN 12288 WHEN 2 THEN 9216 WHEN 3 THEN 6912
                         WHEN 4 THEN 5184 WHEN 5 THEN 3888 WHEN 6 THEN 2916 WHEN 7 THEN 2187
                       END) * 100 AS DOUBLE), 6) AS ewma
         FROM r a JOIN r b
           ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
         GROUP BY a.user_id, a.event_id, a.ts""",
    "ev_rolling" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum,
           count(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS n_window
         FROM events""",
    // DuckDB sums BIGINT into HUGEINT — cast S/Q back before the Long
    // products (the dsir-oracle lesson)
    "ev_anomaly_roll" ->
      """WITH q AS (
           SELECT event_id, user_id, ts, CAST(floor(value * 100) AS BIGINT) AS c
           FROM events
         ), w AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us, c,
             CAST(sum(c) OVER win AS BIGINT) AS win_sum,
             CAST(sum(c * c) OVER win AS BIGINT) AS win_sumsq,
             CAST(count(*) OVER win AS BIGINT) AS n_window
           FROM q
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
         )
         SELECT event_id, user_id, ts_us, n_window, win_sum,
                (n_window * c - win_sum) * (n_window * c - win_sum) >
                  9 * (n_window * win_sumsq - win_sum * win_sum) AS flagged
         FROM w""",
    "corpus_filter_by_group" ->
      """SELECT doc_id, source, n_chars FROM documents
         WHERE source IN (
           SELECT source FROM documents GROUP BY source
           HAVING CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) >= 300.0
         )""",
    "corpus_mix_weighted" ->
      """WITH c AS (SELECT source AS s, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
         u AS (SELECT s, n,
                 CAST(CASE WHEN s = 'src0' THEN 3 WHEN s = 'src1' THEN 2 ELSE 1 END AS BIGINT) AS u
               FROM c),
         b AS (SELECT n AS nb, u AS ub FROM (
                 SELECT *, row_number() OVER (
                   ORDER BY CAST(n AS DOUBLE) / CAST(u AS DOUBLE), s NULLS FIRST) AS rk
                 FROM u) WHERE rk = 1),
         r AS (SELECT u.s,
                 CAST(CAST(b.nb AS HUGEINT) * u.u * 1000000
                      // (CAST(b.ub AS HUGEINT) * u.n) AS BIGINT) AS r
               FROM u CROSS JOIN b)
         SELECT d.doc_id, d.source
         FROM documents d JOIN r ON r.s IS NOT DISTINCT FROM d.source
         WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
               < r.r""",
    "corpus_filter_quantile" ->
      """WITH r AS (
           SELECT doc_id, source, n_chars,
                  row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
                  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
           FROM documents
         ), thr AS (
           SELECT source, n_chars AS t FROM r WHERE rk = (1 * n + 1) // 2
         )
         SELECT d.doc_id, d.source, d.n_chars
         FROM documents d JOIN thr ON thr.source IS NOT DISTINCT FROM d.source
         WHERE d.n_chars >= thr.t""",
    "corpus_mix_temperature" -> tempMixSql,
    "ev_resample_ffill" ->
      """WITH b AS (SELECT user_id, date_trunc('hour', min(ts)) AS t0, max(ts) AS t1
                    FROM events GROUP BY 1),
         grid AS (SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS gts FROM b),
         p0 AS (SELECT user_id, ts, value,
                  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events),
         p AS (SELECT user_id, ts, value FROM p0 WHERE rn = 1)
         SELECT g.user_id, epoch_us(g.gts) AS gts_us,
                epoch_us(p.ts) AS last_ts_us, p.value AS last_value
         FROM grid g ASOF LEFT JOIN p ON g.user_id = p.user_id AND g.gts >= p.ts""",
    "ev_cohort_retention" ->
      """WITH c AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1),
         e AS (SELECT user_id, date_trunc('week', ts) AS w FROM events)
         SELECT strftime(c.cw, '%Y-%m-%d') AS cohort_week,
                CAST(date_diff('day', c.cw, e.w) / 7 AS BIGINT) AS week_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM e JOIN c USING (user_id)
         GROUP BY 1, 2""",
    "ev_transitions" ->
      """SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
         FROM (
           SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS from_type,
                  event_type AS to_type
           FROM events) t
         WHERE from_type IS NOT NULL
         GROUP BY 1, 2""",
    // micros-exact bucketing and winner ordering mirror resampleLocf
    "ts_resample_locf" ->
      """WITH ev AS (SELECT user_id AS k, epoch_us(ts) AS e, event_id, value FROM events),
         ev2 AS (SELECT k, e // 86400000000 AS bucket, e, event_id, value FROM ev),
         win AS (SELECT k, bucket, value AS v FROM (
           SELECT k, bucket, value,
                  row_number() OVER (PARTITION BY k, bucket ORDER BY e DESC, event_id DESC) AS rn
           FROM ev2) WHERE rn = 1),
         span AS (SELECT k, min(bucket) AS blo, max(bucket) AS bhi FROM win GROUP BY k),
         grid AS (SELECT k, unnest(generate_series(blo, bhi)) AS bucket FROM span)
         SELECT g.k AS user_id, g.bucket,
                last_value(w.v IGNORE NULLS) OVER (
                  PARTITION BY g.k ORDER BY g.bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
                w.k IS NOT NULL AS observed
         FROM grid g LEFT JOIN win w ON g.k = w.k AND g.bucket = w.bucket""",
    "graph_pagerank" -> pagerankOracleSql,
    "graph_label_prop" -> labelPropOracleSql,
    "graph_bfs" -> bfsOracleSql,
    "graph_bfs_fixpoint" -> bfsFixpointOracleSql,
    "graph_kcore" -> kcoreOracleSql,
    "graph_label_prop_fixpoint" -> labelPropFixpointOracleSql,
    "graph_kcore_fixpoint" -> kcoreFixpointOracleSql,
    // latest click at-or-before each purchase; same-instant ties to the
    // greatest click id (the asofJoin tie contract)
    "ev_attribution_last_touch" ->
      """WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS cts, event_id AS cid FROM events WHERE event_type = 'click'),
         j AS (SELECT p.user_id, p.ts, p.event_id, c.cid, c.cts,
                 row_number() OVER (PARTITION BY p.user_id, p.event_id
                                    ORDER BY c.cts DESC, c.cid DESC) AS rn
               FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.cts <= p.ts)
         SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us,
                cid AS click_id, epoch_us(cts) AS click_us
         FROM j WHERE rn = 1""",
    // linear attribution twin: same integer-cents split over the same
    // 3-day lookback, remainder to the most recent click (greatest id on
    // a timestamp tie)
    "ev_attribution_linear" -> evAttributionLinearSql,
    // U-shape twin: same 3-day lookback, 40/20/40 split in integer cents,
    // remainders to the most recent touch (all operands non-negative, so
    // Spark's truncating div and DuckDB's floor // agree)
    "ev_attribution_ushape" ->
      """WITH p AS (SELECT user_id, ts, event_id AS purchase_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS cts, event_id AS click_id
               FROM events WHERE event_type = 'click'),
         j AS (SELECT p.user_id, p.purchase_id, p.cents, x.click_id, x.cts
               FROM p JOIN c x ON x.user_id = p.user_id AND x.cts <= p.ts
                              AND x.cts >= p.ts - INTERVAL 3 DAY),
         w AS (SELECT user_id, purchase_id, click_id, cents,
                 CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
                 row_number() OVER (PARTITION BY purchase_id ORDER BY cts DESC, click_id DESC) AS rn
               FROM j)
         SELECT user_id, purchase_id, click_id, n_touches,
                CASE WHEN n_touches = 1 THEN 'solo'
                     WHEN rn = 1 THEN 'last'
                     WHEN rn = n_touches THEN 'first'
                     ELSE 'middle' END AS role,
                CAST(CASE WHEN n_touches = 1 THEN cents
                     WHEN n_touches = 2 THEN
                       CASE WHEN rn = 1 THEN cents - cents // 2 ELSE cents // 2 END
                     WHEN rn = n_touches THEN cents * 40 // 100
                     WHEN rn = 1 THEN cents * 40 // 100 +
                       ((cents - 2 * (cents * 40 // 100)) -
                        ((cents - 2 * (cents * 40 // 100)) // (n_touches - 2)) * (n_touches - 2))
                     ELSE (cents - 2 * (cents * 40 // 100)) // (n_touches - 2) END AS BIGINT) AS credit_cents
         FROM w""",
    "ev_funnel" ->
      """WITH a AS (
           SELECT user_id, min(CASE WHEN event_type = 'click' THEN ts END) AS c_ts
           FROM events GROUP BY 1),
         conv AS (
           SELECT e.user_id, min(e.ts) AS p_ts, CAST(count(*) AS BIGINT) AS n_purchases_after
           FROM events e JOIN a ON a.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= a.c_ts
           GROUP BY 1)
         SELECT a.user_id, epoch_us(a.c_ts) AS click_us,
                epoch_us(conv.p_ts) AS purchase_us,
                epoch_us(conv.p_ts) - epoch_us(a.c_ts) AS latency_us,
                coalesce(conv.n_purchases_after, 0) AS n_purchases_after
         FROM a LEFT JOIN conv ON conv.user_id = a.user_id
         WHERE a.c_ts IS NOT NULL""",
    "ev_props_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type""",
    "text_edit_distance" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS prefix FROM documents)
         SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
                CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS dist
         FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""",
    "stats_median_by_source" ->
      """WITH v AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v FROM documents),
         r AS (SELECT g, v,
                 row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY g) AS n
               FROM v),
         k AS (SELECT g, v, rn, (n - 1) * CAST(0.5 AS DOUBLE) AS pos,
                      CAST(floor((n - 1) * CAST(0.5 AS DOUBLE)) AS BIGINT) AS lo,
                      CAST(ceil((n - 1) * CAST(0.5 AS DOUBLE)) AS BIGINT) AS hi
               FROM r),
         f AS (SELECT g,
                 max(CASE WHEN rn = lo + 1 THEN v END) AS vlo,
                 max(CASE WHEN rn = hi + 1 THEN v END) AS vhi,
                 max(pos) AS pos, max(lo) AS lo
               FROM k WHERE rn = lo + 1 OR rn = hi + 1 GROUP BY g)
         SELECT g AS source,
                CAST(vlo AS DOUBLE) + (CAST(vhi AS DOUBLE) - CAST(vlo AS DOUBLE)) * (pos - CAST(lo AS DOUBLE)) AS median
         FROM f""",
    "sketch_countmin" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS item FROM documents),
         tok2 AS (SELECT item FROM tok WHERE length(item) > 0),
         cells AS (
           SELECT j,
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', item)), 1, 8)) AS BIGINT) % 256 AS cell,
             CAST(count(*) AS BIGINT) AS cnt
           FROM tok2, range(0, 4) t(j) GROUP BY 1, 2),
         probes AS (SELECT unnest(['spark', 'table', 'the', 'zebra']) AS item),
         pc AS (SELECT item, j,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', item)), 1, 8)) AS BIGINT) % 256 AS cell
                FROM probes, range(0, 4) t(j)),
         est AS (SELECT item, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
                 FROM pc LEFT JOIN cells USING (j, cell) GROUP BY 1),
         ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact FROM tok2 GROUP BY 1)
         SELECT e.item AS token, e.est, coalesce(x.exact, 0) AS exact
         FROM est e LEFT JOIN ex x USING (item)""",
    "sketch_hll_registers" -> {
      // restBits = 32 - p = 24; bit length as a sum of integer threshold
      // compares, mirroring the Spark side exactly (no float log2 anywhere)
      val bitlen = (0 until 24).map(k => s"CAST(rest >= ${1L << k} AS INTEGER)").mkString(" + ")
      s"""WITH it AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS item FROM orders),
         h AS (
           SELECT CAST(concat('0x', substr(md5(item), 1, 8)) AS BIGINT) AS h FROM it),
         r AS (SELECT h >> 24 AS register, h & ${(1L << 24) - 1} AS rest FROM h)
         SELECT register, max(CAST(24 - ($bitlen) + 1 AS INTEGER)) AS max_rho
         FROM r GROUP BY register"""
    },
    "sketch_hll_by_group" -> {
      val bitlen = (0 until 24).map(k => s"CAST(rest >= ${1L << k} AS INTEGER)").mkString(" + ")
      s"""WITH it AS (
           SELECT DISTINCT o_orderstatus AS grp, CAST(o_custkey AS VARCHAR) AS item FROM orders),
         h AS (
           SELECT grp, CAST(concat('0x', substr(md5(item), 1, 8)) AS BIGINT) AS h FROM it),
         r AS (SELECT grp, h >> 24 AS register, h & ${(1L << 24) - 1} AS rest FROM h)
         SELECT grp, register, max(CAST(24 - ($bitlen) + 1 AS INTEGER)) AS max_rho
         FROM r GROUP BY grp, register"""
    },
    "sketch_bloom_probe" ->
      """WITH bk AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS item FROM orders),
         bits AS (
           SELECT DISTINCT
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '#', item)), 1, 8)) AS BIGINT)
               % 65536 AS bpos
           FROM bk, range(0, 3) t(j)),
         pr AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS item FROM customer),
         pp AS (
           SELECT item, j,
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '#', item)), 1, 8)) AS BIGINT)
               % 65536 AS pos
           FROM pr, range(0, 3) t(j)),
         mb AS (
           SELECT pp.item, count(b.bpos) = 3 AS maybe
           FROM pp LEFT JOIN bits b ON pp.pos = b.bpos
           GROUP BY pp.item)
         SELECT m.item AS custkey, m.maybe, (bk.item IS NOT NULL) AS actual
         FROM mb m LEFT JOIN bk ON m.item = bk.item""",
    // the gate, the string-keyed tie order, and the DOUBLE ceil (the list
    // literal is cast to DOUBLE[] — DuckDB's default DECIMAL probs would
    // round ceil(0.3*m) differently from IEEE doubles) replay the engine.
    // SHARED verbatim with stream_kll_parity: the sketch is a pure
    // function of the multiset, so the streamed build must match exactly.
    "sketch_kll_quantiles" -> kllQuantilesSql,
    "sketch_kll_by_group" ->
      """WITH s AS (
           SELECT o_orderstatus AS grp, o_totalprice AS v, CAST(o_orderkey AS VARCHAR) AS k
           FROM orders
           WHERE o_totalprice IS NOT NULL
             AND CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 8 = 0
         ), r AS (
           SELECT grp, v,
                  row_number() OVER (PARTITION BY grp ORDER BY v, k) AS r,
                  count(*) OVER (PARTITION BY grp) AS m
           FROM s
         ), p AS (
           SELECT unnest(CAST([0.25,0.5,0.75] AS DOUBLE[])) AS prob
         )
         SELECT r.grp, p.prob, r.v AS est
         FROM p JOIN r ON r.r = greatest(1, CAST(ceil(p.prob * r.m) AS BIGINT))""",
    "text_bm25_topk" -> {
      val terms = Seq("spark", "query", "window")
      val k1 = 1.2
      val b = 0.75
      // every double literal below is the Scala-computed value interpolated
      // via Double.toString (round-trip exact), and the expression tree
      // mirrors Ranking.bm25TopK's associativity token for token — so the
      // IEEE-754 ops produce bit-identical doubles in both engines
      val tfCols = terms.indices
        .map(i => s"CAST(len(list_filter(w, x -> x = '${terms(i)}')) AS BIGINT) AS tf$i")
        .mkString(", ")
      val dfCols = terms.indices
        .map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
        .mkString(", ")
      val scoreSql = terms.indices
        .map { i =>
          s"((n - df$i + 0.5) / (df$i + 0.5)) * " +
            s"(tf$i * ${k1 + 1} / (tf$i + $k1 * (${1 - b} + $b * dl / avgdl)))"
        }
        .mkString(" + ")
      s"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS w FROM documents),
         tf AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, $tfCols FROM w),
         st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl, $dfCols FROM tf),
         scored AS (SELECT doc_id, $scoreSql AS score FROM tf, st)
         SELECT doc_id, round(score, 6) AS score FROM scored
         WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20"""
    },
  )
}
