package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** Corpus-curation family: sampling/splits/mixing, decontamination,
  * packing/chunking, URL canon, DSIR, privacy gates, ingest quarantine.
  *
  * Split out of Extensions.scala (round 15): same entries, same maps —
  * [[Extensions]] aggregates the families, so the driver contract
  * (SparkEntry.queries / oracleSql) is unchanged.
  */
private[queries] object QCorpus {
  import QShared._
  import OracleSql._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // profile expression tree into the pushed-down predicate, re-evaluating,
    // it per reference (measured 8s -> 1.1s at 400k docs; see PlanOps)
    "corpus_filter" -> { (s, dir) =>
      graft.ops.PlanOps
        .fence(TextStats.profileNativeDF(t(s, dir, "documents"), col("doc_id"), col("text")))
        .filter(col("lang") === "en" && col("score") >= 0.5 &&
          col("n_tokens").between(5, 1000))
    },
    // CDC/MERGE apply: a deterministic changelog (updates for every 7th
    // order at seq 1, deletes for every 11th at seq 2) applied to the
    // orders snapshot — highest seq wins per key, deletes remove, one,
    // reads shard by shard; per-shard windows, never a global sort
    "corpus_shuffle_shards" -> { (s, dir) =>
      Curation.shuffleShards(t(s, dir, "documents"), col("doc_id"), shards = 16)
    },
    // deterministic 80/10/10 train/val/test assignment — a pure map-side,
    // hash gate (retry-stable, engine-reproducible; see Curation.hashSplit)
    "corpus_split_assign" -> { (s, dir) =>
      Curation.hashSplit(
        t(s, dir, "documents").select(col("doc_id")),
        col("doc_id"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
    },
    // leakage-safe split: the hash key is the near-dup CLUSTER id (LSH
    // candidates -> connected components), so every member of a near-dup
    // cluster lands in the same split — eval contamination by duplicates,
    // straddling train/test is impossible by construction
    "corpus_split_leakage_safe" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val clusters = Dedup.connectedComponentsKeyed(
        Dedup.minhashLshPairs(
          tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, k = 8, bands = 4),
        contentKey = s"documents|$dir|mh3-8-4", spark = s)
      val keyed = docs
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("canonical_id"), col("doc_id")))
        .drop("canonical_id")
      Curation
        .hashSplit(keyed, col("cluster_id"), Seq("train" -> 800, "val" -> 100, "test" -> 100))
        .select(col("doc_id"), col("cluster_id"), col("split"))
    },
    // BPE tokenizer training on a deterministic corpus sample (every 10th
    // doc): 8 rounds of count-pairs → merge argmax → greedy rewrite, the
    // engine's second iterative driver-loop operator (after connected,
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
    // rides an exact integer sum of the 4-decimal scores (one double,
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
    // operators the standalone queries run — one definition, shared oracle,
    // CTEs, so the report cannot drift from the gates it summarizes
    "corpus_data_card_v2" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val docsPar = tPar(s, dir, "documents")
      val prof = graft.ops.PlanOps
        .fence(TextStats.profileNativeDF(docs, col("doc_id"), col("text")))
      val split = Curation.hashSplit(
        prof, col("doc_id"), Seq("train" -> 800, "val" -> 100, "test" -> 100))
      val ver = Dedup.verifiedNearDupPairs(
        docsPar, col("doc_id"), col("text"), n = 3, k = 8, bands = 4, tau = 0.7,
        contentKey = Some(s"documents|$dir"))
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
    // per-group top-k via the bounded-heap aggregator (≤ k state per,
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
    // then each doc scored as the exact long sum of its tokens' weights,
    "curation_dsir_scores" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      val w = Curation.dsirBucketWeights(docs, docs.filter(col("lang") === "en"), col("text"))
      Curation
        .dsirScores(docs, col("doc_id"), col("text"), w)
        .select(col("id").as("doc_id"), col("score"))
    },
    // the selection tail: top-100 docs by importance (score desc, id,
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
    // straddling score class pays a running-sum window. The oracle replays,
    // the equivalent single greedy running sum in (score desc, id) order
    "curation_token_budget" -> { (s, dir) =>
      val q = TextStats.qualityDF(t(s, dir, "documents"), col("doc_id"), col("text"))
      Curation.tokenBudgetSelect(
        q, col("doc_id"), round(col("score") * 10000, 0).cast("long"), col("n_tokens"),
        budget = 50000L)
    },
    // PII scrub with audit counts; the fixture corpus has no PII, so a,
    // docs with >= 10% distinct-5-gram overlap against it are flagged
    "corpus_decontaminate" -> { (s, dir) =>
      val docs = tPar(s, dir, "documents")
      Curation.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0), col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 50 === 0), col("text"),
        n = 5, threshPct = 10
      )
    },
    // RAG chunking: 50-token windows every 25 tokens, one row per chunk,
    "curate_chunk_windows" -> { (s, dir) =>
      Curation.chunkWindows(
        t(s, dir, "documents"), col("doc_id"), col("text"), chunkTokens = 50, stride = 25)
    },
    // PSL-backed registrable domain (the exact rule the two-label
    // heuristic approximates): a public-suffix dimension table joins
    // against every host's exploded label-suffixes, longest match wins —
    // a.b.co.uk groups under b.co.uk, a bare public suffix has no
    // registrable domain (NULL), unknown TLDs fall back to the heuristic.
    // Synthetic hosts exercise all four paths; the oracle replays the,
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
    // collide post-canonicalization, so the survivor election is real.,
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
    // corpus-internal repeated-span diagnostic: per-doc fraction of,
    // salted md5 shuffle — every contiguous slice carries every source
    "corpus_interleave_rr" -> { (s, dir) =>
      Curation.interleaveRoundRobin(
        t(s, dir, "documents"), col("doc_id"), col("source"), epoch = 1)
    },
    // categorical drift: per-source total-variation distance of the LANG
    // mix between the same md5-hash halves — the unordered-category,
    "corpus_sample_exact_k" -> { (s, dir) =>
      Curation.sampleExactK(
        t(s, dir, "documents").select(col("doc_id"), col("source")), col("doc_id"), k = 200)
    },
    // privacy release gate: k-anonymity + l-diversity per quasi-identifier
    // group — exact counts, row-local verdicts; the semi-join against,
    // passing groups is the actual release filter
    "privacy_k_anonymity" -> { (s, dir) =>
      Curation.kAnonymity(
        t(s, dir, "documents").withColumn("len_bucket", col("n_chars") % 10),
        Seq(col("source"), col("len_bucket")), col("lang"), k = 5, l = 2)
    },
    // curation gate FUNNEL: cumulative survivors through the ordered gate
    // chain in ONE partial-agg'd pass — the data-card table that explains,
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
    // the md5 grid — per-(event_type, day) noised counts, true counts,
    // never published; row-local algebra on the partial-agg'd aggregate
    "privacy_dp_counts" -> { (s, dir) =>
      Curation.dpNoisyCounts(
        Fixtures.events(s, dir).withColumn("day", to_date(col("ts"))),
        Seq(col("event_type"), col("day")), eps = 1.0)
    },
    // join-size estimation from two count-min sketches: the CM inner-
    // product bound (min_j Σ_w A[j,w]·B[j,w]) vs the true join count —
    // the optimizer-statistics probe that prices a join from O(d·w),
    // corpus sample; TakeOrdered over ln(u)/w, no global sort
    "corpus_sample_weighted" -> { (s, dir) =>
      Curation.sampleWeighted(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("doc_id"), col("n_chars"), k = 150)
    },
    // per-group exact-k cap: at most 5 docs per source, chosen by the same,
    // md5 gate — partitioned-window ranking, no global order
    "corpus_sample_k_per_group" -> { (s, dir) =>
      Curation.sampleExactKPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), k = 5)
    },
    // int8 embedding quantization (storage/serving compression) — fixed-,
    // misses the bar — an aggregate decision no per-row filter expresses
    "corpus_filter_by_group" -> { (s, dir) =>
      Curation.filterByGroupMean(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("n_chars"), minMean = 300.0)
    },
    // static domain mixing: rebalance sources to 3:2:1:... target,
    // proportions, bottleneck stratum kept whole, others hash-downsampled
    "corpus_mix_weighted" -> { (s, dir) =>
      Curation.mixToTarget(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"),
        weights = Map("src0" -> 3, "src1" -> 2), defaultWeight = 1)
    },
    // per-group quantile curation: each source keeps only docs at or
    // above its OWN median length (type-1 order statistic, integer rank,
    // math, value-ties kept) — a global cut would gut small strata
    "corpus_filter_quantile" -> { (s, dir) =>
      Curation.filterByGroupQuantile(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("n_chars"), pNum = 1, pDen = 2)
    },
    // temperature-flattened mixing (target share ∝ n^(1/2), the
    // multilingual-LM sampling rule): weights derived from the counts
    // themselves — floor(sqrt(n)·1e6), IEEE-exact in any engine — with,
    // the same bottleneck-at-100% md5 gate as corpus_mix_weighted
    "corpus_mix_temperature" -> { (s, dir) =>
      Curation.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        col("doc_id"), col("source"))
    },
    // per-label embedding centroids: exact quantized sums + means, one row,
  )

  val oracles: Map[String, String] = Map(
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
    "ingest_json_quarantine" -> ingestQuarantineSql,
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
    // from the dedup oracles) and the decontaminate chain (5-grams off the,
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
    // greedy replay of the two-phase selection: one running token sum in,
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
    // longest-suffix election replay: same PSL dimension (VALUES), same,
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
    // same default-port/trailing-slash/www rules as Web.normalizeUrl,
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
    "corpus_sample_exact_k" ->
      """SELECT doc_id, source FROM documents
         ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT), doc_id
         LIMIT 200""",
    "privacy_k_anonymity" ->
      """SELECT source, n_chars % 10 AS len_bucket, CAST(count(*) AS BIGINT) AS n,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_sensitive,
                count(*) >= 5 AS k_ok, count(DISTINCT lang) >= 2 AS l_ok
         FROM documents GROUP BY 1, 2""",
    // funnel twin: the cumulative AND chain summed once, unpivoted,
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
    // DP twin: identical deterministic inverse-CDF Laplace on the md5 grid;,
    // the 6-dp noise round makes the one ln engine-portable (PSI argument)
    "privacy_dp_counts" -> dpCountsOracleSql,
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
  )
}
