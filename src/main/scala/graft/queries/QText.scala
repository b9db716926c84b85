package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Curation, Dedup, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** Text-analysis family: lang-id, quality/readability, tokenization/BPE,
  * LM scoring, BM25, NB classification, PII scrub, fingerprints.
  *
  * Split out of Extensions.scala (round 15): same entries, same maps —
  * [[Extensions]] aggregates the families, so the driver contract
  * (SparkEntry.queries / oracleSql) is unchanged.
  */
private[queries] object QText {
  import QShared._
  import OracleSql._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 9-dp-quantized into a decimal sum (PSI discipline)
    "text_entropy" -> { (s, dir) =>
      TextStats.charEntropy(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    // readability gate: Flesch-Kincaid grade from exact integer counts
    // (whitespace words, [.!?]+ sentence runs floored at 1, vowel-run
    // syllables floored at 1 per word) folded in one aggregate HOF —,
    // map-only, one fixed-order IEEE tail
    "text_readability" -> { (s, dir) =>
      TextStats.readability(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    // tokenizer-coverage audit: per-doc OOV rate against the corpus' own
    // top-500 vocabulary — bounded TakeOrdered vocab broadcast as model,
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
    // corpus rebalancing: deterministic hash-gated downsampling of the,
    // components). The oracle unrolls the same 8 stages in SQL
    "text_bpe_merges" -> { (s, dir) =>
      TextStats.bpeMerges(
        t(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        col("doc_id"), col("text"), k = 8)
    },
    // the tokenizer's serving half: train the 8 merges on the sample (the
    // same driver loop text_bpe_merges runs), then APPLY them to the whole
    // corpus as 8 chained map-only rewrites — one stage, no shuffle. The,
    // oracle replays training via the shared CTEs, then the same rewrites
    "text_bpe_encode" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val merges = TextStats.bpeMergesModel(
        docs.filter(col("doc_id") % 10 === 0), col("doc_id"), col("text"), k = 8)
      TextStats.bpeEncode(docs, col("doc_id"), col("text"), merges)
    },
    // corpus-familiarity quality signal: per-doc document-frequency stats
    // of its distinct 3-grams, hybrid hot-broadcast / cold-shuffle join,
    // (the zipf-head answer that salting can't give — see TextStats)
    "text_familiarity" -> { (s, dir) =>
      TextStats.ngramFamiliarity(
        tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 3, hotK = 64)
    },
    // corpus-trained bigram LM scoring: per-doc mean log-prob + perplexity
    // under the add-one-smoothed transition model of the corpus itself —
    // the CCNet-style perplexity quality gate; hot transitions broadcast,
    // the model marginalizes from the count table, never the corpus,
    "text_lm_score" -> { (s, dir) =>
      TextStats.lmScoreDF(
        tPar(s, dir, "documents"), col("doc_id"), col("text"),
        corpusKey = s"documents|$dir", hotK = 64)
    },
    // in-engine trainable classifier: multinomial NB fit by pure counting
    // on the md5-gated train 80%, served broadcast on the held-out 20% —
    // the label-assignment audit (confusion matrix) as a query, with both,
    // fit and serve deterministic (millinat log-probs, class-asc argmax)
    "text_nb_confusion" -> { (s, dir) =>
      Classify.nbConfusion(
        tPar(s, dir, "documents"), col("doc_id"), col("text"), col("lang"),
        trainPermille = 800, vocabK = 64, corpusKey = s"documents|$dir")
    },
    // corpus cartography: per-source distinctive terms by class-based
    // TF-IDF over a capped global vocabulary — every post-count frame is,
    // model-state-sized, so the serving joins broadcast by doctrine
    "text_ctfidf_terms" -> { (s, dir) =>
      Classify.ctfidfTerms(
        tPar(s, dir, "documents"), col("source"), col("text"), vocabK = 256, topK = 5)
    },
    // ingest-boundary quarantine: parse a JSON-lines payload against a
    // declared schema and ROUTE malformed rows instead of failing the scan
    // — the ValidateOps.partition discipline applied where scraped corpora
    // break first. Payload synthesized deterministically (same concat both
    // engines); two corruption modes (head-chop, garbage swap) are both,
    "text_lang_id" -> { (s, dir) =>
      TextStats.langIdDF(t(s, dir, "documents"), col("doc_id"), col("text"))
    },
    // the native-expression fast path under the lexicon scoring: one
    // allocation-free graft_occ_counts pass (GraftExtensions) instead of 16,
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
    // corpus length distribution: exact per-bucket doc counts + bounds (the,
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
    // ---- multimodal plumbing ---------------------------------------------,
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
    // KMV distinct-token sketch (k=16 so the estimation path is live at the,
    "text_bm25_topk" -> { (s, dir) =>
      Ranking.bm25TopK(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        terms = Seq("spark", "query", "window")
      )
    },
    // KMV set algebra: part keys shipped before vs since 1998 — union,
    // intersection and Jaccard estimates composed from two k-min sketches,
    // distinct 5-grams shared with at least one other document
    "text_dup_span_frac" -> { (s, dir) =>
      Curation.dupSpanFraction(tPar(s, dir, "documents"), col("doc_id"), col("text"), n = 5)
    },
    // point-in-time join: each click picks up the user's latest purchase
    // at-or-before it (union + one window pass — merge-join shape, no,
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
    // (n·x − S)² > 9·(n·SS − S²), no float anywhere, boundary rows can't,
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
    // C(5,2) in-cluster pairs within distance 2, equal-length so the,
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
    // unlike the single global sort of stats_quantiles,
  )

  val oracles: Map[String, String] = Map(
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
         idf AS (SELECT dfc.tok,
                   CAST(round(1000.0 * ln(CAST(n.nc + 1 AS DOUBLE) / CAST(dfc.cf AS DOUBLE)), 0) AS BIGINT) AS idf_milli
                 FROM dfc CROSS JOIN ncl n),
         sc AS (SELECT iv.cls, iv.tok,
                  (iv.c * idf.idf_milli * 1000) // tcls.t AS score_micro
                FROM iv JOIN tcls USING (cls) JOIN idf ON idf.tok = iv.tok),
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
    // one rounded division for the baseline, residual off the rounded value,
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
    "text_nfc_normalize" ->
      """SELECT doc_id,
                CAST(length(t) AS INTEGER) AS len_raw,
                CAST(length(nfc_normalize(t)) AS INTEGER) AS len_nfc,
                md5(nfc_normalize(t)) AS h
         FROM (SELECT doc_id,
                      text || ' cafe' || chr(769) || ' ' || chr(65) || chr(778) AS t
               FROM documents)""",
    // the oracle is the plain threshold truth — no sketch replay needed
    "text_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS item FROM documents),
         tok2 AS (SELECT item FROM tok WHERE length(item) > 0)
         SELECT item AS token, CAST(count(*) AS BIGINT) AS cnt
         FROM tok2 GROUP BY 1 HAVING count(*) >= 500""",
    "text_edit_distance" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS prefix FROM documents)
         SELECT a.doc_id AS id_lo, b.doc_id AS id_hi,
                CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS dist
         FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""",
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
