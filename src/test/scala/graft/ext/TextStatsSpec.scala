package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Text-analysis extensions (SURVEY.md §7.5c). */
class TextStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("langId picks the language with most stopword hits, und on zero hits") {
    val df = Seq(
      "the cat and the dog of a house",
      "el gato y la casa de madrid",
      "le chat et la maison de paris",
      "der hund und die katze das haus",
      "xyzzy plugh"
    ).toDF("t")
    val out = strings(df.select(TextStats.langId($"t").as("v")), "v")
    assert(out == Seq("en", "es", "fr", "de", "und"))
  }

  test("langIdNgramDF identifies languages from character trigrams") {
    val df = Seq(
      (1L, "the weather and the thing"),
      (2L, "la casa de los árboles de madrid"),
      (3L, "der fischer und die ich sache"),
      (4L, "zzz qqq")
    ).toDF("doc_id", "text")
    val out = TextStats.langIdNgramDF(df, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(2L) == "es" && out(3L) == "de" && out(4L) == "und")
  }

  test("tokenCount: whitespace tokens, 0 for blank and null") {
    val df = Seq(Some("one two  three"), Some("   "), None).toDF("t")
    val out = df.select(TextStats.tokenCount($"t").as("v")).collect().map(_.getLong(0))
    assert(out sameElements Array(3L, 0L, 0L))
  }

  test("subwordCount splits letter runs, digit runs, single punctuation") {
    val df = Seq("abc123,def!").toDF("t")
    // abc | 123 | , | def | ! → 5
    assert(df.select(TextStats.subwordCount($"t").as("v")).collect().head.getLong(0) == 5L)
  }

  test("qualityScore is in [0,1] and rewards stopword-rich prose") {
    val df = Seq(
      "the cat and the dog of a house with the garden and the tree please",
      "zz"
    ).toDF("t")
    val out = df.select(TextStats.qualityScore($"t").as("v")).collect().map(_.getDouble(0))
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
    assert(out(0) > out(1))
  }

  test("scrubbedDF replaces emails then phones, with audit counts") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org or call 312-555-0142 now"),
      (2L, "no pii here"),
      (3L, "two mails a@b.co c@d.io")
    ).toDF("doc_id", "text")
    val out = TextStats.scrubbedDF(df, $"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, "mail <EMAIL> or call <PHONE> now")))
    assert(out(2L) == ((0L, 0L, "no pii here")))
    assert(out(3L) == ((2L, 0L, "two mails <EMAIL> <EMAIL>")))
  }

  test("repetitionDF: duplicate word/bigram fractions and top-word share") {
    val df = Seq(
      (1L, "a a b"),       // 3 words, 2 uniq; bigrams "a a","a b" both uniq
      (2L, "x"),           // single word: no bigrams -> 0.0, share 1.0
      (3L, "go go go go")  // fully degenerate
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionDF(df, $"doc_id", $"text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(1L) == ((3L, 2L, 0.333333, 0.0, 0.666667)))
    assert(out(2L) == ((1L, 1L, 0.0, 0.0, 1.0)))
    assert(out(3L) == ((4L, 1L, 0.75, 0.666667, 1.0)))
  }

  test("ngramFamiliarity: df stats match hand-computed document frequencies") {
    // 1-grams for hand-checkable dfs: a appears in 3 docs, b in 2, c in 1
    val docs = Seq(
      (1L, "a b"),
      (2L, "a b"),
      (3L, "a c")
    ).toDF("doc_id", "text")
    val out = TextStats.ngramFamiliarity(docs, $"doc_id", $"text", n = 1, hotK = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // doc 1: grams {a, b} → df 3 + 2 = 5; doc 3: {a, c} → 3 + 1 = 4
    assert(out(1L) == ((2L, 5L, 2.5)))
    assert(out(2L) == ((2L, 5L, 2.5)))
    assert(out(3L) == ((2L, 4L, 2.0)))
  }

  test("ngramFamiliarity plans the hybrid join: broadcast head + shuffle tail") {
    val docs = (1L to 50L)
      .map(i => (i, s"common words everywhere plus rare$i token$i"))
      .toDF("doc_id", "text")
    val plan = TextStats.ngramFamiliarity(docs, $"doc_id", $"text", n = 1, hotK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"hot head must broadcast:\n$plan")
    assert(
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"cold tail must shuffle-join:\n$plan")
  }

  test("ngramFamiliarity with hotK covering the whole vocabulary still sums correctly") {
    val docs = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextStats.ngramFamiliarity(docs, $"doc_id", $"text", n = 1, hotK = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 4L, 2L -> 4L)) // both grams df=2 each
  }

  test("bpeMerges: merge table matches hand-computed pair counts and greedy rewrites") {
    val docs = Seq(
      (1L, "a a a b"),
      (2L, "a b c a b")
    ).toDF("doc_id", "text")
    val out = TextStats.bpeMerges(docs, $"doc_id", $"text", k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: pairs (a,b)=3, (a,a)=2, (b,c)=1, (c,a)=1 → merge (a,b)
    assert(out(0) == ((1, "a", "b", "ab", 3L)))
    // greedy rewrite: [a,a,ab], [ab,c,ab]; round 2 pairs all cnt=1 →
    // lexicographic argmax = (a,a)
    assert(out(1) == ((2, "a", "a", "aa", 1L)))
    // rewrite: [aa,ab], [ab,c,ab]; round 3 pairs (aa,ab)=1,(ab,c)=1,(c,ab)=1
    assert(out(2) == ((3, "aa", "ab", "aaab", 1L)))
  }

  test("bpeMerges: overlapping occurrences merge left-to-right, not pairwise-greedy") {
    // "x x x x" → (x,x)=3 counted, but greedy rewrite yields [xx, xx]
    val docs = Seq((1L, "x x x x")).toDF("doc_id", "text")
    val out = TextStats.bpeMerges(docs, $"doc_id", $"text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(out(0) == ((1, "x", "x", 3L)))
    // after rewrite [xx, xx]: the only pair is (xx, xx) once
    assert(out(1) == ((2, "xx", "xx", 1L)))
  }

  test("bpeMerges: single-token and empty docs survive; exhausted vocab stops early") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "p q")).toDF("doc_id", "text")
    val out = TextStats.bpeMerges(docs, $"doc_id", $"text", k = 5)
      .collect().map(r => (r.getInt(0), r.getString(3)))
    // only (p,q) exists; after merging it no pairs remain → 2 merges max:
    // round 2 has pair... after [pq] there are no adjacent pairs at all
    assert(out.length == 1 && out(0) == ((1, "pq")))
  }

  test("bpeEncode applies trained merges in rank order and only compresses") {
    val docs = Seq(
      (1L, "a b a b c"),   // (a,b) fuses twice
      (2L, "c c c"),       // untouched by an (a,b)-only merge list
      (3L, "")             // empty doc: [""] in, [""] out
    ).toDF("doc_id", "text")
    val out = TextStats.bpeEncode(docs, $"doc_id", $"text", Seq(("a", "b")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((5L, 3L)), "two (a,b) fusions: 5 tokens -> 3")
    assert(out(2L) == ((3L, 3L)), "no matching pair: identity")
    assert(out(3L) == ((1L, 1L)), "empty doc survives")
    // zero merges = identity; and n_bpe <= n_raw always on the fixture
    val docs2 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val id = TextStats.bpeEncode(docs2, $"doc_id", $"text", Nil).collect()
    assert(id.forall(r => r.getLong(1) == r.getLong(2)))
    // rank order matters: later merges see earlier fusions
    val chained = TextStats.bpeEncode(
        Seq((1L, "a b c")).toDF("doc_id", "text"),
        $"doc_id", $"text", Seq(("a", "b"), ("ab", "c")))
      .collect().head
    assert(chained.getLong(2) == 1L, "a b c -> ab c -> abc")
  }

  test("lmScoreDF: fluent text beats junk, short docs drop, ppl ties out, hot split is invisible") {
    val docs = ((1 to 20).map(i => (i.toLong, "the cat sat on the mat")) ++
      Seq((100L, "xq zr wv qqj"), (101L, "solo"), (102L, ""))).toDF("doc_id", "text")
    val out = TextStats.lmScoreDF(docs, $"doc_id", $"text", corpusKey = "spec_lm_a", hotK = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // docs without a bigram are out of scope, not zero-scored
    assert(!out.contains(101L) && !out.contains(102L), s"sub-bigram docs must drop: ${out.keySet}")
    // n_bigrams = tokens - 1
    assert(out(1L)._1 == 5L && out(100L)._1 == 3L)
    // the transition model is trained on the corpus itself: the repeated
    // fluent doc's transitions are common (high prob), the junk doc's are
    // singletons — so junk must score strictly worse (higher perplexity)
    assert(out(100L)._3 > out(1L)._3,
      s"junk ppl ${out(100L)._3} must exceed fluent ppl ${out(1L)._3}")
    // ppl is exactly the rounded exp of the rounded mean log-prob
    for ((_, (_, avgLp, ppl)) <- out)
      assert(ppl == math.rint(math.exp(-avgLp) * 1e4) / 1e4, s"ppl/avg_lp out of sync")
    // the hot-broadcast/cold-shuffle split is a pure execution concern:
    // any hotK yields byte-identical scores
    val wide = TextStats.lmScoreDF(docs, $"doc_id", $"text", corpusKey = "spec_lm_b", hotK = 1000)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(wide == out, "hotK must not change results")
  }

  test("fingerprint: deterministic, order-sensitive, stable across runs") {
    val df = Seq("alpha beta gamma", "beta alpha gamma", "alpha beta gamma").toDF("t")
    val out = df.select(TextStats.fingerprint($"t").as("v")).collect().map(_.getLong(0))
    assert(out(0) == out(2))   // same text → same fp
    assert(out(0) != out(1))   // word order matters (rolling hash)
    assert(out.forall(v => v >= 0 && v < 2147483647L))
  }

  test("charEntropy closed forms: constant 0, uniform alphabets log2 k, empty absent") {
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, "")).toDF("id", "t")
    val out = TextStats.charEntropy(df, $"id", $"t")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"got ${out.keySet}")
    assert(out(1L) == ((4L, 1L, 0.0)), s"constant text: ${out(1L)}")
    assert(out(2L) == ((4L, 2L, 1.0)), s"two uniform symbols = 1 bit: ${out(2L)}")
    assert(out(3L) == ((4L, 4L, 2.0)), s"four uniform symbols = 2 bits: ${out(3L)}")
  }

  test("readability: exact integer counts, sentence/syllable floors, fixed-order grade") {
    val df = Seq(
      (1L, "the cat sat. it ran!"), // 5 words, 2 sentence runs, 5 syllables
      (2L, "no punctuation here"),  // sentence floor: 0 runs → 1
      (3L, "bcdfg xyzzy"),          // vowelless floor → 1; two y-runs → 2
      (4L, "   ")                   // token-less → absent
    ).toDF("id", "t")
    val out = TextStats.readability(df, $"id", $"t")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"got ${out.keySet}")
    assert(out(1L) == ((5L, 2L, 5L, -2.815)), s"got ${out(1L)}")
    assert(out(2L)._2 == 1L && out(2L)._1 == 3L, s"sentence floor: ${out(2L)}")
    assert(out(3L) == ((2L, 1L, 3L,
      BigDecimal(0.39 * 2.0 + 11.8 * 1.5 - 15.59).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)), s"syllable floors: ${out(3L)}")
  }

  test("oovRate: deterministic vocab cut with tie-break, exact ppm, empty docs absent") {
    // counts: a=3 b=2 c=2 d=1 → top-2 = a, b (b beats c on the token
    // tie-break at equal count 2)
    val df = Seq((1L, "a b c d"), (2L, "a b c"), (3L, "a"), (4L, "   ")).toDF("id", "t")
    val out = TextStats.oovRate(df, $"id", $"t", topK = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((4L, 2L, 500000L)),  // c, d OOV
      2L -> ((3L, 1L, 333333L)),  // exact integer div, not a rounded float
      3L -> ((1L, 0L, 0L))
    ), s"got $out") // doc 4 has no tokens → absent
  }
}
