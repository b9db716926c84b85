package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The in-engine NB classifier and c-TF-IDF term extractor are pure
  * functions of counts; these cases pin the semantics the confusion-matrix
  * query relies on: a separable vocabulary is learned and applied, the
  * vocab cap binds deterministically, token-free docs fall back to the
  * prior argmax, and distinctive terms outrank shared ones.
  */
class ClassifySpec extends SparkSpecBase {
  import spark.implicits._

  // doc_ids chosen so both md5-gate sides are populated: the gate is
  // md5(doc_id) % 1000 < 800, i.e. ~80% train. With ids 0..39 both splits
  // are non-empty for any seed-free md5 (checked in the assertion below).
  private def corpus(nPerClass: Int) =
    (0 until 2 * nPerClass).map { i =>
      val cls = if (i % 2 == 0) "A" else "B"
      val word = if (cls == "A") "apple" else "banana"
      // class-pure content plus a shared token so the vocab has both kinds
      (i.toLong, s"$word $word shared", cls)
    }.toDF("doc_id", "text", "label")

  test("nbConfusion learns a separable signal and predicts the held-out docs") {
    val out = Classify
      .nbConfusion(corpus(20), col("doc_id"), col("text"), col("label"),
        trainPermille = 800, vocabK = 16, corpusKey = "spec-nb-separable")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(out.nonEmpty, "held-out split must be non-empty under the md5 gate")
    // perfectly separable: every held-out doc lands on its own class
    assert(out.forall { case (label, pred, _) => label == pred }, s"misclassified: $out")
    assert(out.map(_._3).sum > 0)
  }

  test("token-free held-out docs fall back to the prior argmax (class-asc tiebreak on ties)") {
    // training docs give class A a strictly larger prior; the empty test
    // doc has no vocab tokens, so it must score on priors alone
    val df = Seq(
      (1L, "x", "A"), (2L, "x", "A"), (3L, "x", "A"), (4L, "x", "B"),
      // doc_id 13 gates into the held-out side (md5 permille >= 800)
      (13L, "   ", "B")
    ).toDF("doc_id", "text", "label")
    val gate = df
      .withColumn("g", graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 1000L))
      .select("doc_id", "g").as[(Long, Long)].collect().toMap
    assume(gate(13L) >= 800 && Seq(1L, 2L, 3L, 4L).forall(gate(_) < 800),
      "fixture ids must land on the intended gate sides")
    val out = Classify
      .nbConfusion(df, col("doc_id"), col("text"), col("label"),
        trainPermille = 800, vocabK = 16, corpusKey = "spec-nb-prior")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq(("B", "A", 1L)), s"empty doc must take the majority prior: $out")
  }

  test("vocab cap binds: with vocabK=1 only the top train token carries signal") {
    // 'shared' is the most frequent train token (appears once per doc in
    // both classes — 2x per doc for apple/banana each in only half). Build
    // so 'noise' outnumbers the class words and is class-neutral: with
    // vocabK=1 only 'noise' is in-vocab, every held-out doc scores equal
    // per class, and the tiebreak (class asc) predicts the first class.
    val df = (0 until 40).map { i =>
      val cls = if (i % 2 == 0) "A" else "B"
      val word = if (cls == "A") "apple" else "banana"
      (i.toLong, s"noise noise noise $word", cls)
    }.toDF("doc_id", "text", "label")
    val out = Classify
      .nbConfusion(df, col("doc_id"), col("text"), col("label"),
        trainPermille = 800, vocabK = 1, corpusKey = "spec-nb-cap")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out.nonEmpty)
    // equal likelihoods and (near-)equal priors: prediction depends only on
    // prior ordering then class-asc — never on the class word, which is OOV
    val preds = out.map(_._2).distinct
    assert(preds.size == 1, s"with a class-blind vocab all docs get one prediction: $out")
  }

  test("nbServe (stateless literal-baked model) agrees with the relational argmax doc-by-doc") {
    // mixed-signal corpus: class words plus shared noise, so scores are
    // non-trivial and ties possible — the strongest equivalence surface
    val df = (0 until 60).map { i =>
      val cls = if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C"
      val word = Map("A" -> "apple", "B" -> "banana", "C" -> "cherry")(cls)
      (i.toLong, s"$word shared shared ${if (i % 2 == 0) "even" else "odd"}", cls)
    }.toDF("doc_id", "text", "label")
    val model = Classify.nbFit(df, col("doc_id"), col("text"), col("label"),
      trainPermille = 800, vocabK = 8, corpusKey = "spec-nb-serve")
    // batch argmax per held-out doc = the confusion query's prd stage
    val servePred = df
      .filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 1000L) >= 800)
      .select(col("doc_id"), Classify.nbServe(col("text"), model).as("p"))
      .as[(Long, String)].collect().toMap
    assert(servePred.nonEmpty)
    // relational path: per-class counts over the confusion internals — use
    // the public confusion matrix to cross-check aggregate agreement, and
    // a hand NB to check three docs exactly
    val conf = Classify.nbConfusion(df, col("doc_id"), col("text"), col("label"),
      trainPermille = 800, vocabK = 8, corpusKey = "spec-nb-serve")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val serveConf = df
      .filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 1000L) >= 800)
      .select(col("label"), Classify.nbServe(col("text"), model).as("p"))
      .as[(String, String)].collect()
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(serveConf == conf, s"serve-side confusion $serveConf != relational $conf")
  }

  test("randomized cross-check: serve == relational on seeded random corpora (ties, empties, OOV)") {
    // the TemporalStreamSpec discipline: a seeded generator covering the
    // awkward strata — tiny vocab (forced ties), empty docs, docs that are
    // entirely OOV under a binding cap — and byte-equality between the
    // literal-baked serving column and the relational argmax on each
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val classes = Seq("A", "B", "C").take(2 + trial % 2)
      val vocab = Seq("t0", "t1", "t2", "t3", "t4")
      val docs = (0 until 50).map { i =>
        val cls = classes(rnd.nextInt(classes.size))
        val len = rnd.nextInt(6) // 0 ⇒ empty doc
        val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, text, cls)
      }
      val df = docs.toDF("doc_id", "text", "label")
      val key = s"spec-nb-rand-$trial"
      val vocabK = 2 + trial // binds for every trial (5 candidate tokens)
      val model = Classify.nbFit(df, col("doc_id"), col("text"), col("label"),
        trainPermille = 800, vocabK = vocabK, corpusKey = key)
      val conf = Classify.nbConfusion(df, col("doc_id"), col("text"), col("label"),
        trainPermille = 800, vocabK = vocabK, corpusKey = key)
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val serveConf = df
        .filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 1000L) >= 800)
        .select(col("label"), Classify.nbServe(col("text"), model).as("p"))
        .as[(String, String)].collect()
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      assert(serveConf == conf, s"trial $trial: serve $serveConf != relational $conf")
    }
  }

  test("nbServe scores token-free rows on priors with class-asc tiebreak") {
    val df = Seq(
      (1L, "x y", "B"), (2L, "x", "B"), (3L, "y", "A"), (4L, "x y", "A")
    ).toDF("doc_id", "text", "label")
    val model = Classify.nbFit(df, col("doc_id"), col("text"), col("label"),
      trainPermille = 800, vocabK = 4, corpusKey = "spec-nb-serve-empty")
    // equal priors (2 docs each) → empty text ties → class-asc picks A
    val out = spark.range(1).select(Classify.nbServe(lit("   "), model)).head().getString(0)
    assert(out == "A", s"prior tie must break to the ascending class, got $out")
  }

  test("ctfidfTerms ranks class-exclusive tokens above corpus-wide ones") {
    val df = Seq(
      ("c1", "alpha alpha common"),
      ("c1", "alpha common"),
      ("c2", "beta beta common"),
      ("c2", "beta common")
    ).toDF("cls", "text")
    val out = Classify
      .ctfidfTerms(df, col("cls"), col("text"), vocabK = 16, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(out.contains(("c1", 1L, "alpha")) && out.contains(("c2", 1L, "beta")), s"$out")
    // 'common' appears in every class: idf = ln(3/2) > 0 but below the
    // exclusives' ln(3/1); it may appear at rank 2, never rank 1
    assert(!out.contains(("c1", 1L, "common")) && !out.contains(("c2", 1L, "common")))
  }

  test("ctfidfTerms vocab cap excludes sub-threshold tokens deterministically") {
    val df = Seq(
      ("c1", "hot hot hot rare"),
      ("c2", "hot hot hot warm warm")
    ).toDF("cls", "text")
    // global counts: hot=6, warm=2, rare=1 → vocabK=2 keeps {hot, warm}
    val out = Classify
      .ctfidfTerms(df, col("cls"), col("text"), vocabK = 2, topK = 5)
      .collect().map(r => r.getString(2)).toSeq
    assert(!out.contains("rare"), s"capped-out token leaked into the ranking: $out")
    assert(out.toSet == Set("hot", "warm"))
  }
}
