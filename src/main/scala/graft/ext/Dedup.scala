package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale dedup operators for training-data pipelines (north-star
  * extensions, SURVEY.md §7.5). Generalizes the reference's exact anti-join
  * dedupe (chicago/permit_cleaning.py:838-883) to content-similarity dedup.
  *
  * Scale design: every variant is shuffle-bounded by the *candidate* set —
  * exact and near-dup both group on a short digest/bucket key, never pairwise
  * over the corpus. MinHash-LSH candidate generation is the 100 TB path:
  * signatures are computed per-row (map-side, no shuffle), and only band
  * buckets shuffle.
  */
object Dedup {

  /** Exact dedup: group identical `textCol` content by md5 digest, keep the
    * lowest id as canonical. Output one row per distinct content with the
    * survivor id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("digest"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Word n-gram shingles (distinct, first-occurrence order). Built per-row
    * with array higher-order functions — no explode, no shuffle.
    */
  def wordShingles(textCol: Column, n: Int): Column = {
    val words = split(trim(textCol), "\\s+")
    val count = greatest(size(words) - (n - 1), lit(1))
    // try_element_at: out-of-range indices (docs shorter than n words) yield
    // null, which concat_ws skips — ANSI-mode safe.
    array_distinct(
      transform(
        sequence(lit(0), count - 1),
        i => concat_ws(" ", (0 until n).map(j => try_element_at(words, i + j + 1)): _*)
      )
    )
  }

  /** MinHash signature as `k` hex-string minima. Permutation hashes are
    * non-overlapping 8-hex-char (32-bit) windows of md5(gram) and
    * md5(gram || "#s") salts — fixed-width lowercase hex, so lexicographic
    * MIN == numeric MIN, and the same construction is expressible in any SQL
    * oracle without a shared integer hash function. k must be a multiple
    * of 4 (4 windows per md5).
    *
    * Convenience single-Column form; the staged [[minhashSignatures]] is the
    * scale path (it keeps each expensive intermediate a real attribute so
    * Catalyst's CollapseProject cannot inline-duplicate the shingle/md5
    * subtrees into every permutation lambda).
    */
  def minhashSignature(gramsCol: Column, k: Int): Column = {
    require(k % 4 == 0, s"k must be a multiple of 4, got $k")
    sigFromHexes((0 until k / 4).map(s => transform(gramsCol, g => saltedMd5(g, s))))
  }

  private def saltedMd5(g: Column, salt: Int): Column =
    if (salt == 0) md5(g) else md5(concat(g, lit("#" + salt)))

  /** k minima from the per-salt md5 arrays: 4 non-overlapping 8-char windows
    * per salt, window minima taken over cheap substring-of-attribute lambdas.
    */
  private def sigFromHexes(hexCols: Seq[Column]): Column =
    array(hexCols.flatMap { hc =>
      (0 until 4).map(w => array_min(transform(hc, h => substring(h, w * 8 + 1, 8))))
    }: _*)

  /** Staged signature pipeline: id + `sig` (array of k hex minima).
    *
    * Each stage materializes its intermediate as a named attribute in its own
    * projection. CollapseProject refuses to merge projections whose producer
    * expressions are non-cheap and consumed more than once, so the regex
    * `split`, the shingle build, and each md5 pass are evaluated exactly once
    * per row — the naive single-expression form re-evaluates the split
    * 3×n×k times per row via lambda inlining (measured 150s → <2s at sf0.1).
    */
  def minhashSignatures(df: DataFrame, idCol: Column, textCol: Column, n: Int, k: Int): DataFrame = {
    require(k % 4 == 0, s"k must be a multiple of 4, got $k")
    val salts = 0 until k / 4
    df.select(idCol.as("id"), split(trim(textCol), "\\s+").as("words"))
      .select(col("id"), gramsFromWords(col("words"), n).as("grams"))
      .select(
        col("id") +:
          salts.map(s => transform(col("grams"), g => saltedMd5(g, s)).as(s"hex$s")): _*
      )
      .select(col("id"), sigFromHexes(salts.map(s => col(s"hex$s"))).as("sig"))
  }

  /** Distinct word n-grams from a pre-split `words` attribute (cheap lambda
    * body: element_at over an attribute reference).
    */
  private def gramsFromWords(words: Column, n: Int): Column = {
    val count = greatest(size(words) - (n - 1), lit(1))
    array_distinct(
      transform(
        sequence(lit(0), count - 1),
        i => concat_ws(" ", (0 until n).map(j => try_element_at(words, i + j + 1)): _*)
      )
    )
  }

  /** Staged shingle pipeline: id + distinct n-gram array, split evaluated
    * once per row (see [[minhashSignatures]] for why staging matters).
    */
  def shingled(df: DataFrame, idCol: Column, textCol: Column, n: Int): DataFrame =
    df.select(idCol.as("doc_id"), split(trim(textCol), "\\s+").as("words"))
      .select(col("doc_id"), gramsFromWords(col("words"), n).as("grams"))

  /** MinHash + LSH banding: candidate near-duplicate pairs.
    *
    * Pipeline: staged per-row signature (map-only, single pass) → explode
    * `bands` rows/doc → group by (band, band-hash) bucket collecting the
    * sorted id set → in-bucket pair generation with array HOFs → distinct.
    * One shuffle for the bucket groupBy + one for the distinct; signatures
    * are computed exactly once (no self-join recompute). Shuffle volume is
    * `bands × corpus`, never O(n²). Pathologically hot buckets (boilerplate
    * corpora) are the known LSH skew risk — cap/salt upstream if observed.
    *
    * @param n     word-shingle width
    * @param k     minhash permutations (multiple of 4)
    * @param bands LSH bands (k / bands rows per band)
    * @return (id_lo, id_hi) candidate pairs, id_lo < id_hi
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      n: Int = 3,
      k: Int = 8,
      bands: Int = 4
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sig = minhashSignatures(df, idCol, textCol, n, k)
    val banded = sig.select(
      col("id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => md5(array_join(slice(col("sig"), b * rows + 1, lit(rows)), "|"))
        )
      ).as(Seq("band", "bh"))
    )
    banded
      .groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_set(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(
        explode(
          flatten(
            transform(
              col("ids"),
              (x, i) =>
                transform(
                  slice(col("ids"), i + 2, greatest(size(col("ids")) - i - 1, lit(0))),
                  y => struct(x.as("id_lo"), y.as("id_hi"))
                )
            )
          )
        ).as("p")
      )
      .select(col("p.id_lo").as("id_lo"), col("p.id_hi").as("id_hi"))
      .distinct()
  }

  /** 32-bit SimHash over word tokens. Bit i of the fingerprint is the sign
    * of the sum over tokens of ±1, where the vote is bit (i mod 4) of hex
    * digit (i div 4) of md5(token). Pure per-row array algebra: fingerprints
    * are computed map-side; grouping equal fingerprints finds near-dups.
    *
    * Convenience single-Column form — the 32 bit-sums each re-evaluate the
    * md5 transform when inlined. [[simhashed]] is the scale path.
    */
  def simhash32(textCol: Column): Column = {
    val tokens = array_distinct(split(trim(textCol), "\\s+"))
    val h32 = transform(tokens, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
    simhashFromH32(h32)
  }

  /** Fingerprint from a per-token array of 32-bit hash values (the first 8
    * hex chars of md5(token) as a long). Bit (4*(7-digit)+bit) of the hash
    * IS the vote for fingerprint bit i = digit*4 + bit — same bit layout as
    * the hex-digit formulation above.
    */
  private def simhashFromH32(h32: Column): Column =
    (0 until 32).map { i =>
      val digitIdx = i / 4
      val bitIdx = i % 4
      val shift = 4 * (7 - digitIdx) + bitIdx
      val s = aggregate(
        h32,
        lit(0L),
        (acc, v) => acc + when(shiftright(v, shift) % 2 === 1, lit(1L)).otherwise(lit(-1L))
      )
      when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Staged SimHash pipeline: one md5 pass per token materialized as an
    * attribute, then the 32 bit-sums run shift arithmetic over it — the
    * single-expression form re-evaluates the md5 transform 32× per row once
    * CollapseProject inlines it (measured 5.7s → <1s at sf0.1).
    */
  def simhashed(df: DataFrame, idCol: Column, textCol: Column, outName: String = "fp"): DataFrame =
    df.select(idCol.as("id"), array_distinct(split(trim(textCol), "\\s+")).as("toks"))
      .select(
        col("id"),
        transform(col("toks"), t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")).as("h32")
      )
      .select(col("id"), simhashFromH32(col("h32")).as(outName))

  /** N-gram Jaccard similarity between two shingle arrays (exact
    * verification stage after LSH candidates; |A∩B| / |A∪B| as double).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Streaming exact dedup: keep the first occurrence of each content
    * digest in an event-time stream. State is the digest set within the
    * watermark horizon — `dropDuplicatesWithinWatermark` evicts state for
    * digests older than the watermark, so memory is bounded by the horizon's
    * arrival rate instead of the full stream history (the streaming twin of
    * [[exact]]; a training-data ingest pipeline dedupes its firehose this
    * way).
    */
  def streamingExactDedup(
      stream: DataFrame,
      textCol: Column,
      tsCol: String,
      watermark: String
  ): DataFrame =
    stream
      .withColumn("__digest", md5(textCol))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Embedding-cosine near-duplicate pairs: SRP-bucket the vectors (see
    * [[Similarity.srpBucket]]), generate candidate pairs within each bucket,
    * keep pairs with cosine ≥ `threshold`. The bucket groupBy is the only
    * corpus-wide shuffle — candidate volume is Σ bucket² instead of n², the
    * same scale shape as [[minhashLshPairs]]. Approximate: near-dups split
    * across buckets are missed (raise `planes` ↔ recall tradeoff).
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      dim: Int,
      planes: Int,
      threshold: Double
  ): DataFrame = {
    // norms are staged per VECTOR before pair generation — computing them
    // inside the pair lambda would redo each one once per candidate pair
    val bucketed = df
      .select(idCol.as("id"), vecCol.as("vec"), Similarity.srpBucket(vecCol, dim, planes).as("bucket"))
      .select(col("id"), col("vec"), col("bucket"), Similarity.norm(col("vec")).as("nrm"))
    bucketed
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(struct(col("id"), col("vec"), col("nrm")))).as("items"))
      .filter(size(col("items")) > 1)
      .select(
        explode(
          flatten(
            transform(
              col("items"),
              (x, i) =>
                transform(
                  slice(col("items"), i + 2, greatest(size(col("items")) - i - 1, lit(0))),
                  y => struct(
                    x.getField("id").as("id_lo"),
                    y.getField("id").as("id_hi"),
                    (Similarity.dot(x.getField("vec"), y.getField("vec")) /
                      (x.getField("nrm") * y.getField("nrm"))).as("sim")
                  )
                )
            )
          )
        ).as("p")
      )
      .select(col("p.id_lo").as("id_lo"), col("p.id_hi").as("id_hi"),
        round(col("p.sim"), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }
}
