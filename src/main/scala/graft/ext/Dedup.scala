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
    */
  def minhashSignature(gramsCol: Column, k: Int): Column = {
    require(k % 4 == 0, s"k must be a multiple of 4, got $k")
    val perms = for {
      s <- 0 until k / 4 // salt index
      w <- 0 until 4     // 8-hex-char window within md5
    } yield (s, w)
    array(
      perms.map { case (s, w) =>
        array_min(
          transform(
            gramsCol,
            g => {
              val h = if (s == 0) md5(g) else md5(concat(g, lit("#" + s)))
              substring(h, w * 8 + 1, 8)
            }
          )
        )
      }: _*
    )
  }

  /** MinHash + LSH banding: candidate near-duplicate pairs.
    *
    * Pipeline: per-row signature (map-only) → explode `bands` rows/doc →
    * group by (band, band-hash) bucket → pairs within bucket → distinct.
    * Shuffle volume is `bands × corpus`, never O(n²); bucket sizes stay
    * small for non-pathological corpora and AQE handles stragglers.
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
    val sig = df.select(idCol.as("id"), minhashSignature(wordShingles(textCol, n), k).as("sig"))
    val banded = sig.select(
      col("id"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b =>
            md5(
              array_join(slice(col("sig"), b * rows + 1, lit(rows)), "|")
            )
        )
      ).as(Seq("band", "bh"))
    )
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_lo"), col("b.id").as("id_hi"))
      .distinct()
  }

  /** 32-bit SimHash over word tokens. Bit i of the fingerprint is the sign
    * of the sum over tokens of ±1, where the vote is bit (i mod 4) of hex
    * digit (i div 4) of md5(token). Pure per-row array algebra: fingerprints
    * are computed map-side; grouping equal fingerprints finds near-dups.
    */
  def simhash32(textCol: Column): Column = {
    val tokens = array_distinct(split(trim(textCol), "\\s+"))
    val hexes = transform(tokens, t => md5(t))
    val bitContribs = (0 until 32).map { i =>
      val digitIdx = i / 4 // hex char position 0..7
      val bitIdx = i % 4   // bit within that hex digit
      val s = aggregate(
        hexes,
        lit(0L),
        (acc, h) => {
          val v = conv(substring(h, digitIdx + 1, 1), 16, 10).cast("long")
          acc + when(shiftright(v, bitIdx) % 2 === 1, lit(1L)).otherwise(lit(-1L))
        }
      )
      when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitContribs.reduce(_ + _)
  }

  /** N-gram Jaccard similarity between two shingle arrays (exact
    * verification stage after LSH candidates; |A∩B| / |A∪B| as double).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }
}
