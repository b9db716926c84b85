package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) record linkage — the approximate-match join the
  * reference's address-dedupe chain gestures at (smartfile canon +
  * 7-key anti-dedupe catch exact variants; this family catches typos).
  *
  * Shape: pigeonhole SEGMENT BLOCKING + exact `levenshtein` verify —
  * the PassJoin/Ed-Join family's candidate generator re-expressed as an
  * ordinary Spark equi-join. Each string splits into `maxDist + 1`
  * contiguous segments at integer-division boundaries (the same
  * engine-replayable boundary formula the audio envelope frames use);
  * candidates are pairs agreeing on at least one (segment index,
  * segment value); every candidate is verified with the full edit
  * distance.
  *
  * Recall guarantee (pigeonhole): two EQUAL-LENGTH strings within
  * substitution distance ≤ maxDist differ in ≤ maxDist positions, so at
  * least one of the maxDist+1 segments is untouched on both sides and
  * they collide on it. UNEQUAL lengths segment on different grids and
  * collide only coincidentally — length-changing edits are largely
  * MISSED (spec-pinned). This targets substitution-dominant domains
  * (typos in fixed-format keys: PINs, normalized addresses, hashes);
  * for indel-heavy matching, block on q-gram sets instead.
  *
  * Scale shape — the text-LSH pair plan in edit-distance space:
  * segments explode map-side (maxDist+1 rows per record), ONE shuffle
  * clusters each block, the self-join's two sides reuse that exchange,
  * and a `maxBlock` cap quarantines degenerate blocks (constant
  * prefixes) exactly like the MinHash-LSH `maxBucket` cap — candidate
  * count is Σ block², never |corpus|². The verify is per-candidate
  * `levenshtein` (codegen'd built-in), and `distinct` on the id pair
  * dedupes multi-segment agreement before verification so each pair is
  * verified once.
  */
object FuzzyOps {

  /** (id, segment index, segment value, full string) — one row per
    * segment of every record; blocks are (seg_i, seg) groups.
    */
  private def segmented(df: DataFrame, idCol: Column, strCol: Column, nseg: Int): DataFrame =
    df.select(idCol.as("id"), strCol.as("s"))
      .withColumn("seg_i", explode(array((0 until nseg).map(lit): _*)))
      // seg i of length-L string = substr [i·L div n, (i+1)·L div n) —
      // exact integer boundaries both engines replay token-for-token
      .withColumn(
        "seg",
        expr(s"substring(s, (seg_i * length(s)) div $nseg + 1," +
          s" ((seg_i + 1) * length(s)) div $nseg - (seg_i * length(s)) div $nseg)"))

  /** Self-join near-match pairs: (id_lo, id_hi, dist) for every pair of
    * records with `levenshtein ≤ maxDist` that shares at least one
    * segment block of size ≤ `maxBlock`.
    */
  def editBlockedPairs(
      df: DataFrame,
      idCol: Column,
      strCol: Column,
      maxDist: Int,
      maxBlock: Int
  ): DataFrame = {
    require(maxDist >= 1, "maxDist must be at least 1")
    require(maxBlock > 1, "maxBlock must allow at least a pair")
    val segs = segmented(df, idCol, strCol, maxDist + 1)
    val sized = segs.join(
      segs.groupBy(col("seg_i"), col("seg")).agg(count(lit(1)).as("__bn")),
      Seq("seg_i", "seg"))
      .filter(col("__bn") <= maxBlock)
    val lo = sized.select(col("seg_i"), col("seg"), col("id").as("id_lo"), col("s").as("s_lo"))
    val hi = sized.select(col("seg_i"), col("seg"), col("id").as("id_hi"), col("s").as("s_hi"))
    lo.join(hi, Seq("seg_i", "seg"))
      .filter(col("id_lo") < col("id_hi"))
      .select(col("id_lo"), col("id_hi"), col("s_lo"), col("s_hi"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_lo"), col("s_hi")))
      .filter(col("dist") <= maxDist)
      .select(col("id_lo"), col("id_hi"), col("dist"))
  }

  /** The quarantine report: blocks larger than `maxBlock` (with sizes),
    * i.e. where [[editBlockedPairs]] recall was traded away — the same
    * honesty contract as the LSH `oversizedBuckets` report.
    */
  def oversizedBlocks(
      df: DataFrame,
      idCol: Column,
      strCol: Column,
      maxDist: Int,
      maxBlock: Int
  ): DataFrame =
    segmented(df, idCol, strCol, maxDist + 1)
      .groupBy(col("seg_i"), col("seg"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBlock)
}
