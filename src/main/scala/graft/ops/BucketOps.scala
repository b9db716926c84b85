package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located (bucketed) joins — the fact-to-fact join shape at 100 TB
  * when neither side broadcasts: persist both sides bucketed AND sorted on
  * the join key, and the sort-merge join reads bucket i against bucket i
  * with NO exchange and NO sort in the join stage. The shuffle is paid
  * once at layout time and amortized over every subsequent join on that
  * key (the classic warehouse layout decision, not a per-query one).
  */
object BucketOps {

  /** Write both sides as parquet tables bucketed+sorted on `key` (same
    * bucket count — required for exchange-free planning), then join the
    * bucketed tables back on `key`. `tag` namespaces the catalog tables so
    * concurrent queries don't collide.
    */
  def bucketedEquiJoin(
      s: SparkSession,
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      tag: String
  ): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val lt = s"graft_bkt_${tag}_l"
    val rt = s"graft_bkt_${tag}_r"
    graft.sources.Sources.writeBucketed(left, lt, buckets, key)
    graft.sources.Sources.writeBucketed(right, rt, buckets, key)
    s.table(lt).join(s.table(rt), key)
  }
}
