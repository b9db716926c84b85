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

  /** LAYOUT TIME — paid once: persist one side as a parquet table
    * bucketed+sorted on `key`. Both sides of a future join must use the
    * SAME bucket count for exchange-free planning.
    */
  def layout(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    require(buckets > 0, "buckets must be positive")
    graft.sources.Sources.writeBucketed(df, table, buckets, key)
  }

  /** QUERY TIME — paid per join, no shuffle and no write: join two tables
    * previously laid out by [[layout]] with matching bucket counts on
    * `key`. This is the call a recurring job repeats; the layout shuffle
    * is amortized over every invocation.
    */
  def joinBucketed(s: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    s.table(leftTable).join(s.table(rightTable), key)

  /** Convenience compose of [[layout]] ×2 + [[joinBucketed]] for one-shot
    * use. A RECURRING join should call [[layout]] once and [[joinBucketed]]
    * per query instead — this form re-pays the layout shuffle on every
    * invocation. `tag` namespaces the catalog tables so concurrent queries
    * don't collide.
    */
  def bucketedEquiJoin(
      s: SparkSession,
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      tag: String
  ): DataFrame = {
    val lt = s"graft_bkt_${tag}_l"
    val rt = s"graft_bkt_${tag}_r"
    layout(left, lt, buckets, key)
    layout(right, rt, buckets, key)
    joinBucketed(s, lt, rt, key)
  }
}
