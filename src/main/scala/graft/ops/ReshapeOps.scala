package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-expansion, reshape and window operators (SURVEY.md §2.4/2.5/2.8).
  *
  * Order-sensitivity is the reference's central semantic trap (§7.4): pandas
  * carries incidental row order, Spark does not. Every operator here makes
  * ordering explicit — positions come from `posexplode`, per-group picks and
  * numbering take a caller-supplied deterministic sort key.
  */
object ReshapeOps {

  /** X1: split a separator-joined multi-value column, first-occurrence
    * dedupe, explode one row per value with its 1-based position; rows with a
    * null list survive as a single row with null value/position
    * (chicago/permit_cleaning.py:557-611). `posexplode_outer` folds the
    * reference's three steps (NA split-off P9, cumcount W1, explode) into one
    * generator — no shuffle at all, scales linearly with input.
    *
    * @return df with `valueCol` (one split element) and `posCol` (1-based)
    */
  def explodeDelimited(
      df: DataFrame,
      listCol: Column,
      sep: String,
      valueCol: String,
      posCol: String
  ): DataFrame =
    df.select(
      col("*"),
      posexplode_outer(array_distinct(split(listCol, sep)))
        .as(Seq(posCol, valueCol))
    ).withColumn(posCol, col(posCol) + lit(1))

  /** X2: unpivot wide value columns to (variable, value) long form, dropping
    * null values — dplyr `pivot_longer` + `values_drop_na`
    * (chicago/legacy_permits/helper.R:40-62).
    */
  def unpivotWide(
      df: DataFrame,
      idCols: Seq[String],
      valueCols: Seq[String],
      variableColumnName: String,
      valueColumnName: String
  ): DataFrame =
    df.unpivot(
        idCols.map(col).toArray,
        valueCols.map(col).toArray,
        variableColumnName,
        valueColumnName
      )
      .filter(col(valueColumnName).isNotNull)

  /** P2: ensure-columns — add any missing column as null, then project the
    * fixed contract order (helper.R:85-90 ensure_columns; the py twin is the
    * assign/reindex in organize_columns, permit_cleaning.py:650-663).
    */
  def ensureColumns(df: DataFrame, contract: Seq[String]): DataFrame =
    df.select(contract.map { c =>
      (if (df.columns.contains(c)) col(c) else lit(null).cast("string")).as(c)
    }: _*)

  /** A1: order-preserving distinct group-concat — for each key, the group's
    * values joined by `", "` in first-occurrence order of `orderKey`
    * (chicago/permit_cleaning.py:754-759: pandas `unique()` preserves
    * first-occurrence order; we pin that order explicitly via `orderKey`
    * since Spark partitions destroy incidental order).
    *
    * Single hash-aggregate: collect (orderKey, value) structs, sort the
    * array per group (driver-free, per-row), project values, distinct, join.
    */
  def groupConcatDistinct(
      df: DataFrame,
      groupCols: Seq[Column],
      valueCol: Column,
      orderKey: Column,
      outName: String
  ): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(
        array_join(
          array_distinct(
            transform(
              array_sort(collect_list(struct(orderKey.as("k"), valueCol.as("v")))),
              x => x.getField("v")
            )
          ),
          ", "
        ).as(outName)
      )

  /** A5: duplicate-key flag — true on *all* members of groups with more than
    * one row (pandas `duplicated(keep=False)`, helper.py:151-153). One
    * window aggregate, shuffles once on the keys.
    */
  def dupFlag(df: DataFrame, keys: Seq[String], outName: String): DataFrame =
    df.withColumn(
      outName,
      count(lit(1)).over(Window.partitionBy(keys.map(col): _*)) > 1
    )

  /** A6/O4: first row per group under an explicit deterministic order
    * (dplyr `group_by %>% slice(1)`,
    * chicago/legacy_permits/2021/format_legacy_2021.R:48-56 — the reference
    * relies on incoming sheet order; we require a real sort key, SURVEY §7.4).
    */
  def firstPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn(
        "__rn",
        row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*))
      )
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Per-group top-k rows WITHOUT the per-group sort: the window
    * formulation (`row_number ≤ k`) sorts every group's whole row set in
    * the shuffle; this delegates to the bounded-heap
    * [[graft.ops.agg.TopKHeap]] aggregator, whose state is ≤ k entries
    * per group and whose partials merge map-side — a hot group costs
    * O(n·log k) admissions spread across map tasks, not an n·log n
    * reducer sort. Greatest (value, id) wins; the id tiebreak totalizes
    * the order, so ranks are deterministic under any partitioning.
    *
    * @return (grp, rank 1..k descending by value, value, id)
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      idCol: Column,
      k: Int
  ): DataFrame =
    df.groupBy(groupCol.as("grp"))
      .agg(graft.ops.agg.TopKHeap.column(k)(valueCol.cast("long"), idCol.cast("long")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(
        col("grp"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("value"),
        col("col._2").as("id"))

  /** W2 + S8: global 1..n numbering under `order`, bucketed into chunks of
    * `chunk` rows, renumbered 1..chunk within each bucket (legacy 250-row
    * upload batches, format_reviewed_permits_for_upload.py:214-216,:279-299;
    * `# [LLINE]` helper.py:167,171).
    *
    * NOTE 100 TB stance: the global `row_number` over an empty partition
    * spec serializes through a single task — acceptable only because the
    * reference semantics demand a single global sequence over what is by
    * construction a reviewer-scale (≤ a few 100k rows) output. For bulk data
    * use `bucketByHash` style partitioning instead.
    */
  def numberedBuckets(
      df: DataFrame,
      order: Seq[Column],
      chunk: Int,
      bucketCol: String,
      lineCol: String
  ): DataFrame = {
    val w = Window.orderBy(order: _*)
    df.withColumn("__gn", row_number().over(w))
      .withColumn(bucketCol, floor((col("__gn") - 1) / chunk).cast("long"))
      .withColumn(lineCol, ((col("__gn") - 1) % chunk + 1).cast("long"))
      .drop("__gn")
  }

  /** The 100 TB-safe [[numberedBuckets]] alternative: when the sink needs
    * stable bucket/line addressing but NOT one global 1..n sequence, assign
    * the bucket by CONTENT hash of the row's key columns and number rows
    * within each bucket under `order`. Every bucket numbers independently,
    * so the work distributes across `nBuckets` window partitions instead of
    * serializing the whole dataset through a single task's sort.
    *
    * The bucket hash is the first 8 hex chars of md5(keys) mod `nBuckets` —
    * a construction any SQL engine reproduces (no engine-private hash), so
    * results stay oracle-comparable and stable across engines/restarts.
    * Keys joined with the \\u0001 unit separator so ("ab","c") and ("a","bc") cannot collide.
    */
  def numberedBucketsDistributed(
      df: DataFrame,
      keys: Seq[Column],
      order: Seq[Column],
      nBuckets: Int,
      bucketCol: String,
      lineCol: String
  ): DataFrame = {
    val bucket = Hashing.md5Mod(concat_ws("\u0001", keys: _*), nBuckets.toLong)
    df.withColumn(bucketCol, bucket)
      .withColumn(
        lineCol,
        row_number().over(Window.partitionBy(col(bucketCol)).orderBy(order: _*)).cast("long")
      )
  }
}
