package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-layout maintenance: the compaction / bin-packing pass a lakehouse
  * runs after changelog applies (ops/ChangeOps) or streaming appends leave
  * a partitioned table as thousands of small files. Small files poison a
  * 100 TB table twice — listing/open cost per scan task, and per-file
  * footer/rowgroup overhead that starves the columnar reader — so the
  * standard maintenance loop is: apply changes, then periodically rewrite
  * each partition's files into target-size bins. Clustering within a file
  * is ZOrderOps' job; this operator only fixes file GRANULARITY, never
  * content: the rewrite is required to be a content-identical bijection of
  * rows, which is what makes it safe to run online against readers.
  */
object LayoutOps {

  /** Rewrite the partitioned parquet layout at `inPath` into `outPath`:
    * same partition directories, same rows, but ~`targetRowsPerFile` rows
    * per file (the writer's own `maxRecordsPerFile` enforces the cap, so
    * a file can only be SMALLER than target at a partition/salt-group
    * tail, never larger). Callers compact into a fresh path and swap —
    * the atomic-publish discipline every table format uses.
    *
    * File-count contract: rows of one partition value route to
    * `ceil(rows_p / maxRowsPerTask)` salt groups (one shuffle, keyed on
    * (partition, salt) so AQE can place them); each group writes
    * `ceil(group_rows / targetRowsPerFile)` files. With the default
    * `maxRowsPerTask` (8× target) a small-to-medium partition is a single
    * group and the count is EXACTLY `ceil(rows_p / target)`; an
    * over-sized partition splits across groups for write parallelism and
    * pays at most `n_groups − 1` extra tail files — bounded slack, never
    * a return to small-files. Row counts (not byte sizes) drive the plan
    * so it needs one partial-agg'd aggregate over the data, no
    * driver-side file listing; the rows↔bytes ratio is the caller's
    * schema knowledge.
    *
    * Scale shape: one count aggregate (|partitions| rows, broadcast
    * back), one shuffle of the data on (partition, salt), zero driver
    * loops — the whole pass is two jobs regardless of partition count.
    * Determinism: the salt is a hash of the full row, so the file
    * assignment (and the compacted layout) replays identically.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      partCol: String,
      targetRowsPerFile: Long,
      maxRowsPerTask: Long = 0L
  ): Unit = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val perTask = if (maxRowsPerTask > 0) maxRowsPerTask else 8L * targetRowsPerFile
    require(perTask >= targetRowsPerFile, "maxRowsPerTask must be >= targetRowsPerFile")
    val df = spark.read.parquet(inPath)
    val plan = broadcast(
      df.groupBy(col(partCol))
        .agg(ceil(count(lit(1)).cast("double") / perTask).cast("long").as("__nsalt")))
    val dataCols = df.columns.map(col).toSeq
    df.join(plan, Seq(partCol))
      .withColumn("__salt", pmod(xxhash64(struct(dataCols: _*)), greatest(col("__nsalt"), lit(1L))))
      .repartition(col(partCol), col("__salt"))
      .select(dataCols: _*)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy(partCol)
      .parquet(outPath)
  }

  /** File-level statistics manifest of a parquet layout — the per-data-file
    * (row count, min, max) stats a lakehouse table format (Delta's
    * AddFile stats, Iceberg's manifest entries) maintains, computed
    * RELATIONALLY: one distributed scan grouped by `input_file_name()`,
    * partial-agg'd map-side so each task emits one row per file it read —
    * no driver-side file listing, no footer probing loop. The result is
    * metadata-scale (one row per file) and is what [[skippingScan]]
    * prunes against; a real deployment persists it next to the table and
    * maintains it incrementally on append/compact.
    *
    * @param statCols columns to keep min/max for (the table's natural
    *                 clustering/predicate columns)
    * @return one row per file: (file, n_rows, min_c..., max_c...)
    */
  def manifest(spark: SparkSession, path: String, statCols: Seq[String]): DataFrame =
    manifestOf(spark.read.parquet(path), statCols)

  /** [[manifest]] over an already-scoped scan (a file subset, a fresh
    * append batch) — the building block incremental maintenance reuses.
    */
  def manifestOf(df: DataFrame, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "statCols must not be empty")
    val aggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** INCREMENTAL manifest maintenance — the reason a manifest beats
    * re-deriving stats per query: after an append/compaction cycle, scan
    * ONLY the files the prior manifest doesn't know and union their stats
    * in. New-file discovery is a driver-side LISTING diff (file listing is
    * metadata, the same class as the lakehouse transaction log read);
    * the DATA scan is strictly the fresh files. Paths are compared
    * URI-normalized so `file:///x` and `file:/x` spellings never cause a
    * double-count. With no fresh files the prior manifest returns as-is.
    */
  def manifestAppend(
      spark: SparkSession,
      path: String,
      prior: DataFrame,
      statCols: Seq[String]
  ): DataFrame = {
    def norm(s: String) =
      try new java.net.URI(s).getPath
      catch { case _: Exception => s }
    val known = prior.select(col("file")).collect().map(r => norm(r.getString(0))).toSet
    val fresh = spark.read.parquet(path).inputFiles.filterNot(f => known.contains(norm(f)))
    if (fresh.isEmpty) prior
    else prior.unionByName(manifestOf(spark.read.parquet(fresh.toIndexedSeq: _*), statCols))
  }

  /** Data-skipping scan: answer `statCol BETWEEN lo AND hi` reading ONLY
    * the files whose manifest [min, max] range can intersect it — the
    * scan-time half of lakehouse data skipping, the file-granularity
    * complement of partition pruning (S10) for predicates on columns the
    * layout is clustered but not partitioned by. On a 100 TB table whose
    * files are range-clustered on `statCol` this turns a full scan into
    * opening a handful of files; the residual filter still applies inside
    * them, so correctness never depends on manifest tightness.
    *
    * The manifest probe `.collect()`s the surviving FILE LIST — bounded
    * metadata (one row per qualifying file), the same driver-side planning
    * step every lakehouse reader performs, never data-proportional. A
    * file whose stat column is entirely NULL has null min/max and is
    * skipped: null never satisfies a range predicate, so dropping the
    * file cannot lose a qualifying row.
    */
  def skippingScan(
      spark: SparkSession,
      path: String,
      manifestDF: DataFrame,
      statCol: String,
      lo: Long,
      hi: Long
  ): DataFrame = {
    val files = manifestDF
      .filter(col(s"max_$statCol") >= lo && col(s"min_$statCol") <= hi)
      .select(col("file"))
      .collect() // metadata-scale: one row per surviving file
      .map(_.getString(0))
    val residual = col(statCol) >= lo && col(statCol) <= hi
    if (files.isEmpty)
      // no file can contain a match; keep the schema, read nothing
      spark.read.parquet(path).filter(lit(false))
    else
      spark.read.parquet(files.toIndexedSeq: _*).filter(residual)
  }

  /** File-level hash-bucket index — the EQUALITY-predicate complement of
    * [[manifest]]'s min/max ranges (a point lookup on a high-cardinality
    * key gets nothing from min/max unless the layout is key-clustered;
    * this is the Delta/Parquet "bloom filter index" idea in exact
    * relational form): each file's posting list of occupied md5 buckets,
    * `(file, bucket)` distinct rows, ≤ `buckets` rows per file. One
    * distributed scan, map-side distinct, no driver listing; membership
    * is EXACT on buckets (no bit packing), so the only false positives
    * are genuine bucket collisions — cost extra file reads, never
    * correctness ([[pointLookupScan]] keeps the residual filter).
    */
  def bucketIndex(spark: SparkSession, path: String, keyCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    spark.read.parquet(path)
      .select(
        input_file_name().as("file"),
        Hashing.md5Mod(col(keyCol).cast("string"), buckets.toLong).as("bucket"))
      .distinct()
  }

  /** Point-lookup scan: answer `keyCol IN (keys)` opening only files whose
    * [[bucketIndex]] posting list contains at least one probed bucket.
    * The probe is relational — a broadcast join of the (tiny) key list
    * against the index — and the surviving FILE LIST collect is bounded
    * metadata, the lakehouse reader's planning step. Files are then read
    * with the exact residual `IN` filter, so index collisions can only
    * cost I/O. A key hashing to a bucket no file contains reads nothing.
    */
  def pointLookupScan(
      spark: SparkSession,
      path: String,
      index: DataFrame,
      keyCol: String,
      keys: Seq[Long],
      buckets: Int = 4096
  ): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    import spark.implicits._
    val probe = keys.toDF("__k")
      .select(Hashing.md5Mod(col("__k").cast("string"), buckets.toLong).as("bucket"))
      .distinct()
    val files = index
      .join(broadcast(probe), Seq("bucket"))
      .select(col("file"))
      .distinct()
      .collect() // metadata-scale: one row per candidate file
      .map(_.getString(0))
    val residual = col(keyCol).isin(keys: _*)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).filter(residual)
  }

  /** Per-partition file census of a partitioned parquet layout — the
    * before/after observability for [[compact]]: one row per partition
    * directory with its data-file count. Driver-side listing on purpose:
    * partition count is bounded metadata (the same scale class as a
    * catalog listing), never data-proportional.
    */
  def fileCensus(spark: SparkSession, path: String, partCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val root = new java.io.File(path)
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(partCol + "="))
      .map { d =>
        val files = Option(d.listFiles()).getOrElse(Array.empty)
          .count(f => f.isFile && f.getName.endsWith(".parquet"))
        (d.getName.substring(partCol.length + 1), files.toLong)
      }
      .toSeq
    spark.createDataFrame(parts.map(p => org.apache.spark.sql.Row(p._1, p._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(partCol, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_files", org.apache.spark.sql.types.LongType))))
  }
}
