package graft.ext

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Index-maintenance policy operator: every decision branch pinned, plus
  * the census derivations against real lifecycle tables — including the
  * file-amplification branch the DuckDB oracle cannot check (Spark's
  * bucket hash is not portable), which lives ONLY here.
  */
class MaintenanceSpec extends SparkSpecBase {
  import spark.implicits._

  private def census(
      name: String,
      docs: Long,
      tombs: Long,
      eras: Long,
      drift: Long,
      files: Option[Long] = None
  ) = {
    val base = Seq((name, docs, tombs, eras, drift))
      .toDF("index_name", "index_docs", "tomb_entries", "append_eras", "drift_ppm")
    files.fold(base)(f => base.withColumn("files_per_bucket", lit(f)))
  }

  private def decisionOf(df: org.apache.spark.sql.DataFrame): (String, Long) = {
    val r = Maintenance
      .indexMaintenancePlan(df, rebuildDriftPpm = 1200000L, compactTombPpm = 100000L,
        compactAppendEras = 4L, compactFilesPerBucket = 6L)
      .collect().head
    (r.getAs[String]("decision"), r.getAs[Long]("tomb_ppm"))
  }

  test("rebuild branch: drift at/above the threshold, regardless of tombstone load") {
    assert(decisionOf(census("a", 1000, 0, 1, 1200000))._1 == "rebuild")
    // precedence: a drifted index that ALSO carries heavy tombstones is a
    // rebuild (the rebuild subsumes the compaction)
    assert(decisionOf(census("a", 1000, 500, 9, 5000000))._1 == "rebuild")
    assert(decisionOf(census("a", 1000, 0, 1, 1199999))._1 == "none")
  }

  test("compact branch via tombstone load, with the exact ppm boundary") {
    val (d1, ppm1) = decisionOf(census("a", 1000, 100, 1, 0))
    assert(d1 == "compact" && ppm1 == 100000L)
    val (d2, ppm2) = decisionOf(census("a", 1000, 99, 1, 0))
    assert(d2 == "none" && ppm2 == 99000L)
    // ppm is an exact integer floor (remainder-subtraction, not double
    // division): 1/3 → 333333, never 333334
    assert(decisionOf(census("a", 3, 1, 1, 0))._2 == 333333L)
  }

  test("compact branch via accumulated append eras") {
    assert(decisionOf(census("a", 1000, 0, 4, 0))._1 == "compact")
    assert(decisionOf(census("a", 1000, 0, 3, 0))._1 == "none")
  }

  test("compact branch via file amplification (the spec-only, non-oracle signal)") {
    assert(decisionOf(census("a", 1000, 0, 1, 0, files = Some(6L)))._1 == "compact")
    assert(decisionOf(census("a", 1000, 0, 1, 0, files = Some(5L)))._1 == "none")
    // an absent files column defaults to 0 — never a spurious compact
    assert(decisionOf(census("a", 1000, 0, 1, 0))._1 == "none")
  }

  test("empty index never divides by zero; tombstones against it still force compaction") {
    val (d, ppm) = decisionOf(census("a", 0, 1, 1, 0))
    assert(d == "compact" && ppm == 1000000L)
  }

  test("indexCensus reads real lifecycle state: ids, tombstone entries, append eras") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val tbl = s"mntspec_cen_${System.nanoTime()}"
    Dedup.persistSemanticIndex(
      e.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"), cents, tbl, buckets = 4)
    Dedup.appendSemanticIndex(
      e.filter(col("vec_id") % 2 === 1), col("vec_id"), col("embedding"), cents, tbl, buckets = 4)
    Dedup.deleteFromSemanticIndex(spark, tbl, e.filter(col("vec_id") % 5 === 0), col("vec_id"))
    val r = Maintenance.indexCensus(spark, tbl, "corpus_id", "sem").collect().head
    assert(r.getAs[String]("index_name") == "sem")
    assert(r.getAs[Long]("index_docs") == e.count())
    assert(r.getAs[Long]("tomb_entries") == e.filter(col("vec_id") % 5 === 0).count())
    assert(r.getAs[Long]("append_eras") == 2L, "persist + one append = two distinct eras")
    // a fresh index has no tombstone table — census reads zero, not error
    val clean = s"mntspec_clean_${System.nanoTime()}"
    Dedup.persistSemanticIndex(e, col("vec_id"), col("embedding"), cents, clean, buckets = 4)
    val c = Maintenance.indexCensus(spark, clean, "corpus_id", "clean").collect().head
    assert(c.getAs[Long]("tomb_entries") == 0L && c.getAs[Long]("append_eras") == 1L)
  }

  test("filesPerBucket tracks append amplification and compaction resets it to 1") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val tbl = s"mntspec_files_${System.nanoTime()}"
    Dedup.persistSemanticIndex(
      e.filter(col("vec_id") % 2 === 0).repartition(3),
      col("vec_id"), col("embedding"), cents, tbl, buckets = 4)
    Dedup.appendSemanticIndex(
      e.filter(col("vec_id") % 2 === 1).repartition(3),
      col("vec_id"), col("embedding"), cents, tbl, buckets = 4)
    val pre = Maintenance.filesPerBucket(spark, tbl, buckets = 4)
    assert(pre > 1L, s"persist+append from 3 tasks must amplify files per bucket, got $pre")
    Dedup.compactSemanticIndex(spark, tbl, buckets = 4)
    assert(Maintenance.filesPerBucket(spark, tbl, buckets = 4) == 1L)
  }

  test("applyMaintenancePlan runs each decision's real action and audits the healed census") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist = 4, iters = 1)
    val n = System.nanoTime()
    val reb = s"mntspec_apl_reb_$n"
    val cmp = s"mntspec_apl_cmp_$n"
    val non = s"mntspec_apl_non_$n"
    // a drift-stale index over half the corpus, a tombstoned index (1/5 of
    // ids hidden → 200000 ppm ≥ the 100000 threshold), and a healthy one
    Dedup.persistSemanticIndex(
      e.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"), cents, reb, buckets = 4)
    Dedup.persistSemanticIndex(e, col("vec_id"), col("embedding"), cents, cmp, buckets = 4)
    Dedup.deleteFromSemanticIndex(spark, cmp, e.filter(col("vec_id") % 5 === 0), col("vec_id"))
    Dedup.persistSemanticIndex(e, col("vec_id"), col("embedding"), cents, non, buckets = 4)
    // real censuses; the drift signal is caller-measured by contract, so
    // the stale index carries a synthetic over-threshold reading
    val census = Maintenance.indexCensus(spark, reb, "corpus_id", "reb")
      .withColumn("drift_ppm", lit(2000000L))
      .unionByName(Maintenance.indexCensus(spark, cmp, "corpus_id", "cmp")
        .withColumn("drift_ppm", lit(0L)))
      .unionByName(Maintenance.indexCensus(spark, non, "corpus_id", "non")
        .withColumn("drift_ppm", lit(0L)))
    val plan = Maintenance.indexMaintenancePlan(
      census, rebuildDriftPpm = 1200000L, compactTombPpm = 100000L)
    val auditDf = Maintenance.applyMaintenancePlan(
      spark, plan,
      Map(
        "reb" -> Maintenance.ManagedIndex(
          reb, "corpus_id",
          compact = () => Dedup.compactSemanticIndex(spark, reb, buckets = 4),
          rebuild = () =>
            Dedup.rebuildSemanticIndex(
              spark, reb, e, col("vec_id"), col("embedding"), cents, buckets = 4)),
        "cmp" -> Maintenance.ManagedIndex(
          cmp, "corpus_id",
          compact = () => Dedup.compactSemanticIndex(spark, cmp, buckets = 4),
          rebuild = () => fail("healthy-layout index must not rebuild")),
        "non" -> Maintenance.ManagedIndex(
          non, "corpus_id",
          compact = () => fail("healthy index must not compact"),
          rebuild = () => fail("healthy index must not rebuild"))))
    // schema tripwire: the real audit and the empty-fleet audit (hand-built
    // StructType) must agree — a census column change must trip BOTH tests
    assert(auditDf.columns.toSeq ==
      Seq("index_name", "index_docs", "tomb_entries", "append_eras", "decision"))
    val audit = auditDf
      .collect()
      .map(r => r.getAs[String]("index_name") ->
        (r.getAs[Long]("index_docs"), r.getAs[Long]("tomb_entries"),
          r.getAs[Long]("append_eras"), r.getAs[String]("decision")))
      .toMap
    val total = e.count()
    // rebuild re-encoded the FULL corpus at one fresh era, no tombstones
    assert(audit("reb") == ((total, 0L, 1L, "rebuild")), s"got ${audit("reb")}")
    assert(spark.catalog.tableExists(s"${reb}__v1"), "rebuild must publish a version")
    // compact folded the 1/5 tombstoned stratum into the files
    assert(audit("cmp") == ((total - e.filter(col("vec_id") % 5 === 0).count(), 0L, 1L, "compact")),
      s"got ${audit("cmp")}")
    assert(!spark.catalog.tableExists(Similarity.tombTable(cmp)),
      "compact must retire the applied tombstones")
    // none left the healthy index untouched
    assert(audit("non") == ((total, 0L, 1L, "none")), s"got ${audit("non")}")
  }

  test("applyMaintenancePlan fails fast when the plan names an unregistered index") {
    val plan = Seq(("ghost", "compact"))
      .toDF("index_name", "decision")
    val ex = intercept[IllegalArgumentException] {
      Maintenance.applyMaintenancePlan(spark, plan, Map.empty)
    }
    assert(ex.getMessage.contains("ghost"))
  }

  test("applyMaintenancePlan audits an empty fleet as empty, not as an error") {
    val empty = Seq.empty[(String, String)].toDF("index_name", "decision")
    val audit = Maintenance.applyMaintenancePlan(spark, empty, Map.empty)
    assert(audit.count() == 0)
    assert(audit.columns.toSeq ==
      Seq("index_name", "index_docs", "tomb_entries", "append_eras", "decision"))
  }
}
