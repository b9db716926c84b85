package graft

import org.apache.spark.sql.SparkSession

/** I/O placement for the engine's LOCAL entry points (Bench / Verify /
  * Smoke / BenchOne / Time / Explain and the test harness): where the
  * catalog warehouse, Spark's local dirs (shuffle/broadcast/blockmgr
  * spill), and the engine's scratch roots live.
  *
  * Rationale (spark_optimization_guide.md §6, small files): at bench
  * scale the persisted-index lifecycles are dominated not by data bytes
  * but by small-file COMMIT cost — every saveAsTable / bucketed append /
  * watermark rewrite pays directory creation, per-task commit renames,
  * CRC sidecars and fsync-ish metadata on the root disk. A RAM-backed
  * root (`/dev/shm`, present on every Linux host) removes that fixed
  * cost without touching what any query computes: nothing is memoized
  * across runs (tables stay pid-scoped and are deleted at JVM exit;
  * every bench invocation still computes from the parquet inputs). The
  * WAREHOUSE + scratch legs carry that rationale; the `spark.local.dir`
  * leg was measured a net negative at 32 cores and reverted (see
  * [[localDir]]).
  *
  * At cluster scale the same knobs exist and are deployment decisions
  * (fast local SSDs for `spark.local.dir`, a real distributed FS for the
  * warehouse), so everything here is env-overridable:
  *
  *   - `SPARK_GRAFT_WAREHOUSE_DIR` — catalog warehouse root
  *   - `SPARK_GRAFT_LOCAL_DIR`     — spark.local.dir
  *   - `SPARK_GRAFT_SCRATCH_ROOT`  — [[graft.queries.Scratch.dir]] root
  *
  * Defaults fall back to the pre-r21 locations (cwd `spark-warehouse`,
  * Spark's own local-dir default, `/tmp/graft_cache`) when `/dev/shm` is
  * absent, so behavior off-Linux is unchanged.
  */
object EngineIO {

  private def shm: Option[String] =
    Some("/dev/shm").filter(p => new java.io.File(p).isDirectory)

  /** Warehouse root every entry-point session sets as
    * `spark.sql.warehouse.dir`. NOT pid-scoped: concurrent graft JVMs
    * (driver verify alongside a local bench) share the root exactly as
    * they shared cwd `spark-warehouse` before — isolation comes from the
    * pid-scoped TABLE names ([[graft.queries.Scratch.table]]), and each
    * JVM deletes its own tables' directories at exit.
    */
  val warehouseDir: String =
    sys.env
      .get("SPARK_GRAFT_WAREHOUSE_DIR")
      .orElse(shm.map(_ + "/graft_warehouse"))
      .getOrElse(new java.io.File("spark-warehouse").getAbsolutePath)

  /** spark.local.dir (shuffle files, broadcast disk store, block-manager
    * spill). None ⇒ leave Spark's default (java.io.tmpdir).
    *
    * r21 defaulted this to `/dev/shm` alongside the warehouse move; the
    * r22 same-host 32-core A/B (two interleaved full-board pairs, same
    * binary, OPTIMIZATION_r22.md §9) measured the tmpfs leg as a NET
    * NEGATIVE: 249.6 vs 223.3 s and 265.7 vs 241.3 s, ~25 s concentrated
    * on the state-store-heavy stream family. Reverted to Spark's default
    * local dir; the env override remains the deployment knob (fast local
    * SSDs at cluster scale).
    */
  val localDir: Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR")

  /** Root for [[graft.queries.Scratch.dir]] (spill memo, query-local
    * fixture/sink dirs).
    */
  val scratchRoot: String =
    sys.env
      .get("SPARK_GRAFT_SCRATCH_ROOT")
      .orElse(shm.map(_ + "/graft_cache"))
      .getOrElse("/tmp/graft_cache")

  /** Apply the engine's I/O placement to a session builder. Commit
    * algorithm v2 (direct task commit, no job-commit rename pass) is safe
    * here: local mode runs no speculative duplicates, and every engine
    * write lands in a pid-scoped path a failed job simply deletes.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = {
    val base = b
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    localDir.fold(base)(d => base.config("spark.local.dir", d))
  }
}
