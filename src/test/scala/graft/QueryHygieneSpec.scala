package graft

import org.apache.spark.sql.functions._

/** Session-hygiene contracts for `SparkEntry.queries` entries that register
  * session-global state: bench runs each query three times (warmup + two
  * timed passes) in one JVM, so anything a query registers and does not
  * drop accumulates for the JVM's lifetime.
  */
class QueryHygieneSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("every registered query has an oracle twin, and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("stream-parity queries drop their memory-sink temp views and still return the result") {
    val out = graft.queries.Extensions.queries("stream_dedup_parity")(spark, sfDir)
    // the drained result is a local DataFrame — usable after the view is gone
    assert(out.count() > 0)
    // sink views live in the low-partition CLONE's catalog, not the base
    // session's — assert against the session the query actually ran on
    // (the base-session listing would pass even with the drop removed)
    val ran = graft.queries.Extensions.lastStreamSession
    assert(ran != null, "stream-parity query did not record its stream session")
    val leaked = ran.catalog.listTables().collect().map(_.name).filter(_.startsWith("stream_"))
    assert(leaked.isEmpty, s"leaked memory-sink views: ${leaked.toSeq}")
  }

  test("tumbling stream parity matches its batch twin after the sink is drained") {
    val streamed = graft.queries.Extensions.queries("stream_tumbling_parity")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val batch = graft.queries.Extensions.queries("ev_tumbling")(spark, sfDir)
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        col("n"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(streamed.toSeq == batch.toSeq)
  }
}
