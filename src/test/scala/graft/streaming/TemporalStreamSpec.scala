package graft.streaming

import graft.SparkSpecBase
import graft.ops.TemporalOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** The streaming temporal-join twins: the as-of state machine must match
  * the batch operator ACROSS micro-batch boundaries (the carried
  * running-last register is exactly what the single-batch parity harness
  * can't exercise), and the native stream-stream interval join must
  * reproduce the bucketized batch lookback join at its boundaries.
  */
class TemporalStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // rights (side 0) carry payload; lefts (side 1) probe.
  // u1: right@10:00(v=1), left@10:00 (same-instant -> inclusive match),
  //     two rights@10:30 tie (ids 7<8 -> greatest tie wins), left@10:40,
  //     left@09:00 (before any right -> null match)
  // u2: left only -> null match
  private val taggedRows = Seq(
    TemporalStream.AsofIn(1L, ts("2024-01-01 09:00:00"), 1, 100L, 0.0),
    TemporalStream.AsofIn(1L, ts("2024-01-01 10:00:00"), 0, 7L, 1.0),
    TemporalStream.AsofIn(1L, ts("2024-01-01 10:00:00"), 1, 101L, 0.0),
    TemporalStream.AsofIn(1L, ts("2024-01-01 10:30:00"), 0, 7L, 2.0),
    TemporalStream.AsofIn(1L, ts("2024-01-01 10:30:00"), 0, 8L, 3.0),
    TemporalStream.AsofIn(1L, ts("2024-01-01 10:40:00"), 1, 102L, 0.0),
    TemporalStream.AsofIn(2L, ts("2024-01-01 10:00:00"), 1, 200L, 0.0)
  )

  private val expectedAsof = Set(
    (100L, 1L, None: Option[Double]),
    (101L, 1L, Some(1.0)),
    (102L, 1L, Some(3.0)), // greatest tie id at the 10:30 instant
    (200L, 2L, None: Option[Double])
  )

  private def runAsof(batches: Seq[Seq[TemporalStream.AsofIn]]): Set[(Long, Long, Option[Double])] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TemporalStream.AsofIn]
    val sink = s"temporal_asof_${System.nanoTime()}"
    val q = TemporalStream
      .asofJoinStream(mem.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // final flush: a sentinel far past everything
      mem.addData(TemporalStream.AsofIn(-1L, ts("2024-01-02 00:00:00"), 1, -1L, 0.0))
      q.processAllAvailable()
      mem.addData(TemporalStream.AsofIn(-1L, ts("2024-01-03 00:00:00"), 1, -1L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(sink)
      .filter($"key" =!= -1L)
      .select($"tie", $"key", $"asof_payload")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toSet
    spark.catalog.dropTempView(sink)
    got
  }

  test("asofJoinStream: single staged batch matches the batch operator's semantics") {
    assert(runAsof(Seq(taggedRows)) == expectedAsof)
  }

  test("asofJoinStream: same answer when rows arrive across micro-batches (carried register)") {
    // split mid-timeline IN EVENT-TIME ORDER (watermark semantics only
    // guarantee results for in-order arrival at delay 0): batch 1 holds
    // everything through 10:00, batch 2 the rest. The 10:40 left row must
    // match a right row carried from an EARLIER batch whose buffered form
    // was already emitted-and-evicted — the running-last register path.
    val (early, late) = taggedRows.partition(_.ts.getTime <= ts("2024-01-01 10:00:00").getTime)
    assert(runAsof(Seq(early, late)) == expectedAsof)
  }

  test("lookbackJoinStream matches the batch lookbackJoin at the horizon boundaries") {
    implicit val sqlCtx = spark.sqlContext
    // boundary cases: exactly at ts (include), exactly at ts - H (include),
    // one second before the horizon (exclude), after ts (exclude)
    val purchases = Seq((1L, ts("2024-01-02 00:00:00"), 10L))
    val clicks = Seq(
      (1L, ts("2024-01-02 00:00:00"), 21L), // dt = 0        -> in
      (1L, ts("2024-01-01 00:00:00"), 22L), // dt = H        -> in
      (1L, ts("2023-12-31 23:59:59"), 23L), // dt = H + 1s   -> out
      (1L, ts("2024-01-02 00:00:01"), 24L), // future        -> out
      (2L, ts("2024-01-02 00:00:00"), 25L)  // wrong key     -> out
    )
    val horizon = 86400L
    val batch = TemporalOps.lookbackJoin(
      purchases.toDF("user_id", "ts", "purchase_id"),
      clicks.toDF("user_id", "cts", "click_id"),
      "user_id", "ts", "cts", horizon)
      .select($"purchase_id", $"click_id")
    val memP = MemoryStream[(Long, Timestamp, Long)]
    val memC = MemoryStream[(Long, Timestamp, Long)]
    val sink = s"temporal_lookback_${System.nanoTime()}"
    val q = TemporalStream.lookbackJoinStream(
      memP.toDF().toDF("user_id", "ts", "purchase_id"),
      memC.toDF().toDF("user_id", "cts", "click_id"),
      "user_id", "ts", "cts", horizon)
      .select($"purchase_id", $"click_id")
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      memP.addData(purchases: _*)
      memC.addData(clicks: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = rows(spark.table(sink).select($"purchase_id", $"click_id"))
    spark.catalog.dropTempView(sink)
    assert(got == rows(batch))
    assert(got == Seq(Seq(10L, 21L), Seq(10L, 22L)))
  }
}
