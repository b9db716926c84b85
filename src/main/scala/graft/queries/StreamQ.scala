package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Curation, Dedup, Maintenance, Multimodal, Ranking, Similarity, Sketches, Stats, TextStats}
import graft.ops.{TemporalOps, ZOrderOps}
import graft.streaming.Sessionize

/** Stream/batch parity surfaces (split out of Extensions.scala): every
  * stream_* query drives an operator through MemoryStream on the
  * StreamHarness clone session and hash-matches its batch twin's DuckDB
  * oracle — layout is execution, meaning must not change.
  */
object StreamQ {
  import QShared._
  import StreamHarness._
  import OracleSql._

  /** The stream_* queries whose pipeline holds STATE-STORE state
    * (windowed/complete-mode aggregation, dropDuplicates, session
    * windows, `flatMapGroupsWithState` machines) — they pay the
    * STATEFUL harness floor ([[StreamHarness.harnessFloor]]: state-store
    * init + commit per micro-batch, ~0.8 s vs ~0.3 s for a map-only
    * sink). Everything else registered here is map-only or
    * foreachBatch-driven (batch jobs per micro-batch, no state store).
    * Bench attributes each stream entry its applicable floor from this
    * set (`floor_sec`/`sec_over_floor` in bench_history), and BenchDiff
    * bands OPERATOR time, not the harness constant. Misclassification
    * cost is bounded by the ~0.5 s floor difference — bench metadata,
    * never correctness.
    */
  val statefulQueries: Set[String] = Set(
    "stream_session_parity",       // session_window aggregation
    "stream_state_session_parity", // flatMapGroupsWithState sessionizer
    "stream_asof_parity",          // as-of join state machine
    "stream_nearest_parity",       // nearest-event state machine
    "stream_lookback_parity",      // bounded-lookback state machine
    "stream_dedup_parity",         // streaming exact-dedup state
    "stream_tumbling_parity",      // tumbling windowed aggregation
    "stream_sliding_parity",       // sliding windowed aggregation
    "stream_dp_release_parity",    // complete-mode aggregation
    "stream_countmin_parity",      // complete-mode sketch aggregation
    "stream_changelog_parity",     // complete-mode changelog aggregation
    "stream_lsh_parity",           // watermarked band self-join: JOIN state store
    "stream_lsh_survivors"         // same streamingLshCandidates join inside
    // NOT stream_kll_parity: kllSketch in append mode is per-batch map-only
    // compaction — no state store. All three corrections above were found
    // by the r17 plan-derived observation (Bench floor_misclassified):
    // the lsh pair had been silently drawing the stateless floor and kll
    // the stateful one, exactly the misclassification ADVICE r16 predicted
    // a hand-pinned set could hide.
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // STREAM/BATCH PARITY: the Structured Streaming session_window twin run
    // over MemoryStream on the same events fixture, hash-checked against the
    // batch DuckDB oracle — proof the watermarked streaming formulation
    // computes byte-identical sessions. Two far-future sentinel batches push
    // the event-time watermark past every real session so append mode
    // finalizes them all; the sentinel user is excluded from the output.
    "stream_session_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val ev: Array[(Long, java.sql.Timestamp)] = Fixtures
        .events(s, dir)
        .select(col("user_id"), col("ts"))
        .as[(Long, java.sql.Timestamp)]
        .collect()
      val maxMs = ev.iterator.map(_._2.getTime).max
      val sentinel = -1L
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val stream = Sessionize.sessionWindowStream(
        mem.toDF().toDF("user_id", "ts"), "user_id", "ts", gapMinutes = 30)
      // unique per invocation: bench/warmup run the query repeatedly and a
      // memory-sink name collision across runs must not bite
      val sink = s"stream_session_parity_${System.nanoTime()}"
      // data + first sentinel staged as ONE batch before start; the first
      // sentinel advances the watermark past maxTs at batch-0 end, and the
      // second sentinel's batch RUNS with that watermark so every real
      // session emits — two micro-batches total
      feedChunked(mem, ev.toSeq :+ ((sentinel, new java.sql.Timestamp(maxMs + 4L * 3600 * 1000))))
      val q = stream.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        mem.addData((sentinel, new java.sql.Timestamp(maxMs + 8L * 3600 * 1000)))
        q.processAllAvailable()
      } finally stopRecording(q)
      drainSink(s, sink)(
        _.filter(col("user_id") =!= sentinel)
          .select(
            col("user_id"),
            unix_micros(col("start")).as("start_us"),
            unix_micros(col("end")).as("end_us"),
            col("n_events")))
    },
    // sixth stream/batch parity surface: the CUSTOM-STATE sessionizer
    // (flatMapGroupsWithState, the explicit state machine) against the
    // batch window oracle. Gated on the integer-exact session fields
    // (bounds + event count); total_value accumulates doubles in stream
    // order and is audited in SessionizeSpec instead, since no SQL engine
    // reproduces that exact float stream
    "stream_state_session_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val ev: Array[Sessionize.SessionEvent] = Fixtures
        .events(s, dir)
        .select(col("user_id").cast("string"), col("ts"), col("value").cast("double"))
        .as[(String, java.sql.Timestamp, Double)]
        .collect()
        .map(t => Sessionize.SessionEvent(t._1, t._2, t._3))
      val maxMs = ev.iterator.map(_.ts.getTime).max
      val mem = MemoryStream[Sessionize.SessionEvent]
      val out = Sessionize.sessionizeWithState(mem.toDS(), gapMinutes = 30)
      val sink = s"stream_state_session_${System.nanoTime()}"
      // one staged data+sentinel batch, one flush batch — see stream_session_parity
      feedChunked(mem, ev.toSeq :+ Sessionize.SessionEvent(
        "~sentinel", new java.sql.Timestamp(maxMs + 4L * 3600 * 1000), 0.0))
      val q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        mem.addData(Sessionize.SessionEvent(
          "~sentinel", new java.sql.Timestamp(maxMs + 8L * 3600 * 1000), 0.0))
        q.processAllAvailable()
      } finally stopRecording(q)
      drainSink(s, sink)(
        _.filter(col("user_id") =!= "~sentinel")
          .select(col("user_id"), col("start_us"), col("end_us"), col("n_events")))
    },
    // STREAM/BATCH PARITY for the as-of join: Structured Streaming has no
    // native as-of, so this drives the explicit flatMapGroupsWithState
    // state machine (TemporalStream.asofJoinStream — watermark-buffered
    // prefix merge, one carried running-last register per key) and
    // hash-matches the batch ev_asof_join oracle. The sentinel-watermark
    // technique of stream_session_parity: data + one far-future sentinel
    // staged as batch 0 (everything buffers at watermark 0), a second
    // sentinel batch runs with the advanced watermark and finalizes every
    // real row via the event-time timeout.
    "stream_asof_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import graft.streaming.TemporalStream
      // side 0 = purchases (payload = value), side 1 = clicks (probes)
      val ev: Array[TemporalStream.AsofIn] = Fixtures
        .events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(
          col("user_id"),
          col("ts"),
          when(col("event_type") === "click", 1).otherwise(0).as("side"),
          col("event_id"),
          col("value"))
        .as[(Long, java.sql.Timestamp, Int, Long, Double)]
        .collect()
        .map(t => TemporalStream.AsofIn(t._1, t._2, t._3, t._4, if (t._3 == 0) t._5 else 0.0))
      val maxMs = ev.iterator.map(_.ts.getTime).max
      val mem = MemoryStream[TemporalStream.AsofIn]
      val out = TemporalStream.asofJoinStream(mem.toDS())
      val sink = s"stream_asof_parity_${System.nanoTime()}"
      feedChunked(mem, ev.toSeq :+ TemporalStream.AsofIn(
        -1L, new java.sql.Timestamp(maxMs + 4L * 3600 * 1000), 1, -1L, 0.0))
      val q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        mem.addData(TemporalStream.AsofIn(
          -1L, new java.sql.Timestamp(maxMs + 8L * 3600 * 1000), 1, -1L, 0.0))
        q.processAllAvailable()
      } finally stopRecording(q)
      drainSink(s, sink)(
        _.filter(col("key") =!= -1L)
          .select(
            col("tie").as("event_id"),
            col("key").as("user_id"),
            col("ts_us"),
            col("asof_us").as("purchase_us"),
            col("asof_payload").as("purchase_value")))
    },
    // STREAM/BATCH PARITY for the NEAREST as-of join: the bidirectional
    // state machine (TemporalStream.nearestJoinStream) — rows buffer per
    // key, a left row finalizes once the watermark passes ts + horizon
    // (the bounded peek-ahead every streaming nearest-join needs to
    // finalize at all), equidistant ties resolve backward, right ties to
    // the greatest id. The harness horizon (400 days) exceeds the
    // fixture's forward-match spread, so the result hash-matches the
    // UNBOUNDED batch ev_asof_nearest oracle exactly; sentinels sit past
    // maxTs + horizon so the watermark can finalize every real row.
    "stream_nearest_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import graft.streaming.TemporalStream
      val ev: Array[TemporalStream.AsofIn] = Fixtures
        .events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(
          col("user_id"),
          col("ts"),
          when(col("event_type") === "click", 1).otherwise(0).as("side"),
          col("event_id"),
          col("value"))
        .as[(Long, java.sql.Timestamp, Int, Long, Double)]
        .collect()
        .map(t => TemporalStream.AsofIn(t._1, t._2, t._3, t._4, if (t._3 == 0) t._5 else 0.0))
      val maxMs = ev.iterator.map(_.ts.getTime).max
      val horizonSec = 400L * 86400L
      val mem = MemoryStream[TemporalStream.AsofIn]
      val out = TemporalStream.nearestJoinStream(mem.toDS(), horizonSec)
      val sink = s"stream_nearest_parity_${System.nanoTime()}"
      feedChunked(mem, ev.toSeq :+ TemporalStream.AsofIn(
        -1L, new java.sql.Timestamp(maxMs + (horizonSec + 4L * 3600) * 1000), 1, -1L, 0.0))
      val q = out.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        mem.addData(TemporalStream.AsofIn(
          -1L, new java.sql.Timestamp(maxMs + (horizonSec + 8L * 3600) * 1000), 1, -1L, 0.0))
        q.processAllAvailable()
      } finally stopRecording(q)
      drainSink(s, sink)(
        _.filter(col("key") =!= -1L)
          .select(
            col("tie").as("event_id"),
            col("key").as("user_id"),
            col("ts_us"),
            col("asof_us").as("purchase_us"),
            col("asof_dir"),
            col("asof_payload").as("purchase_value")))
    },
    // STREAM/BATCH PARITY for the bounded-lookback interval join: the
    // NATIVE watermarked stream-stream inner join (both sides watermarked,
    // horizon as the time-range condition the engine derives its state
    // eviction bound from) — exactly the machinery where watermark bugs
    // hide. Purchases and clicks ride two MemoryStreams; matched pairs
    // emit in the join batch (inner-join append semantics need no
    // sentinel), and the linear credit split — a deterministic per-
    // purchase window — runs on the drained sink, hash-matched against
    // the batch ev_attribution_linear oracle.
    "stream_lookback_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import graft.streaming.TemporalStream
      val ev = Fixtures.events(s, dir)
      val purchases: Array[(Long, java.sql.Timestamp, Long, Double)] = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .as[(Long, java.sql.Timestamp, Long, Double)]
        .collect()
      val clicks: Array[(Long, java.sql.Timestamp, Long)] = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
        .as[(Long, java.sql.Timestamp, Long)]
        .collect()
      val memP = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val memC = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val pDf = memP.toDF().toDF("user_id", "ts", "purchase_id", "value")
        .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
        .drop("value")
      val cDf = memC.toDF().toDF("user_id", "cts", "click_id")
      val joined = TemporalStream.lookbackJoinStream(
        pDf, cDf, "user_id", "ts", "cts", horizonSec = 3L * 86400L)
      val sink = s"stream_lookback_parity_${System.nanoTime()}"
      feedChunked(memP, purchases.toSeq)
      feedChunked(memC, clicks.toSeq)
      val q = joined.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink) { df =>
        val byP = Window.partitionBy(col("purchase_id"))
        df.withColumn("n_touches", count(lit(1)).over(byP))
          .withColumn(
            "rn",
            row_number().over(byP.orderBy(col("cts").desc, col("click_id").desc)))
          .select(
            col("user_id"),
            col("purchase_id"),
            col("click_id"),
            col("n_touches"),
            (expr("cents div n_touches") +
              when(col("rn") === 1, expr("cents % n_touches")).otherwise(0L)).as("credit_cents"))
      }
    },
    // third stream/batch parity surface: watermarked exact dedup over
    // MemoryStream — first occurrences emit immediately in append mode, so
    // no sentinel is needed; the surviving doc per digest is arrival-order-
    // dependent, so the gated output is the DIGEST set (deterministic)
    "stream_dedup_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val texts: Array[String] = t(s, dir, "documents").select(col("text")).as[String].collect()
      val t0 = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
      val mem = MemoryStream[(java.sql.Timestamp, String)]
      val dedup = Dedup.streamingExactDedup(
        mem.toDF().toDF("ts", "text"), col("text"), "ts", "1 hour")
      val sink = s"stream_dedup_parity_${System.nanoTime()}"
      feedChunked(mem, texts.toSeq.map(x => (t0, x)))
      val q = dedup.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(_.select(md5(col("text")).as("h")))
    },
    // second stream/batch parity surface: the watermarked tumbling-window
    // aggregate over MemoryStream, hash-checked against the batch groupBy
    // oracle (same sentinel technique as stream_session_parity)
    "stream_tumbling_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val ev: Array[(java.sql.Timestamp, String)] = Fixtures
        .events(s, dir)
        .select(col("ts"), col("event_type"))
        .as[(java.sql.Timestamp, String)]
        .collect()
      val maxMs = ev.iterator.map(_._1.getTime).max
      val mem = MemoryStream[(java.sql.Timestamp, String)]
      val stream = Sessionize.tumblingCountsStream(
        mem.toDF().toDF("ts", "event_type"), "ts", "event_type")
      val sink = s"stream_tumbling_parity_${System.nanoTime()}"
      // one staged data+sentinel batch, one flush batch — see stream_session_parity
      feedChunked(mem, ev.toSeq :+ ((new java.sql.Timestamp(maxMs + 4L * 3600 * 1000), "~sentinel")))
      val q = stream.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        mem.addData((new java.sql.Timestamp(maxMs + 8L * 3600 * 1000), "~sentinel"))
        q.processAllAvailable()
      } finally stopRecording(q)
      drainSink(s, sink)(
        _.filter(col("event_type") =!= "~sentinel")
          .select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("event_type"),
            col("n")))
    },
    // fourth stream/batch parity surface: the watermarked SLIDING-window
    // aggregate over MemoryStream vs the batch window() oracle — same
    // sentinel technique as tumbling; every real window finalizes in
    // append mode once the sentinels push the watermark past max ts
    "stream_sliding_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val ev: Array[(java.sql.Timestamp, String)] = Fixtures
        .events(s, dir)
        .select(col("ts"), col("event_type"))
        .as[(java.sql.Timestamp, String)]
        .collect()
      val maxMs = ev.iterator.map(_._1.getTime).max
      val mem = MemoryStream[(java.sql.Timestamp, String)]
      val stream = Sessionize.slidingCountsStream(
        mem.toDF().toDF("ts", "event_type"), "ts", "event_type", 60, 30)
      val sink = s"stream_sliding_parity_${System.nanoTime()}"
      // one staged data+sentinel batch, one flush batch — see stream_session_parity
      feedChunked(mem, ev.toSeq :+ ((new java.sql.Timestamp(maxMs + 4L * 3600 * 1000), "~sentinel")))
      val q = stream.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        mem.addData((new java.sql.Timestamp(maxMs + 8L * 3600 * 1000), "~sentinel"))
        q.processAllAvailable()
      } finally stopRecording(q)
      drainSink(s, sink)(
        _.filter(col("event_type") =!= "~sentinel")
          .select(
            date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("event_type"),
            col("n")))
    },
    // fifth stream/batch parity surface: count-min cells accumulated by the
    // single-stage streaming sketch (complete mode — legal unwatermarked
    // because the group domain is the bounded depth×width cell grid), then
    // probed exactly like the batch sketch; the drained cell table must be
    // bit-identical for the estimates to hash-match the batch oracle
    // streaming DP release parity: the grouped count is the ONLY stateful
    // piece (complete-mode streaming aggregate); the Laplace release is
    // stateless post-state algebra applied on drain — and must equal the
    // batch privacy_dp_counts release bit-for-bit
    "stream_dp_release_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rows: Array[(java.sql.Timestamp, String)] = Fixtures.events(s, dir)
        .select(col("ts"), col("event_type")).as[(java.sql.Timestamp, String)].collect()
      val mem = MemoryStream[(java.sql.Timestamp, String)]
      val counts = mem.toDF().toDF("ts", "event_type")
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val sink = s"stream_dp_release_${System.nanoTime()}"
      feedChunked(mem, rows.toSeq)
      val q = counts.writeStream.format("memory").queryName(sink).outputMode("complete").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink) { df =>
        val noise = Curation.dpLaplaceNoise(
          concat_ws("|", col("event_type").cast("string"), col("day").cast("string")), eps = 1.0)
        df.select(
          col("event_type"), col("day"),
          round(col("n").cast("double") + noise, 6).as("n_dp"),
          lit(1.0).as("epsilon"))
      }
    },
    "stream_countmin_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      // token explosion feeds BOTH the stream and the batch-side exact
      // counts; the plan-keyed spill tokenizes once across the two reads
      // and across bench re-runs
      val tokens = Dedup.spilled(
        t(s, dir, "documents")
          .select(explode(split(trim(col("text")), "\\s+")).as("token"))
          .filter(length(col("token")) > 0),
        "stream_toks")
      val toks: Array[String] = tokens.as[String].collect()
      val mem = MemoryStream[String]
      val stream = Sketches.countMinCellsStream(
        mem.toDF().toDF("token"), col("token"), depth = 4, width = 256)
      val sink = s"stream_countmin_parity_${System.nanoTime()}"
      feedChunked(mem, toks.toSeq)
      val q = stream.writeStream.format("memory").queryName(sink).outputMode("complete").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      val cells = drainSink(s, sink)(identity)
      val probes = Seq("spark", "table", "the", "zebra").toDF("item")
      val est = Sketches.countMinEstimate(cells, probes, col("item"), depth = 4, width = 256)
      val exact = tokens.groupBy(col("token").as("item")).agg(count(lit(1)).as("exact"))
      est
        .join(exact, Seq("item"), "left")
        .select(col("item").as("token"), col("est"), coalesce(col("exact"), lit(0L)).as("exact"))
    },
    // seventh stream/batch parity surface: streaming LSH near-dup
    // CANDIDATES — the watermarked stream-stream self-join on the band
    // buckets — gated against the batch minhashLshPairs oracle. All docs
    // share one event time inside the horizon, so the banding (identical
    // signature pipeline) must yield exactly the batch candidate-pair set;
    // inner-join matches emit as both sides arrive, no sentinel needed
    "stream_lsh_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docs: Array[(Long, String)] =
        t(s, dir, "documents").select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val t0 = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
      val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
      val stream = Dedup.streamingLshCandidates(
        mem.toDF().toDF("doc_id", "ts", "text"),
        col("doc_id"), col("text"), "ts",
        watermark = "1 hour", horizonSeconds = 3600, n = 3, k = 8, bands = 4)
      val sink = s"stream_lsh_parity_${System.nanoTime()}"
      feedChunked(mem, docs.toSeq.map(d => (d._1, t0, d._2)))
      val q = stream.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      // a pair surfaces once per colliding band in the stream; the batch
      // twin reports it once — distinct on drain is the parity shape
      drainSink(s, sink)(_.select(col("id_lo"), col("id_hi")).distinct())
    },
    // ninth stream/batch parity surface: the REAL image decode running
    // INSIDE a streaming plan. decodeImages is a stateless typed
    // mapPartitions, so the exact same operator composes into Structured
    // Streaming unchanged (append mode, no watermark/state) — the drained
    // decode output must hash-match the batch mm_decode_real oracle
    "stream_mm_decode_parity" -> { (s0, dir) =>
      // micro-batch work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val assets: Array[(Long, String, Array[Byte])] = Multimodal
        .synthImages(tPar(s, dir, "documents"), "doc_id")
        .as[(Long, String, Array[Byte])]
        .collect()
      val mem = MemoryStream[(Long, String, Array[Byte])]
      val decoded = Multimodal
        .decodeImages(mem.toDF().toDF("asset_id", "media_type", "payload"))
        .toDF()
      val sink = s"stream_mm_decode_${System.nanoTime()}"
      feedChunked(mem, assets.toSeq)
      val q = decoded.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(identity)
    },
    // the full streaming near-dedup chain: streaming LSH candidates →
    // exact-Jaccard verification (two stream-STATIC joins against the gram
    // table — stateless, so the whole verify stage lives inside the
    // watermarked streaming plan) → survivor selection. Cluster resolution
    // is inherently iterative (connected components), so it runs on the
    // drained verified-pair set — the foreachBatch shape a production
    // pipeline uses for the non-incremental tail
    "stream_lsh_survivors" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docsDf = t(s, dir, "documents")
      val docs: Array[(Long, String)] =
        docsDf.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val t0 = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
      val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
      val cands = Dedup.streamingLshCandidates(
        mem.toDF().toDF("doc_id", "ts", "text"),
        col("doc_id"), col("text"), "ts",
        watermark = "1 hour", horizonSeconds = 3600, n = 3, k = 8, bands = 4)
      // shared across the three gram-verify stream surfaces AND their bench
      // re-runs: the parity clones are fresh sessions, so the plan-keyed
      // spill (not session-keyed) is what makes this compute-once
      val g = Dedup.spilled(
        Dedup.shingled(docsDf, col("doc_id"), col("text"), 3), "stream_grams")
      val verified = cands
        .join(g.select(col("doc_id").as("id_lo"), col("grams").as("g_lo")), "id_lo")
        .join(g.select(col("doc_id").as("id_hi"), col("grams").as("g_hi")), "id_hi")
        .select(col("id_lo"), col("id_hi"), Dedup.jaccardSorted(col("g_lo"), col("g_hi")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("id_lo"), col("id_hi"))
      val sink = s"stream_lsh_survivors_${System.nanoTime()}"
      feedChunked(mem, docs.toSeq.map(d => (d._1, t0, d._2)))
      val q = verified.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      val pairs = drainSink(s, sink)(_.select(col("id_lo"), col("id_hi")).distinct())
      // plain CC over THIS run's drained pairs: the keyed memo that briefly
      // lived here served the first run's labels to every later invocation,
      // which weakened the parity witness (a dropped micro-batch would have
      // gone unnoticed) and only flattered min-of-passes (r21 verdict)
      val clusters = Dedup.connectedComponents(pairs)
      val labeled = docsDf
        .select(col("doc_id"), col("n_chars"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("canonical_id"), col("doc_id")))
      val w = Window.partitionBy(col("cluster_id")).orderBy(col("n_chars").desc, col("doc_id").asc)
      labeled
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"))
    },
    // tenth stream/batch parity surface: INCREMENTAL ingestion dedup as a
    // STATELESS stream-static join — the incoming batch arrives as a
    // stream, probes the static corpus (band, bh) index, and the verified
    // output must hash-match the batch dedup_incremental oracle. No
    // watermark, no state store: the join is stateless by construction
    "stream_incremental_parity" -> { (s0, dir) =>
      // micro-batch work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docsDf = t(s, dir, "documents")
      val corpus = docsDf.filter(col("doc_id") % 5 =!= 0)
      val incoming: Array[(Long, String)] = docsDf
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .collect()
      val mem = MemoryStream[(Long, String)]
      val cands = Dedup.streamingIncrementalCandidates(
        corpus, mem.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"),
        n = 3, k = 8, bands = 4)
      // shared across the three gram-verify stream surfaces AND their bench
      // re-runs: the parity clones are fresh sessions, so the plan-keyed
      // spill (not session-keyed) is what makes this compute-once
      val g = Dedup.spilled(
        Dedup.shingled(docsDf, col("doc_id"), col("text"), 3), "stream_grams")
      val verified = cands
        .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
        .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
        .select(
          col("new_id"), col("corpus_id"),
          Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
        .filter(col("jac_raw") >= 0.7)
        .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
      val sink = s"stream_incremental_parity_${System.nanoTime()}"
      feedChunked(mem, incoming.toSeq)
      val q = verified.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      // a pair surfaces once per colliding band; distinct on drain is the
      // parity shape (same as stream_lsh_parity)
      drainSink(s, sink)(_.distinct())
    },
    // twelfth stream/batch parity surface: the END-TO-END incremental-dedup
    // MAINTENANCE loop. Each foreachBatch cycle (the production shape the
    // incremental family implies): probe the PERSISTED bucketed index →
    // verify with exact Jaccard → append the batch's own bands back into
    // the index — so batch B's docs can match batch A's, which the
    // stateless stream-static probe cannot do. The drained pair set must
    // hash-match a batch oracle where (a, b) pairs exactly when a arrived
    // strictly after b (corpus = epoch 0, batch A = 1, batch B = 2).
    "stream_index_maintain" -> { (s0, dir) =>
      // micro-batch work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docsDf = t(s, dir, "documents")
      // incoming class 2 (mod 5), split A/B on mod 10: at sf0.01 this puts
      // the near-dup pair (72, 377) in DIFFERENT stream batches, so one
      // emitted pair exists ONLY because batch A's bands were appended —
      // the split that actually witnesses the append-back semantics
      // (incoming %5==0 had no cross-batch near-dups in the fixture)
      val corpus = docsDf.filter(col("doc_id") % 5 =!= 2)
      val table = Scratch.table("lsh_maint") // pid-scoped: see dedup_incremental_bucketed
      // layout time: overwrite resets the index each invocation (bench runs
      // the query three times in one JVM; a stale appended index would
      // double-count batch A). The band computation itself is deterministic
      // and shared across invocations via the plan-keyed spill — only the
      // (small) bucketed write repeats.
      graft.sources.Sources.writeBucketed(
        Dedup.spilled(
          Dedup.lshIndex(corpus, col("doc_id"), col("text"), n = 3, k = 8, bands = 4),
          "lsh_maint_bands").withColumn("seq", lit(0L)), // era 0 (the appendLshIndex schema)
        table, 8, "band", "bh")
      // static verify store (harness simplification shared by the other
      // stream surfaces: production would co-persist a doc/gram store)
      // shared across the three gram-verify stream surfaces AND their bench
      // re-runs: the parity clones are fresh sessions, so the plan-keyed
      // spill (not session-keyed) is what makes this compute-once
      val g = Dedup.spilled(
        Dedup.shingled(docsDf, col("doc_id"), col("text"), 3), "stream_grams")
      val outDir = Scratch.dir("lsh_maint", dir)
      Scratch.reset(outDir)
      val batchA: Array[(Long, String)] = docsDf.filter(col("doc_id") % 10 === 2)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val batchB: Array[(Long, String)] = docsDf.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val mem = MemoryStream[(Long, String)]
      val q = mem.toDF().toDF("doc_id", "text").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist() // read twice: probe, then append
          try {
            // the APPEND runs under the stream-execution clone's session
            // (the batch frame's), which invalidates only ITS relation
            // cache — this session's cached file listing for the table
            // goes stale after cycle 1 and the probe would silently miss
            // every previously-appended band (observed: the cross-batch
            // pair dropped). Refresh HERE, in the session the probe reads
            // through, once per cycle.
            s.catalog.refreshTable(table)
            // probe BEFORE append: the verified write materializes first,
            // so this batch never pairs with itself (matches the oracle's
            // strict arrival order)
            val cands = Dedup.probeLshIndex(
              s, table, b, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
            cands
              .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
              .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
              .select(
                col("new_id"), col("corpus_id"),
                Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
              .filter(col("jac_raw") >= 0.7)
              .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
              .write.mode("append").parquet(outDir)
            Dedup.appendLshIndex(
              b, col("doc_id"), col("text"), table, buckets = 8, n = 3, k = 8, bands = 4)
          } finally { b.unpersist(); () }
        }
        .start()
      try {
        // A and B must stay SEPARATE micro-batches (the append-back between
        // them is the semantics under test), so B is fed only after the
        // trigger loop drains A — one block each, no race with the trigger
        mem.addData(batchA.toSeq: _*)
        q.processAllAvailable()
        mem.addData(batchB.toSeq: _*)
        q.processAllAvailable()
      } finally stopRecording(q)
      s.read.parquet(outDir)
    },
    // the CDC MAINTENANCE loop — stream_index_maintain plus the RETRACT
    // half: events carry an op column (U = ingest, D = takedown). Each
    // foreachBatch cycle probes the persisted index with the batch's U
    // docs (seeing the index state from STRICTLY EARLIER batches), then
    // appends the U bands and tombstones the D ids. Batch A carries the
    // takedowns, so batch A's own probes still match the retracted docs
    // (probe-before-delete), batch B's probes must NOT — and must still
    // match batch A's appended docs. The oracle encodes exactly that
    // arrival-order × retraction visibility; at sf0.01 the fixture
    // witnesses all three clauses (92→450 kept pre-delete, 267→45/413 and
    // 447→70 dropped post-delete, 377→72 kept via the append-back)
    "stream_index_retract" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docsDf = t(s, dir, "documents")
      val corpus = docsDf.filter(col("doc_id") % 5 =!= 2)
      val table = Scratch.table("lsh_retract")
      val tomb = Similarity.tombTable(table)
      Scratch.registerTable(tomb)
      // layout time: overwrite resets the index each invocation; the TOMB
      // table must reset with it (bench reruns — a stale tombstone set
      // would hide batch-A probes' retracted partners too early). The band
      // frame is shared verbatim with stream_index_maintain's spill.
      s.sql(s"DROP TABLE IF EXISTS $tomb")
      graft.sources.Sources.writeBucketed(
        Dedup.spilled(
          Dedup.lshIndex(corpus, col("doc_id"), col("text"), n = 3, k = 8, bands = 4),
          "lsh_maint_bands").withColumn("seq", lit(0L)), // era 0 (the appendLshIndex schema)
        table, 8, "band", "bh")
      val g = Dedup.spilled(
        Dedup.shingled(docsDf, col("doc_id"), col("text"), 3), "stream_grams")
      val outDir = Scratch.dir("lsh_retract", dir)
      Scratch.reset(outDir)
      // takedowns target EXISTING corpus docs (batch A); batch B then
      // RE-APPENDS two of them as fresh U events — the D-then-U case the
      // r17 id-only tombstone could not express. Era-stamped tombstones
      // hide only rows appended at era <= tomb_seq, so the re-appended
      // docs are visible to batch C's probes immediately (no compaction
      // between the takedown and the re-crawl). At sf0.01 the witnesses:
      // 267->45 and 447->70 are emitted ONLY via the re-append (their
      // probes moved to batch C), while 267->413 (retracted, not
      // re-appended) stays dropped.
      val delIds: Array[Long] = corpus
        .filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 3L) === 0)
        .select(col("doc_id")).as[Long].collect()
      val upsA: Array[(Long, String)] = docsDf.filter(col("doc_id") % 10 === 2)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val upsB: Array[(Long, String)] = docsDf
        .filter(col("doc_id") % 10 === 7 && !col("doc_id").isin(267L, 447L))
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val reapp: Array[(Long, String)] = docsDf.filter(col("doc_id").isin(45L, 70L))
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val upsC: Array[(Long, String)] = docsDf.filter(col("doc_id").isin(267L, 447L))
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val batchA: Seq[(String, Long, String)] =
        upsA.toSeq.map(d => ("U", d._1, d._2)) ++ delIds.toSeq.map(id => ("D", id, ""))
      val batchB: Seq[(String, Long, String)] =
        (upsB.toSeq ++ reapp.toSeq).map(d => ("U", d._1, d._2))
      val batchC: Seq[(String, Long, String)] = upsC.toSeq.map(d => ("U", d._1, d._2))
      val mem = MemoryStream[(String, Long, String)]
      val q = mem.toDF().toDF("op", "doc_id", "text").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist() // read three ways: probe, append, delete
          try {
            // same cross-session relation-cache concern as
            // stream_index_maintain: refresh in the session the probe
            // reads through, once per cycle
            s.catalog.refreshTable(table)
            if (s.catalog.tableExists(tomb)) s.catalog.refreshTable(tomb)
            val ups = b.filter(col("op") === "U").select(col("doc_id"), col("text"))
            val cands = Dedup.probeLshIndex(
              s, table, ups, col("doc_id"), col("text"), n = 3, k = 8, bands = 4)
            cands
              .join(g.select(col("doc_id").as("new_id"), col("grams").as("g_new")), "new_id")
              .join(g.select(col("doc_id").as("corpus_id"), col("grams").as("g_old")), "corpus_id")
              .select(
                col("new_id"), col("corpus_id"),
                Dedup.jaccardSorted(col("g_new"), col("g_old")).as("jac_raw"))
              .filter(col("jac_raw") >= 0.7)
              .select(col("new_id"), col("corpus_id"), round(col("jac_raw"), 6).as("jac"))
              .write.mode("append").parquet(outDir)
            Dedup.appendLshIndex(
              ups, col("doc_id"), col("text"), table, buckets = 8, n = 3, k = 8, bands = 4)
            val dels = b.filter(col("op") === "D").select(col("doc_id"))
            if (!dels.isEmpty) Dedup.deleteFromLshIndex(s, table, dels, col("doc_id"))
          } finally { b.unpersist(); () }
        }
        .start()
      try {
        // A, B, C stay SEPARATE micro-batches — the append+delete between
        // them (and the re-append's era beating the tombstone's) is the
        // semantics under test
        mem.addData(batchA: _*)
        q.processAllAvailable()
        mem.addData(batchB: _*)
        q.processAllAvailable()
        mem.addData(batchC: _*)
        q.processAllAvailable()
      } finally stopRecording(q)
      s.read.parquet(outDir)
    },
    // the VECTOR index maintenance cycle on a stream — the ANN twin of
    // stream_index_maintain: vectors arrive in micro-batches; each batch
    // probes the persisted bucketed IVFPQ index (top-k under the PINNED
    // memoized model), then appends itself encoded with that same model
    // (appendAnnIndex — no retrain). Batch B's probe sees batch A's
    // vectors ONLY because the append ran; the oracle replays the
    // arrival-order visibility (era-0 always, batch A visible to batch B)
    "stream_ann_index_maintain" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val coarse = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val books = Similarity.pqTrainCached(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
      val g = graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 4L)
      val table = Scratch.table("ann_maint")
      // layout time: overwrite resets the index each invocation (bench
      // reruns the query in one JVM; a stale appended index would
      // double-count batch A) — the model itself rides the memo, so only
      // the small bucketed write repeats
      Similarity.persistAnnIndex(
        e.filter(g =!= 0), "vec_id", "embedding", coarse, books, table, buckets = 8)
      val outDir = Scratch.dir("ann_maint", dir)
      Scratch.reset(outDir)
      val batchA: Array[(Long, Seq[Float])] = e.filter(g === 0 && col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      val batchB: Array[(Long, Seq[Float])] = e.filter(g === 0 && col("vec_id") % 2 === 1)
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      val mem = MemoryStream[(Long, Seq[Float])]
      val q = mem.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist() // read twice: probe, then append
          try {
            // refresh in THIS session (the probe's): the append runs under
            // the stream-execution clone and invalidates only its own
            // relation cache — same staleness trap stream_index_maintain
            // documents
            s.catalog.refreshTable(table)
            // probe BEFORE append: a batch never pairs with itself
            Similarity.scoreAgainstAnnIndex(
              s, table, b, "vec_id", "embedding", coarse, books, nprobe = 2, k = 3)
              .write.mode("append").parquet(outDir)
            Similarity.appendAnnIndex(
              b, "vec_id", "embedding", coarse, books, table, buckets = 8)
          } finally { b.unpersist(); () }
        }
        .start()
      try {
        // A and B must stay SEPARATE micro-batches (the append-back between
        // them is the semantics under test)
        mem.addData(batchA.toSeq: _*)
        q.processAllAvailable()
        mem.addData(batchB.toSeq: _*)
        q.processAllAvailable()
      } finally stopRecording(q)
      s.read.parquet(outDir)
    },
    // the vector index's CDC loop — stream_ann_index_maintain plus the
    // RETRACT half (the ANN twin of stream_index_retract): batch A
    // carries U vectors AND D takedowns of an era-0 md5%5 stratum; each
    // cycle probes under the pinned model (probe-before-delete), appends
    // the U rows, tombstones the D ids. Batch-A queries still rank the
    // soon-to-be-deleted vectors; batch-B queries must not — and must
    // still see batch A's appends. One oracle encodes the joint
    // visibility (streamAnnRetractSql)
    "stream_ann_index_retract" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val coarse = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val books = Similarity.pqTrainCached(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
      val g = graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 4L)
      val table = Scratch.table("ann_retract")
      val tomb = Similarity.tombTable(table)
      Scratch.registerTable(tomb)
      // layout time: index AND tombstones reset each invocation (bench
      // reruns in one JVM — stale tombstones would hide batch-A probes'
      // retracted partners too early)
      s.sql(s"DROP TABLE IF EXISTS $tomb")
      Similarity.persistAnnIndex(
        e.filter(g =!= 0), "vec_id", "embedding", coarse, books, table, buckets = 8)
      val outDir = Scratch.dir("ann_retract", dir)
      Scratch.reset(outDir)
      // takedowns target era-0 vectors (batch A); batch B then RE-APPENDS
      // the retracted stratum's even half as fresh U events — the
      // D-then-U case. Era-stamped tombstones hide only rows appended at
      // era <= tomb_seq, so the re-appended vectors are rankable to batch
      // C's queries immediately (no compaction between takedown and
      // re-crawl); the odd half stays retracted.
      val del5 = graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 5L) === 0
      val delIds: Array[Long] = e
        .filter(g =!= 0 && del5)
        .select(col("vec_id")).as[Long].collect()
      val upsA: Array[(Long, Seq[Float])] = e.filter(g === 0 && col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      val upsB: Array[(Long, Seq[Float])] = e.filter(g === 0 && col("vec_id") % 4 === 1)
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      val reapp: Array[(Long, Seq[Float])] = e
        .filter(g =!= 0 && del5 && col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      val upsC: Array[(Long, Seq[Float])] = e.filter(g === 0 && col("vec_id") % 4 === 3)
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      val batchA: Seq[(String, Long, Seq[Float])] =
        upsA.toSeq.map(v => ("U", v._1, v._2)) ++ delIds.toSeq.map(id => ("D", id, Seq.empty[Float]))
      val batchB: Seq[(String, Long, Seq[Float])] =
        (upsB.toSeq ++ reapp.toSeq).map(v => ("U", v._1, v._2))
      val batchC: Seq[(String, Long, Seq[Float])] = upsC.toSeq.map(v => ("U", v._1, v._2))
      val mem = MemoryStream[(String, Long, Seq[Float])]
      val q = mem.toDF().toDF("op", "vec_id", "embedding").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist() // read three ways: probe, append, delete
          try {
            // cross-session relation-cache refresh, index and tombstones
            // both (the stream_index_maintain staleness trap)
            s.catalog.refreshTable(table)
            if (s.catalog.tableExists(tomb)) s.catalog.refreshTable(tomb)
            val ups = b.filter(col("op") === "U").select(col("vec_id"), col("embedding"))
            Similarity.scoreAgainstAnnIndex(
              s, table, ups, "vec_id", "embedding", coarse, books, nprobe = 2, k = 3)
              .write.mode("append").parquet(outDir)
            Similarity.appendAnnIndex(
              ups, "vec_id", "embedding", coarse, books, table, buckets = 8)
            val dels = b.filter(col("op") === "D").select(col("vec_id"))
            if (!dels.isEmpty) Similarity.deleteFromAnnIndex(s, table, dels, "vec_id")
          } finally { b.unpersist(); () }
        }
        .start()
      try {
        mem.addData(batchA: _*)
        q.processAllAvailable()
        mem.addData(batchB: _*)
        q.processAllAvailable()
        mem.addData(batchC: _*)
        q.processAllAvailable()
      } finally stopRecording(q)
      s.read.parquet(outDir)
    },
    // the FINGERPRINT index's CDC loop — the Hamming family was the one
    // persisted index without a streaming lifecycle witness: frame-grain
    // events (op, frame_key = asset·8 + frame, dhash) arrive in three
    // micro-batches over the CAPPED corpus index (maxBucket = 64, the
    // frame family's production posture). Each cycle probes the batch's
    // U fingerprints (seeing the index state from strictly earlier
    // batches), appends them back (appends are never re-capped — the
    // documented posture, so the stream also witnesses the cap/append
    // interplay), and tombstones the D keys. Batch A carries takedowns
    // of the md5%3 corpus-asset stratum at FRAME grain
    // (probe-before-delete keeps batch A's matches); batch B re-appends
    // the even-asset half of the takedowns as fresh U events — the
    // D-then-U case on the composite frame_key, pinning that the
    // asset·8+frame id scheme survives at-least-once delivery; batch
    // C's probes must see the re-appended rows (their era beats the
    // tombstone) and must NOT see the still-retracted odd half. The
    // oracle replays arrival-order × retraction visibility with the
    // layout cap riding ONLY the era-0 corpus rows
    "stream_mm_index_retract" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val fh = frameHashes(s, dir)
      val corpus = fh.filter(col("asset_id") % 5 =!= 0)
      val table = Scratch.table("mm_retract")
      val tomb = Similarity.tombTable(table)
      Scratch.registerTable(tomb)
      // layout time: persist resets index, tombstones AND version history
      // each invocation (bench reruns in one JVM); the spilled hash frame
      // keeps the GIF decode out of the per-invocation cost
      Multimodal.persistHammingIndex(
        corpus, "frame_key", "dhash", table, buckets = 8, maxBucket = 64)
      val outDir = Scratch.dir("mm_retract", dir)
      Scratch.reset(outDir)
      val g3 = graft.ops.Hashing.md5Mod(col("asset_id").cast("string"), 3L) === 0
      val delKeys: Array[Long] = corpus.filter(g3).select(col("frame_key")).as[Long].collect()
      def keyed(df: DataFrame): Seq[(Long, Long)] =
        df.select(col("frame_key"), col("dhash")).as[(Long, Long)].collect().toSeq
      val upsA = keyed(fh.filter(col("asset_id") % 15 === 0))
      val upsB = keyed(fh.filter(col("asset_id") % 15 === 5)) ++
        keyed(corpus.filter(g3 && col("asset_id") % 2 === 0))
      val upsC = keyed(fh.filter(col("asset_id") % 15 === 10))
      val batchA: Seq[(String, Long, Long)] =
        upsA.map(v => ("U", v._1, v._2)) ++ delKeys.toSeq.map(k => ("D", k, 0L))
      val batchB: Seq[(String, Long, Long)] = upsB.map(v => ("U", v._1, v._2))
      val batchC: Seq[(String, Long, Long)] = upsC.map(v => ("U", v._1, v._2))
      val mem = MemoryStream[(String, Long, Long)]
      val q = mem.toDF().toDF("op", "frame_key", "dhash").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist() // read three ways: probe, append, delete
          try {
            // cross-session relation-cache refresh, index and tombstones
            // both (the stream_index_maintain staleness trap)
            s.catalog.refreshTable(table)
            if (s.catalog.tableExists(tomb)) s.catalog.refreshTable(tomb)
            val ups = b.filter(col("op") === "U").select(col("frame_key"), col("dhash"))
            Multimodal
              .probeHammingIndex(s, table, ups, "frame_key", "dhash", maxHamming = 8)
              .write.mode("append").parquet(outDir)
            Multimodal.appendHammingIndex(ups, "frame_key", "dhash", table, buckets = 8)
            val dels = b.filter(col("op") === "D").select(col("frame_key"))
            if (!dels.isEmpty) Multimodal.deleteFromHammingIndex(s, table, dels, col("frame_key"))
          } finally { b.unpersist(); () }
        }
        .start()
      try {
        // A, B, C stay SEPARATE micro-batches — the append+delete between
        // them (and the re-append's era beating the tombstone's) is the
        // semantics under test
        mem.addData(batchA: _*)
        q.processAllAvailable()
        mem.addData(batchB: _*)
        q.processAllAvailable()
        mem.addData(batchC: _*)
        q.processAllAvailable()
      } finally stopRecording(q)
      s.read.parquet(outDir)
    },
    // the SEMANTIC index's CDC loop — the last of the four persisted
    // families to gain a streaming lifecycle witness (LSH r18, IVFPQ r18,
    // Hamming r19): vectors arrive as (op, vec_id, embedding) events in
    // three micro-batches over the cell-bucketed semantic index under the
    // PINNED full-corpus centroids; each cycle probes (cosine ≥ τ within
    // the assigned cell, seeing strictly-earlier state), appends, and
    // tombstones the D ids. Batch A carries takedowns of the era-0 md5%5
    // stratum (probe-before-delete keeps batch A's matches); batch B
    // re-appends its even half (D-then-U — fresh era beats the
    // tombstone); batch C's probes see the re-appends, not the
    // still-retracted odd half. Same strata as the ANN twin so the two
    // families' fixtures stay comparable; the oracle replays the
    // arrival-order × retraction visibility over the trained-quantizer
    // cell assignment
    "stream_sem_index_retract" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val g = graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 4L)
      val table = Scratch.table("sem_retract")
      val tomb = Similarity.tombTable(table)
      Scratch.registerTable(tomb)
      // layout time: index AND tombstones reset each invocation (bench
      // reruns in one JVM — stale tombstones would hide batch-A probes'
      // retracted partners too early)
      s.sql(s"DROP TABLE IF EXISTS $tomb")
      Dedup.persistSemanticIndex(
        e.filter(g =!= 0), col("vec_id"), col("embedding"), cents, table, buckets = 8)
      val outDir = Scratch.dir("sem_retract", dir)
      Scratch.reset(outDir)
      val del5 = graft.ops.Hashing.md5Mod(col("vec_id").cast("string"), 5L) === 0
      val delIds: Array[Long] = e
        .filter(g =!= 0 && del5)
        .select(col("vec_id")).as[Long].collect()
      def vecs(df: DataFrame): Seq[(Long, Seq[Float])] =
        df.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect().toSeq
      val upsA = vecs(e.filter(g === 0 && col("vec_id") % 2 === 0))
      val upsB = vecs(e.filter(g === 0 && col("vec_id") % 4 === 1)) ++
        vecs(e.filter(g =!= 0 && del5 && col("vec_id") % 2 === 0))
      val upsC = vecs(e.filter(g === 0 && col("vec_id") % 4 === 3))
      val batchA: Seq[(String, Long, Seq[Float])] =
        upsA.map(v => ("U", v._1, v._2)) ++ delIds.toSeq.map(id => ("D", id, Seq.empty[Float]))
      val batchB: Seq[(String, Long, Seq[Float])] = upsB.map(v => ("U", v._1, v._2))
      val batchC: Seq[(String, Long, Seq[Float])] = upsC.map(v => ("U", v._1, v._2))
      val mem = MemoryStream[(String, Long, Seq[Float])]
      val q = mem.toDF().toDF("op", "vec_id", "embedding").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist() // read three ways: probe, append, delete
          try {
            // cross-session relation-cache refresh, index and tombstones
            // both (the stream_index_maintain staleness trap)
            s.catalog.refreshTable(table)
            if (s.catalog.tableExists(tomb)) s.catalog.refreshTable(tomb)
            val ups = b.filter(col("op") === "U").select(col("vec_id"), col("embedding"))
            // tau = 0.25, witness-driven: at 0.42 the g0 stratum splits
            // produce only era-0 pairs at sf0.01 (the append-back and
            // D-then-U clauses would pass vacuously); at 0.25 every
            // visibility clause has measured witnesses (6 re-append
            // pairs, 30+ cross-batch append pairs, 39 probe-before-delete)
            Dedup
              .probeSemanticIndex(
                s, table, ups, col("vec_id"), col("embedding"), cents, tau = 0.25)
              .write.mode("append").parquet(outDir)
            Dedup.appendSemanticIndex(
              ups, col("vec_id"), col("embedding"), cents, table, buckets = 8)
            val dels = b.filter(col("op") === "D").select(col("vec_id"))
            if (!dels.isEmpty) Dedup.deleteFromSemanticIndex(s, table, dels, col("vec_id"))
          } finally { b.unpersist(); () }
        }
        .start()
      try {
        mem.addData(batchA: _*)
        q.processAllAvailable()
        mem.addData(batchB: _*)
        q.processAllAvailable()
        mem.addData(batchC: _*)
        q.processAllAvailable()
      } finally stopRecording(q)
      s.read.parquet(outDir)
    },
    // the maintenance POLICY as a SCHEDULED LOOP — the production shape
    // the batch plan/apply/fixpoint queries rehearse one arc of: four
    // micro-batches of incoming docs append into the persisted LSH
    // index, and EVERY cycle runs census → indexMaintenancePlan →
    // applyMaintenancePlan (the real executor, real compactLshIndex).
    // Era pressure builds (persist = 1 era, each append +1), the
    // compactAppendEras = 3 literal fires on every second batch, the
    // compact collapses the survivors to ONE era (the r19 era-horizon
    // contract — without it the policy would re-trigger forever), and
    // the NEXT cycle's census replans over the healed state: the
    // decision trace none → compact → none → compact IS the policy's
    // limit cycle under constant append pressure. Output = the per-cycle
    // plan rows (batch, census, decision); the oracle re-derives the era
    // recurrence and the cumulative doc census arithmetically
    "stream_index_maintenance_loop" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docsDf = t(s, dir, "documents")
      val corpus = docsDf.filter(col("doc_id") % 5 =!= 0)
      val table = Scratch.table("lsh_mloop")
      Scratch.registerVersionedIndex(table)
      s.sql(s"DROP TABLE IF EXISTS ${Similarity.tombTable(table)}")
      graft.sources.Sources.writeBucketed(
        Dedup.spilled(
          Dedup.lshIndex(corpus, col("doc_id"), col("text"), n = 3, k = 8, bands = 4),
          "lsh_maint_bands").withColumn("seq", lit(0L)),
        table, 8, "band", "bh")
      // four batches: the incoming %5 stratum split by (doc_id%20)/5
      val feed: Seq[Seq[(Long, Long, String)]] = (0 until 4).map { b4 =>
        docsDf.filter(col("doc_id") % 5 === 0 && (col("doc_id") % 20) / 5 === b4)
          .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
          .map(d => (b4 + 1L, d._1, d._2))
      }
      // the recorded trace is FLEET-METADATA grain (one plan row per index
      // per tick, already collect()ed for the apply) — buffer it on the
      // driver instead of paying a parquet append + commit per tick plus a
      // read-back; rows and values are identical (concurrent queue: the
      // foreachBatch body runs on the stream-execution thread)
      val trace = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
      val fleet = Map("lsh_text" -> Maintenance.ManagedIndex(
        table, "corpus_id",
        compact = () => Dedup.compactLshIndex(s, table, buckets = 8),
        // drift is 0 for a model-free text index, so this fixture never
        // reaches rebuild; the registration is still the real authority
        // rebuild (the executor contract wants a complete ManagedIndex)
        rebuild = () =>
          Dedup.rebuildLshIndex(s, table, docsDf, col("doc_id"), col("text"), buckets = 8)))
      val mem = MemoryStream[(Long, Long, String)]
      val q = mem.toDF().toDF("batch", "doc_id", "text").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist()
          try {
            // empty micro-batch (a feed stratum can be empty at small SF):
            // max over zero rows is null — skip the cycle. One aggregate
            // probes emptiness AND reads the batch id (isEmpty + a second
            // agg was two jobs per tick for the same answer).
            val bidRow = b.agg(max(col("batch"))).collect()(0)
            if (!bidRow.isNullAt(0)) {
            val bid = bidRow.getLong(0)
            s.catalog.refreshTable(table)
            Dedup.appendLshIndex(
              b.select(col("doc_id"), col("text")), col("doc_id"), col("text"),
              table, buckets = 8, n = 3, k = 8, bands = 4)
            // the appended files land through the stream-execution clone;
            // THIS session's census must see them
            s.catalog.refreshTable(table)
            val census = Maintenance
              .indexCensus(s, table, "corpus_id", "lsh_text")
              .withColumn("drift_ppm", lit(0L))
            val plan = Maintenance.indexMaintenancePlan(
              census,
              rebuildDriftPpm = 1200000L,
              compactTombPpm = 100000L,
              compactAppendEras = 3L)
            // materialize ONCE: the recorded row and the applied decision
            // must be the same observation (a lazy plan would re-census)
            val planRows = plan.collect()
            val planDf = s.createDataFrame(
              java.util.Arrays.asList(planRows: _*), plan.schema)
            planRows.foreach(r => trace.add(Row.fromSeq(r.toSeq :+ bid)))
            // audit = false: the loop records the PLAN rows, not the audit —
            // the discarded per-cycle re-census was pure overhead
            Maintenance.applyMaintenancePlan(s, planDf, fleet, audit = false): Unit
          } } finally { b.unpersist(); () }
        }
        .start()
      try {
        feed.foreach { events =>
          mem.addData(events: _*)
          q.processAllAvailable()
        }
      } finally stopRecording(q)
      val traceSchema =
        Maintenance.planSchema.add("batch", org.apache.spark.sql.types.LongType)
      s.createDataFrame(
        java.util.Arrays.asList(trace.toArray(Array.empty[Row]): _*), traceSchema)
        .select(
          col("batch"), col("index_name"), col("index_docs"), col("tomb_entries"),
          col("append_eras"), col("tomb_ppm"), col("drift_ppm"), col("capped_ppm"),
          col("decision"))
    },
    // the scheduled loop GENERALIZED TO THE FLEET: every micro-batch runs
    // ONE census→plan→apply over all four persisted-index families
    // through the shared registry recipe (QAnn.maintenanceRegistry — the
    // same ManagedIndex entries the batch plan/apply/fixpoint queries
    // use), with per-family pressure STAGGERED so each tick's decision
    // vector mixes compact and none: cycle 1 finds the LSH index carrying
    // its md5%3 takedown tombstones (compact; the other three healthy),
    // cycle 2 arrives carrying the frame index's %3 append stratum —
    // appends are never re-capped, so the quarantined boilerplate buckets
    // regrow and ONLY capped_ppm demands that compact (LSH is healed by
    // now: none). ANN and semantic members never mutate, so their tables
    // build once per corpus (tableOnce); the two mutated members rebuild
    // per run. Output = the per-cycle plan rows; the oracle re-derives
    // both cycles' censuses from the md5/modulo strata and the shared
    // frame-hash replay arithmetically
    "stream_fleet_maintenance_loop" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val coarse = Similarity.kmeansCentroidsCached(e, "vec_id", "embedding", nlist = 8, iters = 2)
      val dcorp = docs.filter(col("doc_id") % 5 =!= 0)
      val scorp = e.filter(col("vec_id") % 5 =!= 0)
      val hcorp = frameHashes(s, dir).filter(col("asset_id") % 5 =!= 0)
      val annTbl = Scratch.table("ann_floop")
      Scratch.registerVersionedIndex(annTbl)
      Scratch.tableOnce(annTbl, dir) {
        val books = Similarity.pqTrainCached(e, "vec_id", "embedding", nsub = 4, nlistSub = 4, iters = 1)
        Similarity.persistAnnIndex(e, "vec_id", "embedding", coarse, books, annTbl, buckets = 8)
      }
      val semTbl = Scratch.table("sem_floop")
      Scratch.registerVersionedIndex(semTbl)
      Scratch.tableOnce(semTbl, dir)(
        Dedup.persistSemanticIndex(scorp, col("vec_id"), col("embedding"), coarse, semTbl, buckets = 8))
      val lshTbl = Scratch.table("lsh_floop")
      Scratch.registerVersionedIndex(lshTbl)
      Dedup.persistLshIndex(
        dcorp, col("doc_id"), col("text"), table = lshTbl, buckets = 8, n = 3, k = 8, bands = 4)
      Dedup.deleteFromLshIndex(
        s, lshTbl,
        dcorp.filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 3L) === 0),
        col("doc_id"))
      val hamTbl = Scratch.table("frm_floop")
      Scratch.registerVersionedIndex(hamTbl)
      Multimodal.persistHammingIndex(
        hcorp.filter(col("asset_id") % 3 =!= 0), "frame_key", "dhash", hamTbl,
        buckets = 8, maxBucket = 64)
      // the loop models the steady-state scheduler: each tick's crawl is
      // fresh and undrifted, so the ANN drift thunk is the zero literal
      // (the MEASURED-drift arc is index_maintenance_plan/fixpoint's job)
      val registry = QAnn.maintenanceRegistry(
        s, dir, annTbl, lshTbl, semTbl, hamTbl,
        annDrift = () => s.range(1).select(lit(0L).as("drift_ppm")))
      // driver-grain trace buffer — same shape as the single-index loop:
      // the plan rows are already collect()ed for the apply, so the
      // per-tick parquet append + read-back was pure transport overhead
      val trace = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
      // cycle 1: a bare scheduler tick (marker row, no appends);
      // cycle 2: the frame index's never-re-capped append stratum
      val appendRows: Seq[(Long, Long, Long)] = hcorp
        .filter(col("asset_id") % 3 === 0)
        .select(col("frame_key"), col("dhash")).as[(Long, Long)].collect().toSeq
        .map(r => (2L, r._1, r._2))
      val mem = MemoryStream[(Long, Long, Long)]
      val q = mem.toDF().toDF("batch", "frame_key", "dhash").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val b = batch.persist()
          try {
            // one aggregate probes emptiness, the batch id AND whether any
            // append rows arrived (three separate jobs before)
            val probe = b.agg(
              max(col("batch")),
              sum(when(col("frame_key") >= 0, 1L).otherwise(0L))).collect()(0)
            if (!probe.isNullAt(0)) {
            val bid = probe.getLong(0)
            s.catalog.refreshTable(hamTbl)
            if (probe.getLong(1) > 0L) {
              val appends =
                b.filter(col("frame_key") >= 0).select(col("frame_key"), col("dhash"))
              Multimodal.appendHammingIndex(appends, "frame_key", "dhash", hamTbl, buckets = 8)
              // appended files land through the stream-execution clone;
              // THIS session's census must see them
              s.catalog.refreshTable(hamTbl)
            }
            val plan = Maintenance.indexMaintenancePlan(
              Maintenance.fleetCensus(s, registry),
              rebuildDriftPpm = 1200000L,
              compactTombPpm = 100000L,
              compactAppendEras = 4L,
              compactCappedPpm = 50000L)
            // materialize ONCE: the recorded rows and the applied
            // decisions must be the same observation
            val planRows = plan.collect()
            val planDf = s.createDataFrame(
              java.util.Arrays.asList(planRows: _*), plan.schema)
            planRows.foreach(r => trace.add(Row.fromSeq(r.toSeq :+ bid)))
            // audit = false: same discarded-audit shape as the single-index loop
            Maintenance.applyMaintenancePlan(s, planDf, registry, audit = false): Unit
          } } finally { b.unpersist(); () }
        }
        .start()
      try {
        Seq(Seq((1L, -1L, 0L)), appendRows).foreach { events =>
          mem.addData(events: _*)
          q.processAllAvailable()
        }
      } finally stopRecording(q)
      val traceSchema =
        Maintenance.planSchema.add("batch", org.apache.spark.sql.types.LongType)
      s.createDataFrame(
        java.util.Arrays.asList(trace.toArray(Array.empty[Row]): _*), traceSchema)
        .select(
          col("batch"), col("index_name"), col("index_docs"), col("tomb_entries"),
          col("append_eras"), col("tomb_ppm"), col("drift_ppm"), col("capped_ppm"),
          col("decision"))
    },
    // eleventh stream/batch parity surface: CDC apply as a STREAMING
    // max_by aggregation (complete mode, no watermark — state is one row
    // per key, planned by Catalyst, no custom state code). The drained
    // snapshot must hash-match the batch scd_changelog_apply oracle
    "stream_changelog_parity" -> { (s0, dir) =>
      // micro-batch state work runs on the low-partition clone (see streamSession)
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      val asInserts = base.withColumn("op", lit("U")).withColumn("seq", lit(Long.MinValue))
      val upserts = base
        .filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("op", lit("U"))
        .withColumn("seq", lit(1L))
      val deletes = base
        .filter(col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("D"))
        .withColumn("seq", lit(2L))
      val changelog: Array[(Long, Long, Double, String, String, Long)] = asInserts
        .unionByName(upserts)
        .unionByName(deletes)
        .as[(Long, Long, Double, String, String, Long)]
        .collect()
      val mem = MemoryStream[(Long, Long, Double, String, String, Long)]
      val snap = graft.ops.ChangeOps.applyChangelogAgg(
        mem.toDF().toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", "op", "seq"),
        Seq("o_orderkey"), "op", "seq",
        Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"))
      val sink = s"stream_changelog_parity_${System.nanoTime()}"
      feedChunked(mem, changelog.toSeq)
      val q = snap.writeStream.format("memory").queryName(sink).outputMode("complete").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(identity)
    },
    // thirteenth stream/batch parity surface: the KLL gate is a pure
    // per-row filter (stateless, append mode) — stream the orders rows,
    // drain the surviving sample, and the quantile read off the drained
    // sketch must hash-match the batch sketch_kll_quantiles oracle
    // verbatim (the sketch is a pure function of the multiset, so HOW the
    // rows arrived cannot matter)
    "stream_kll_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rows: Array[(Long, Double)] = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Double)]
        .collect()
      val mem = MemoryStream[(Long, Double)]
      val sk = Sketches.kllSketch(
        mem.toDF().toDF("o_orderkey", "o_totalprice"),
        col("o_totalprice"), col("o_orderkey"), level = 4)
      val sink = s"stream_kll_parity_${System.nanoTime()}"
      feedChunked(mem, rows.toSeq)
      val q = sk.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      Sketches.kllQuantiles(drainSink(s, sink)(identity), (1 to 9).map(_ / 10.0))
    },
    // fourteenth stream/batch parity surface: DSIR model SERVING. The
    // weight table is trained batch-side (256 longs — model state), baked
    // into a literal array, and the document stream is scored stateless
    // map-only (dsirScoreColumn: one HOF pass, no explode/join/shuffle,
    // append mode with no state store). The drained scores hash-match the
    // exploded batch form's oracle, shared verbatim — the layout-vs-
    // meaning contract for model serving.
    // streaming twin of corpus_mix_temperature (SAME oracle): the √n̅
    // weight table + bottleneck train relationally once, bake into the
    // plan as literals, and the stream filter is a pure stateless gate —
    // no state store, no join, the DSIR-serving pattern for mixing
    "stream_mix_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docsDf = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val model = Curation.temperatureMixModel(docsDf, col("source"))
      val rows: Array[(Long, String)] = docsDf.as[(Long, String)].collect()
      val mem = MemoryStream[(Long, String)]
      val kept = mem
        .toDF()
        .toDF("doc_id", "source")
        .filter(Curation.temperatureGate(col("doc_id"), col("source"), model))
      val sink = s"stream_mix_parity_${System.nanoTime()}"
      feedChunked(mem, rows.toSeq)
      val q = kept.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(identity)
    },
    // streaming twin of the ingest-boundary quarantine: the routing flag
    // is a pure map-only column (JacksonParser in codegen, no state), so
    // the SAME parseWithQuarantine call classifies the firehose — corrupt
    // records on a stream must route, never kill the query. Hash-matches
    // the batch json_valid oracle verbatim.
    "stream_ingest_quarantine_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      import org.apache.spark.sql.types._
      val p0 = concat(
        lit("{\"id\":"), col("doc_id").cast("string"),
        lit(",\"lang\":\""), coalesce(col("lang"), lit("xx")),
        lit("\",\"n\":"), col("n_chars").cast("string"), lit("}"))
      val rows: Array[(Long, String)] = t(s, dir, "documents")
        .select(
          col("doc_id"),
          when(col("doc_id") % 7 === 3, substring(p0, 2, 1000000))
            .when(col("doc_id") % 11 === 5, concat(lit("garbage-"), col("doc_id").cast("string")))
            .otherwise(p0)
            .as("payload"))
        .as[(Long, String)]
        .collect()
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("lang", StringType), StructField("n", LongType)))
      val mem = MemoryStream[(Long, String)]
      val routed = graft.ops.IngestOps
        .parseWithQuarantine(
          mem.toDF().toDF("doc_id", "payload"),
          col("payload"), schema, required = Seq("id", "lang", "n"))
        .select(
          col("doc_id"),
          col("ingest_ok"),
          when(col("ingest_ok"), col("parsed.lang")).as("lang_parsed"),
          when(col("ingest_ok"), col("parsed.n")).as("n_parsed"))
      val sink = s"stream_ingest_quarantine_${System.nanoTime()}"
      feedChunked(mem, rows.toSeq)
      val q = routed.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(identity)
    },
    // streaming twin of the NB classifier's serving half: the model fits
    // relationally batch-side (bounded state, vocabK × |classes|), bakes
    // into the plan as literals via Classify.nbServe, and the stream is a
    // pure stateless map — no join, no state store, the same discipline as
    // DSIR/mixing serving. Per-doc predictions hash-match the batch
    // argmax oracle, so "classify the firehose" is certified against
    // "classify the table".
    "stream_nb_classify_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docs = t(s, dir, "documents")
      val model = graft.ext.Classify.nbFit(
        docs, col("doc_id"), col("text"), col("lang"),
        trainPermille = 800, vocabK = 64, corpusKey = s"documents|$dir")
      // harness feed: the held-out stratum (bounded fixture rows)
      val rows: Array[(Long, String, String)] = docs
        .filter(graft.ops.Hashing.md5Mod(col("doc_id").cast("string"), 1000L) >= 800)
        .select(col("doc_id"), col("lang"), col("text"))
        .as[(Long, String, String)]
        .collect()
      val mem = MemoryStream[(Long, String, String)]
      val pred = mem
        .toDF()
        .toDF("doc_id", "label", "text")
        .select(
          col("doc_id"), col("label"),
          graft.ext.Classify.nbServe(col("text"), model).as("predicted"))
      val sink = s"stream_nb_classify_${System.nanoTime()}"
      feedChunked(mem, rows.toSeq)
      val q = pred.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(identity)
    },
    // fit-batch / serve-stream for the PCA family (the NB precedent): the
    // component is fitted once relationally (through the fitted-model memo,
    // so the batch emb_pca_project query and this twin share the pass) and
    // baked into the plan as literals — the IDENTICAL map-only column then
    // scores the firehose, and the output hash-matches the batch oracle.
    "stream_pca_serve_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val cov = graft.ext.EmbAlgebra.covPpmMatrixCached(e, col("embedding"), dim = 64)
      val (v, prev, lambda) = graft.ext.EmbAlgebra.topComponent(cov, rounds = 6)
      val delta = v.zip(prev).map { case (a, b) => math.abs(a - b) }.max
      val rows: Array[(Long, Seq[Float])] = e
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])]
        .collect()
      val mem = MemoryStream[(Long, Seq[Float])]
      val scored = mem
        .toDF()
        .toDF("vec_id", "embedding")
        .select(
          col("vec_id"),
          graft.ext.EmbAlgebra.projectScore(col("embedding"), v).as("score"),
          lit(lambda).as("lambda_ppm"),
          lit(delta).as("conv_delta"))
      val sink = s"stream_pca_serve_${System.nanoTime()}"
      feedChunked(mem, rows.toSeq)
      val q = scored.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(identity)
    },
    "stream_dsir_parity" -> { (s0, dir) =>
      val s = streamSession(s0)
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docsDf = t(s, dir, "documents")
      val weights: Seq[Long] = Curation
        .dsirBucketWeights(docsDf, docsDf.filter(col("lang") === "en"), col("text"))
        .orderBy(col("bucket"))
        .collect()
        .map(_.getLong(1))
        .toSeq
      val rows: Array[(Long, String)] = docsDf
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .collect()
      val mem = MemoryStream[(Long, String)]
      val scored = mem
        .toDF()
        .toDF("doc_id", "text")
        // the relational batch form DROPS tokenless docs; mirror that here
        // (the serving column scores them 0) so the row sets agree
        .filter(size(filter(split(trim(col("text")), "\\s+"), t => t =!= "")) > 0)
        .select(col("doc_id"), Curation.dsirScoreColumn(col("text"), weights).as("score"))
      val sink = s"stream_dsir_parity_${System.nanoTime()}"
      feedChunked(mem, rows.toSeq)
      val q = scored.writeStream.format("memory").queryName(sink).outputMode("append").start()
      try q.processAllAvailable()
      finally stopRecording(q)
      drainSink(s, sink)(identity)
    },
  )

  val oracles: Map[String, String] = Map(
    // parity: the streaming candidate set must be EXACTLY the batch one
    "stream_lsh_parity" -> minhashPairsOracleSql,
    "stream_lsh_survivors" ->
      (verifiedClusterChainSql + """
        , cl AS (SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id)
        , lab AS (
          SELECT d.doc_id, d.n_chars, coalesce(cl.canonical_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN cl USING (doc_id))
        SELECT doc_id, cluster_id, n_chars FROM (
          SELECT *, row_number() OVER (PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rk
          FROM lab)
        WHERE rk = 1"""),
    // the streaming stream-static probe must reduce to the batch answer
    "stream_incremental_parity" -> incrementalProbeSql,
    // maintenance-loop parity: (a, b) pairs exactly when a ARRIVED strictly
    // after b — corpus is epoch 0, stream batch A (doc_id%10=2) is 1,
    // batch B (doc_id%10=7) is 2. Same banding and verify tail as the
    // other incremental oracles. At sf0.01 the pair (377 -> 72) crosses
    // the two stream batches: it is emitted ONLY via the append-back.
    "stream_index_maintain" ->
      (gramsCte + sigBandedCte + """
        , cands AS (
          SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
          FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh
          WHERE (CASE WHEN a.doc_id % 5 <> 2 THEN 0 WHEN a.doc_id % 10 = 2 THEN 1 ELSE 2 END)
              > (CASE WHEN b.doc_id % 5 <> 2 THEN 0 WHEN b.doc_id % 10 = 2 THEN 1 ELSE 2 END)
        )
        SELECT new_id, corpus_id,
          round(CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                / len(list_distinct(list_concat(ga.grams, gb.grams))), 6) AS jac
        FROM cands
        JOIN g ga ON ga.doc_id = new_id
        JOIN g gb ON gb.doc_id = corpus_id
        WHERE CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
              / len(list_distinct(list_concat(ga.grams, gb.grams))) >= 0.7"""),
    // CDC-loop parity: arrival order, retraction AND re-append — a pair
    // exists when the corpus doc has a live index row from a batch
    // strictly earlier than the new doc's. Epoch 1 queries (doc_id%10=2)
    // see all of epoch 0 (probe-before-delete); epoch 2 queries (%10=7
    // minus the two moved probes, plus the re-appended 45/70 themselves)
    // see epoch 0 minus the md5%3 takedowns, plus epoch 1's appends;
    // epoch 3 queries (267, 447) ADDITIONALLY see epoch 2's appends —
    // including the RE-APPENDED 45/70, whose fresh era beats their
    // tombstone (the D-then-U visibility era-aware tombstones add).
    "stream_index_retract" ->
      incrementalProbeSqlFor(
        "a.doc_id % 10 IN (2, 7) OR a.doc_id IN (45, 70)",
        s"""(a.doc_id % 10 = 2 AND b.doc_id % 5 <> 2)
              OR (((a.doc_id % 10 = 7 AND a.doc_id NOT IN (267, 447)) OR a.doc_id IN (45, 70)) AND (
                   (b.doc_id % 5 <> 2 AND NOT (${md5GateSql("b.doc_id", 3)}))
                   OR b.doc_id % 10 = 2))
              OR (a.doc_id IN (267, 447) AND (
                   (b.doc_id % 5 <> 2 AND NOT (${md5GateSql("b.doc_id", 3)}))
                   OR b.doc_id % 10 = 2
                   OR (b.doc_id % 10 = 7 AND b.doc_id NOT IN (267, 447))
                   OR b.doc_id IN (45, 70)))"""),
    // the ANN index maintenance cycle: arrival-order candidate visibility
    // (era-0 always; batch A only to batch B) under the pinned model
    "stream_ann_index_maintain" -> streamAnnMaintainSql,
    // plus retraction: the md5%5 era-0 stratum vanishes for batch-B
    // queries (probe-before-delete keeps it for batch A's)
    "stream_ann_index_retract" -> streamAnnRetractSql,
    // the semantic family's CDC loop: the trained-quantizer cell probe
    // (qz + kmeans CTEs shared with the batch semantic twins) under
    // arrival-order × retraction visibility. Probe epochs: the g0 (md5%4)
    // incoming stratum splits 1/2/3 on %2 / %4, and the re-appended
    // takedown ids (corpus ∧ md5%5 ∧ even) probe as batch B (epoch 2).
    // Candidate visibility: era-0 corpus rows vanish for epochs ≥ 2 when
    // tombstoned; epoch-1 appends visible to 2+; epoch-2 appends
    // (incoming %4=1 AND the re-appends, whose fresh era beats their
    // tombstone) visible to epoch 3 only
    "stream_sem_index_retract" ->
      (qzCte + "\n        " + ivfKmeansCtesSql + s"""
        , av AS (
          SELECT a.cell, a.vec_id, z.q FROM assign a JOIN qz z USING (vec_id)
        ), pr AS (
          SELECT av.*,
                 CASE WHEN (${md5GateSql("vec_id", 4)}) AND vec_id % 2 = 0 THEN 1
                      WHEN (${md5GateSql("vec_id", 4)}) AND vec_id % 4 = 1 THEN 2
                      WHEN (${md5GateSql("vec_id", 4)}) AND vec_id % 4 = 3 THEN 3
                      ELSE 2 END AS e
          FROM av
          WHERE (${md5GateSql("vec_id", 4)})
             OR (NOT (${md5GateSql("vec_id", 4)}) AND (${md5GateSql("vec_id", 5)})
                 AND vec_id % 2 = 0)
        ), sprs AS (
          SELECT x.vec_id AS new_id, y.vec_id AS corpus_id,
                 round(${cosSql("x.q", "y.q")}, 6) AS sim
          FROM pr x JOIN av y ON x.cell = y.cell
          WHERE (NOT (${md5GateSql("y.vec_id", 4)})
                 AND (NOT (${md5GateSql("y.vec_id", 5)}) OR x.e = 1))
             OR ((${md5GateSql("y.vec_id", 4)}) AND y.vec_id % 2 = 0 AND x.e >= 2)
             OR ((((${md5GateSql("y.vec_id", 4)}) AND y.vec_id % 4 = 1)
                  OR (NOT (${md5GateSql("y.vec_id", 4)}) AND (${md5GateSql("y.vec_id", 5)})
                      AND y.vec_id % 2 = 0))
                 AND x.e = 3)
        )
        SELECT new_id, corpus_id, sim FROM sprs WHERE sim >= 0.25"""),
    // the scheduled-maintenance-loop trace, re-derived arithmetically:
    // index_docs at batch b = |corpus| + Σ strata ≤ b (appends add
    // distinct ids, nothing retracts); the era recurrence under the
    // compactAppendEras = 3 literal is a period-2 limit cycle — persist
    // holds 1 era, each append adds one, the compact that fires at 3
    // collapses the survivors to ONE era (the era-horizon contract), so
    // eras(b) = 2 for odd b (→ none), 3 for even b (→ compact); all the
    // other signals are identically zero for a model-free, uncapped,
    // untombstoned text index
    "stream_index_maintenance_loop" ->
      """WITH c AS (
           SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE doc_id % 5 <> 0),
         i AS (
           SELECT (doc_id % 20) // 5 + 1 AS b, CAST(count(*) AS BIGINT) AS n
           FROM documents WHERE doc_id % 5 = 0 GROUP BY 1),
         t AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS batch)
         SELECT t.batch, 'lsh_text' AS index_name,
                CAST(c.n + (SELECT COALESCE(sum(n), 0) FROM i WHERE i.b <= t.batch)
                     AS BIGINT) AS index_docs,
                CAST(0 AS BIGINT) AS tomb_entries,
                CAST(CASE WHEN t.batch % 2 = 1 THEN 2 ELSE 3 END AS BIGINT) AS append_eras,
                CAST(0 AS BIGINT) AS tomb_ppm,
                CAST(0 AS BIGINT) AS drift_ppm,
                CAST(0 AS BIGINT) AS capped_ppm,
                CASE WHEN t.batch % 2 = 1 THEN 'none' ELSE 'compact' END AS decision
         FROM t CROSS JOIN c""",
    // the fleet loop's two-cycle decision trace, re-derived
    // arithmetically per family: ANN/semantic are single-era pristine
    // builds (none both cycles); LSH carries the md5%3 takedown stratum
    // at cycle 1 (tomb_ppm ≈ 333 333 ≥ 100 000 → compact) and reads
    // healed at cycle 2 (docs minus the folded stratum, none); the frame
    // index is the capped persist stratum (%3≠0, capped_ppm 0, none) at
    // cycle 1, then the never-re-capped %3 append regrows the
    // boilerplate buckets — cycle 2's capped_ppm is the over-cap stored
    // mass from the shared frame-hash replay (≥ 50 000 → compact)
    "stream_fleet_maintenance_loop" ->
      ("WITH " + QMultimodal.frameHashCtesBody + s""",
         hper AS (
           SELECT band, bv, count(*) AS n FROM bands
           WHERE id % 5 <> 0 AND id % 3 <> 0 GROUP BY 1, 2),
         hkept AS (
           SELECT b.key, b.band, b.bv FROM bands b
           JOIN hper c ON c.band = b.band AND c.bv = b.bv
           WHERE b.id % 5 <> 0 AND b.id % 3 <> 0 AND c.n <= 64),
         happ AS (SELECT key, band, bv FROM bands WHERE id % 5 <> 0 AND id % 3 = 0),
         hstored AS (SELECT * FROM hkept UNION ALL SELECT * FROM happ),
         hbc AS (SELECT band, bv, count(*) AS n FROM hstored GROUP BY 1, 2),
         hstats AS (
           SELECT CAST(sum(CASE WHEN n > 64 THEN n ELSE 0 END) AS BIGINT) AS capped_rows,
                  CAST(sum(n) AS BIGINT) AS total_rows FROM hbc),
         nl AS (
           SELECT CAST(count(*) AS BIGINT) AS docs,
                  CAST(count(CASE WHEN ${md5GateSql("doc_id", 3)} THEN 1 END) AS BIGINT)
                    AS tombs
           FROM documents WHERE doc_id % 5 <> 0),
         ne AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings WHERE vec_id % 5 <> 0),
         hk AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS n FROM hkept),
         hs AS (SELECT CAST(count(DISTINCT key) AS BIGINT) AS n FROM hstored)
         SELECT CAST(1 AS BIGINT) AS batch, 'ann_ivfpq' AS index_name,
                (SELECT n FROM ne) AS index_docs, CAST(0 AS BIGINT) AS tomb_entries,
                CAST(1 AS BIGINT) AS append_eras, CAST(0 AS BIGINT) AS tomb_ppm,
                CAST(0 AS BIGINT) AS drift_ppm, CAST(0 AS BIGINT) AS capped_ppm,
                'none' AS decision
         UNION ALL
         SELECT 1, 'lsh_text', (SELECT docs FROM nl), (SELECT tombs FROM nl), 1,
                (SELECT (tombs * 1000000) // greatest(docs, 1) FROM nl), 0, 0, 'compact'
         UNION ALL
         SELECT 1, 'semantic_cell', (SELECT n FROM ns), 0, 1, 0, 0, 0, 'none'
         UNION ALL
         SELECT 1, 'hamming_frame', (SELECT n FROM hk), 0, 1, 0, 0, 0, 'none'
         UNION ALL
         SELECT 2, 'ann_ivfpq', (SELECT n FROM ne), 0, 1, 0, 0, 0, 'none'
         UNION ALL
         SELECT 2, 'lsh_text', (SELECT docs - tombs FROM nl), 0, 1, 0, 0, 0, 'none'
         UNION ALL
         SELECT 2, 'semantic_cell', (SELECT n FROM ns), 0, 1, 0, 0, 0, 'none'
         UNION ALL
         SELECT 2, 'hamming_frame', (SELECT n FROM hs), 0, 2, 0, 0,
                (SELECT capped_rows * 1000000 // greatest(total_rows, 1) FROM hstats),
                'compact'"""),
    // the Hamming-family CDC loop: arrival-order × retraction visibility
    // over the shared frame-hash replay. Probe epochs: %15=0 → 1,
    // %15=5 → 2, %15=10 → 3, the re-appended takedown assets (corpus ∧
    // md5%3 ∧ even) probe as batch B (epoch 2). A candidate row is
    // visible when it arrived strictly earlier AND is live: era-0
    // corpus rows ride the layout cap (bucket ≤ 64) and vanish for
    // epochs ≥ 2 if tombstoned (md5%3); appended rows are UNCAPPED by
    // contract — epoch-1 appends visible to 2+, epoch-2 appends
    // (incoming %15=5 AND the re-appends, whose fresh era beats their
    // tombstone) visible to epoch 3 only
    "stream_mm_index_retract" ->
      ("WITH " + QMultimodal.frameHashCtesBody + s""",
        cbv AS (SELECT band, bv, count(*) AS n FROM bands WHERE id % 5 <> 0 GROUP BY 1, 2),
        probes AS (
          SELECT b.*,
                 CASE WHEN id % 15 = 0 THEN 1 WHEN id % 15 = 5 THEN 2
                      WHEN id % 15 = 10 THEN 3 ELSE 2 END AS e
          FROM bands b
          WHERE id % 5 = 0
             OR (id % 5 <> 0 AND (${md5GateSql("id", 3)}) AND id % 2 = 0))
        SELECT DISTINCT l.key AS new_id, r.key AS corpus_id,
               CAST(bit_count(xor(l.dhash, r.dhash)) AS INTEGER) AS hamming
        FROM probes l
        JOIN bands r ON l.band = r.band AND l.bv = r.bv
        LEFT JOIN cbv ON cbv.band = r.band AND cbv.bv = r.bv
        WHERE l.key <> r.key AND bit_count(xor(l.dhash, r.dhash)) <= 8
          AND ( (r.id % 5 <> 0 AND cbv.n <= 64
                 AND (NOT (${md5GateSql("r.id", 3)}) OR l.e = 1))
             OR (r.id % 15 = 0 AND l.e >= 2)
             OR ((r.id % 15 = 5
                  OR (r.id % 5 <> 0 AND (${md5GateSql("r.id", 3)}) AND r.id % 2 = 0))
                 AND l.e = 3) )"""),
    // the streaming max_by aggregation must drain to the batch snapshot
    "stream_changelog_parity" -> changelogApplySql,
    // the state-machine sessionizer uses sessionizeBatch's strict-> gap
    // rule, so its oracle is the batch session derivation projected to the
    // integer-exact fields
    "stream_state_session_parity" ->
      """WITH x AS (
           SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events
         ), y AS (
           SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                          THEN 1 ELSE 0 END AS brk
           FROM x
         ), z AS (
           SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM y
         )
         SELECT CAST(user_id AS VARCHAR) AS user_id,
                epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
                count(*) AS n_events
         FROM z GROUP BY user_id, session_id""",
    // session_window merges on OVERLAP: a gap of exactly 30min starts a
    // NEW session (>=), unlike sessionizeBatch's > — and end = last + gap
    "stream_session_parity" ->
      """WITH x AS (
           SELECT user_id, ts,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
           FROM events
         ), y AS (
           SELECT user_id, ts, CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
                          THEN 1 ELSE 0 END AS brk
           FROM x
         ), z AS (
           SELECT user_id, ts, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM y
         )
         SELECT user_id, epoch_us(min(ts)) AS start_us,
           epoch_us(max(ts)) + 1800000000 AS end_us,
           count(*) AS n_events
         FROM z GROUP BY user_id, session_id""",
    "stream_tumbling_parity" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, count(*) AS n
         FROM events GROUP BY 1, 2""",
    "stream_dedup_parity" ->
      """SELECT DISTINCT md5(text) AS h FROM documents""",
    "stream_sliding_parity" ->
      """WITH half AS (
           SELECT event_type,
             to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)) AS w0
           FROM events
         ), windows AS (
           SELECT event_type, unnest([w0, w0 - INTERVAL 30 MINUTE]) AS window_start
           FROM half
         )
         SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS n
         FROM windows GROUP BY 1, 2""",
    "stream_countmin_parity" ->
      """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS item FROM documents),
         tok2 AS (SELECT item FROM tok WHERE length(item) > 0),
         cells AS (
           SELECT j,
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', item)), 1, 8)) AS BIGINT) % 256 AS cell,
             CAST(count(*) AS BIGINT) AS cnt
           FROM tok2, range(0, 4) t(j) GROUP BY 1, 2),
         probes AS (SELECT unnest(['spark', 'table', 'the', 'zebra']) AS item),
         pc AS (SELECT item, j,
                  CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '_', item)), 1, 8)) AS BIGINT) % 256 AS cell
                FROM probes, range(0, 4) t(j)),
         est AS (SELECT item, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
                 FROM pc LEFT JOIN cells USING (j, cell) GROUP BY 1),
         ex AS (SELECT item, CAST(count(*) AS BIGINT) AS exact FROM tok2 GROUP BY 1)
         SELECT e.item AS token, e.est, coalesce(x.exact, 0) AS exact
         FROM est e LEFT JOIN ex x USING (item)""",
    // parity: the streaming decode must be EXACTLY the batch decode
    "stream_mm_decode_parity" -> decodeRealOracleSql,
    "stream_dsir_parity" -> dsirScoresSql,
    // the batch NB argmax per held-out doc, shared with text_nb_confusion
    "stream_nb_classify_parity" -> nbPredictionsSql,
    // serve == batch on the same rows, so the stream twin shares the
    // emb_pca_project oracle verbatim
    "stream_pca_serve_parity" -> embPcaProjectSql,
    // the batch routing oracle, shared with ingest_json_quarantine
    "stream_ingest_quarantine_parity" -> ingestQuarantineSql,
    // layout differs (stateless stream gate vs batch join), meaning must
    // not: the oracle is corpus_mix_temperature's verbatim
    "stream_mix_parity" -> tempMixSql,
    // the streaming as-of state machine must land byte-identical to the
    // batch operator, so the twins share ONE oracle
    "stream_asof_parity" -> evAsofJoinSql,
    // the streaming nearest state machine shares the batch twin's oracle:
    // the harness horizon exceeds the fixture's forward spread, so the
    // bounded-peek-ahead answer IS the unbounded one
    "stream_nearest_parity" -> evAsofNearestSql,
    // the streaming release must equal the batch release bit-for-bit:
    // state carries only the counts, the noise is post-state algebra
    "stream_dp_release_parity" -> dpCountsOracleSql,
    // the native watermarked stream-stream interval join must reproduce
    // the batch lookback join exactly, so the twins share ONE oracle
    "stream_lookback_parity" -> evAttributionLinearSql,
    "stream_kll_parity" -> kllQuantilesSql,
  )
}
