package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import graft.streaming.{Event, StatefulOps, StreamingOps, UserRunning}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming surface (SURVEY.md §2B "Streaming" rows), verified by
  * Structured Streaming's core contract: a streaming query over a
  * MemoryStream replay of the events fixture must equal the SAME
  * transform applied as a batch query — regardless of micro-batch
  * chunking. Covers tumbling/sliding/session windows, watermark
  * late-data drops, streaming dedup, stream–static join, arbitrary keyed
  * state (multi-batch), rate source, foreachBatch sink, and triggers.
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** events fixture as typed records, in event-time order (the order the
    * reference's single-threaded connector would deliver them,
    * `/root/reference/src/wsclient.hpp:40-53`).
    */
  private lazy val allEvents: Seq[Event] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    Tables.events(spark, SparkTestSession.sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
  }

  test("q129 fixture precondition: no session closes exactly at the final watermark") {
    // q129's oracle writes the timeout-finalization predicate as
    // `last_ts + gap <= max(ts)` while the engine's EventTimeTimeout
    // fire may be strict — the two conventions agree iff NO session has
    // last_ts + gap == max(ts) EXACTLY. That precondition was pinned by
    // out-of-band fixture sweeps only (ADVICE r12); machine-check it
    // here on both the spec and the driver-gate fixtures so a
    // regenerated fixture flips a test, not the gate.
    Seq(SparkTestSession.sf0001, SparkTestSession.sf001).foreach { dir =>
      Tables.events(spark, dir).createOrReplaceTempView("ev_q129pre")
      val n = spark.sql(
        """WITH g AS (
          |  SELECT user_id, ts,
          |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |                   > INTERVAL 5 MINUTES THEN 1 ELSE 0 END AS brk
          |  FROM ev_q129pre),
          |s AS (
          |  SELECT user_id, ts,
          |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
          |                        ROWS UNBOUNDED PRECEDING) AS sess
          |  FROM g),
          |x AS (SELECT max(ts) AS last_ts FROM s GROUP BY user_id, sess)
          |SELECT count(*) AS n FROM x
          |WHERE last_ts + INTERVAL 5 MINUTES = (SELECT max(ts) FROM ev_q129pre)"""
          .stripMargin).head().getLong(0)
      assert(n == 0L,
        s"$dir: $n session(s) close exactly at the final watermark — " +
          "q129's <= oracle no longer matches a strict timeout fire")
    }
  }

  test("q166 foreachBatch MV merge: chunked replay equals the batch recompute at 2 and 5 chunks") {
    // the batch-count-invariance claim q166's driver gate rests on: the
    // per-batch full-outer merge of pre-aggregated deltas is associative
    // over any chunking of the delta stream, so the final MV equals the
    // one-shot recompute regardless of micro-batch boundaries
    import org.apache.spark.sql.functions._
    // integer-cents quantization mirrors q166: the merged sum is a
    // BIGINT, so chunked-vs-batch equality is exact, not round-absorbed
    def agg(df: DataFrame): DataFrame = df.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(floor(col("value") * 100.0 + 0.5).cast("long")).as("sv"),
      min("value").as("mn"), max("value").as("mx"))
    def snap(df: DataFrame): DataFrame = df.select(col("user_id"), col("n"),
      col("sv"), col("mn"), col("mx"))
    val ev = Tables.events(spark, SparkTestSession.sf0001)
      .select("event_id", "user_id", "value")
    val isDelta = pmod(col("event_id"), lit(5)) === 4
    val want = canon(snap(agg(ev)))
    implicit val sqlCtx = spark.sqlContext
    for (n <- Seq(2, 5)) {
      implicit val enc = org.apache.spark.sql.Encoders.product[Event]
      var mv = agg(ev.filter(!isDelta)).localCheckpoint()
      val mem = MemoryStream[Event]
      val q = mem.toDF().select("event_id", "user_id", "value").filter(isDelta)
        .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          mv = mv.as("b").join(agg(batch).as("d"), Seq("user_id"), "full_outer")
            .select(col("user_id"),
              (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n"),
              (coalesce(col("b.sv"), lit(0L)) + coalesce(col("d.sv"), lit(0L))).as("sv"),
              least(coalesce(col("b.mn"), col("d.mn")),
                coalesce(col("d.mn"), col("b.mn"))).as("mn"),
              greatest(coalesce(col("b.mx"), col("d.mx")),
                coalesce(col("d.mx"), col("b.mx"))).as("mx"))
            .localCheckpoint()
          ()
        }.start()
      try {
        chunks(n).foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      assert(canon(snap(mv)) == want, s"MV diverged from recompute at $n chunks")
    }
  }

  private def chunks(n: Int): Seq[Seq[Event]] = {
    val size = math.max(1, allEvents.size / n)
    allEvents.grouped(size).toSeq
  }

  /** Run `op` over a MemoryStream fed `chunks`, one micro-batch each, and
    * return the memory-sink table. */
  private def runStream(
      op: DataFrame => DataFrame,
      outputMode: String,
      nChunks: Int = 3): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = op(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try {
      chunks(nChunks).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Set[Seq[String]] =
    df.collect().toSeq.map(_.toSeq.map(String.valueOf)).toSet

  test("q345 OHLCV extremum state merges correctly across micro-batches") {
    // complete mode over a 5-chunk replay: a window whose events span
    // chunk boundaries must keep the GLOBAL (us, event_id)-first open
    // and -last close, not the last batch's — exact integer cents, so
    // equality is bit-for-bit
    val got = runStream(StreamingOps.ohlcvAgg, "complete", nChunks = 5)
    val want = StreamingOps.ohlcvAgg(Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
    assert(got.count() > 0)
  }

  test("tumbling window agg: streaming (complete mode) equals batch") {
    val got = runStream(StreamingOps.tumbling, "complete")
    val want = StreamingOps.tumbling(Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
    assert(got.count() > 0)
  }

  test("sliding window agg: streaming (complete mode) equals batch") {
    val got = runStream(StreamingOps.sliding, "complete")
    val want = StreamingOps.sliding(Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
  }

  test("session windows + watermark (append): all sessions equal batch once watermark passes") {
    // Append mode only emits sessions the watermark has closed; a final
    // far-future flush event closes everything real, then is excluded
    // from the comparison (its user_id is sentinel -1).
    val flush = Event(-1L, new Timestamp(allEvents.last.ts.getTime + 86400000L), -1L, "flush", 0.0, "{}")
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StreamingOps.sessions(mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks(3).foreach { c => mem.addData(c); q.processAllAvailable() }
      mem.addData(Seq(flush)); q.processAllAvailable()
      mem.addData(Seq(flush.copy(event_id = -2L,
        ts = new Timestamp(flush.ts.getTime + 60000L)))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).filter($"user_id" =!= -1L)
    val want = StreamingOps.sessions(Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
  }

  test("dynamic-gap sessions: chunked streaming replay equals the batch fold") {
    // q146's transform under MULTI-batch arrival: interval-union merge
    // across micro-batch boundaries (a later chunk can extend or bridge
    // a session opened in an earlier one) must converge to the batch
    // result. Flush sentinels close every real session; their own rows
    // are excluded from the comparison.
    val flush = Event(-1L, new Timestamp(allEvents.last.ts.getTime + 86400000L), -1L, "flush", 0.0, "{}")
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    for (n <- Seq(2, 5)) {
      val mem = MemoryStream[Event]
      val name = s"sink_${System.nanoTime()}"
      val q = StreamingOps.dynamicSessions(mem.toDF().withWatermark("ts", "10 minutes"))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        chunks(n).foreach { c => mem.addData(c); q.processAllAvailable() }
        mem.addData(Seq(flush)); q.processAllAvailable()
        mem.addData(Seq(flush.copy(event_id = -2L,
          ts = new Timestamp(flush.ts.getTime + 60000L)))); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).filter($"user_id" =!= -1L)
      val want = StreamingOps.dynamicSessions(Tables.events(spark, SparkTestSession.sf0001))
      assert(canon(got) == canon(want), s"diverged at $n chunks")
    }
  }

  test("watermark drops late data in append-mode windowed aggregation") {
    val t0 = Timestamp.valueOf("2030-01-01 10:00:00")
    def at(min: Int, sec: Int = 0, id: Long = 0) =
      Event(id, new Timestamp(t0.getTime + (min * 60 + sec) * 1000L), 1L, "x", 1.0, "{}")
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = mem.toDF().withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("w_start"), $"n")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: two rows in the 10:00 window, plus 10:21 → watermark 10:11
      mem.addData(Seq(at(0, 0, 1), at(1, 0, 2), at(21, 0, 3)))
      q.processAllAvailable()
      // batch 2: a LATE row for the (closed) 10:00 window — must be
      // dropped; plus 10:40 to advance the watermark further.
      mem.addData(Seq(at(2, 0, 4), at(40, 0, 5)))
      q.processAllAvailable()
      mem.addData(Seq(at(60, 0, 6)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(rows(t0) == 2L, s"late row leaked into closed window: $rows")
  }

  test("streaming dedup emits exactly the distinct key set") {
    val got = runStream(StreamingOps.dedupKeys, "append")
    val want = StreamingOps.dedupKeys(Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
  }

  test("stream-static join equals the batch join") {
    val cust = Tables.customer(spark, SparkTestSession.sf0001)
    val got = runStream(StreamingOps.enrich(_, cust), "append")
    val want = StreamingOps.enrich(
      Tables.events(spark, SparkTestSession.sf0001), cust)
    assert(canon(got) == canon(want))
    assert(got.count() > 0, "enrichment joined nothing — key overlap assumption broken")
  }

  test("stream-stream interval join equals the batch join over a chunked replay") {
    // Inner stream-stream joins emit matches eagerly; feeding chunks in
    // event-time order keeps every needed click inside the state horizon
    // (watermark 1 h + join range 6 h), so the streaming result must be
    // exactly the batch interval join.
    val got = runStream(StreamingOps.clickAttribution, "append", nChunks = 4)
    val want = StreamingOps.clickAttribution(
      Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
    assert(got.count() > 0, "fixture produced no click→purchase matches — test is vacuous")
  }

  test("stream-stream LEFT SEMI join: one row per attributed purchase, equals batch EXISTS") {
    // Each purchase may emit at most once no matter how many qualifying
    // clicks arrive (the semi contract — a fan-out-then-dedup would show
    // up here as duplicate purchase_ids across micro-batches).
    val got = runStream(StreamingOps.clickAttributionSemi, "append", nChunks = 4)
    val want = StreamingOps.clickAttributionSemi(
      Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
    assert(got.count() == got.select("purchase_id").distinct().count(),
      "a purchase emitted more than once — semi contract broken")
    assert(got.count() > 0, "no attributed purchases — test is vacuous")
  }

  test("stream-stream LEFT OUTER join: null rows emit after the watermark closes, total equals batch") {
    // Matches emit eagerly; an UNMATCHED purchase can only be emitted
    // (with null click columns) once the watermark proves no qualifying
    // click can still arrive. Far-future flush events on both sides
    // close every real purchase; sentinels are excluded from comparison.
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StreamingOps.clickAttributionOuter(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks(4).foreach { c => mem.addData(c); q.processAllAvailable() }
      val far = allEvents.last.ts.getTime + 30L * 86400000L
      (0 to 1).foreach { k =>
        mem.addData(Seq(
          Event(-1L - 2 * k, new Timestamp(far + 2 * k * 86400000L), -1L, "click", 0.0, "{}"),
          Event(-2L - 2 * k, new Timestamp(far + (2 * k + 1) * 86400000L), -2L, "purchase", 0.0, "{}")))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).filter($"user_id" >= 0)
    val want = StreamingOps.clickAttributionOuter(
      Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
    val gotNulls = got.filter($"click_id".isNull).count()
    val wantNulls = want.filter($"click_id".isNull).count()
    assert(gotNulls == wantNulls && wantNulls > 0,
      s"unmatched purchases: stream $gotNulls vs batch $wantNulls (must be > 0 to test anything)")
  }

  test("stream-stream FULL OUTER join: null rows on BOTH sides emit after the watermark, total equals batch") {
    // The audit view: unmatched purchases AND unmatched clicks each
    // surface with nulls once the watermark closes their horizon.
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StreamingOps.clickAttributionFull(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks(4).foreach { c => mem.addData(c); q.processAllAvailable() }
      val far = allEvents.last.ts.getTime + 30L * 86400000L
      (0 to 1).foreach { k =>
        mem.addData(Seq(
          Event(-1L - 2 * k, new Timestamp(far + 2 * k * 86400000L), -1L, "click", 0.0, "{}"),
          Event(-2L - 2 * k, new Timestamp(far + (2 * k + 1) * 86400000L), -2L, "purchase", 0.0, "{}")))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table(name).filter($"user_id" >= 0)
    val want = StreamingOps.clickAttributionFull(
      Tables.events(spark, SparkTestSession.sf0001))
    assert(canon(got) == canon(want))
    val gotNullClicks = got.filter($"click_id".isNull).count()
    val gotNullPurch = got.filter($"purchase_id".isNull).count()
    val wantNullClicks = want.filter($"click_id".isNull).count()
    val wantNullPurch = want.filter($"purchase_id".isNull).count()
    assert(gotNullClicks == wantNullClicks && wantNullClicks > 0,
      s"unmatched purchases: stream $gotNullClicks vs batch $wantNullClicks (must be > 0)")
    assert(gotNullPurch == wantNullPurch && wantNullPurch > 0,
      s"unmatched clicks: stream $gotNullPurch vs batch $wantNullPurch (must be > 0)")
  }

  test("stream-stream join evicts expired state (bounded by watermark + range)") {
    // 30 days of events flow through a join whose state horizon is ~7 h
    // (1 h watermark delay + 6 h range). Without eviction the state store
    // would hold every click and purchase (~400 rows); with it, once a
    // far-future event advances the watermark, only the flush rows
    // themselves may remain.
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StreamingOps.clickAttribution(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks(4).foreach { c => mem.addData(c); q.processAllAvailable() }
      val far = allEvents.last.ts.getTime + 30L * 86400000L
      // flush both sides' watermarks; sentinel users, a day apart so the
      // flush rows can't join each other
      mem.addData(Seq(
        Event(-1L, new Timestamp(far), -1L, "click", 0.0, "{}"),
        Event(-2L, new Timestamp(far + 86400000L), -2L, "purchase", 0.0, "{}")))
      q.processAllAvailable()
      mem.addData(Seq(
        Event(-3L, new Timestamp(far + 2 * 86400000L), -1L, "click", 0.0, "{}"),
        Event(-4L, new Timestamp(far + 3 * 86400000L), -2L, "purchase", 0.0, "{}")))
      q.processAllAvailable()
      val nFed = allEvents.count(e => e.event_type == "click" || e.event_type == "purchase")
      val stateRows = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).lastOption.map(_.numRowsTotal)
        .getOrElse(fail("no state operator progress reported"))
      assert(stateRows < 20,
        s"state not evicted: $stateRows rows retained of $nFed joined-side events")
      assert(nFed > 100, "fixture too small for the eviction claim to mean anything")
    } finally q.stop()
  }

  test("EventTimeTimeout closes idle sessions and removes their state") {
    // user 1 goes quiet; user 2's later events advance the watermark
    // past user 1's 10-minute gap, firing the close-out. User 1 then
    // returns: the second close-out must count ONLY the new events —
    // proof the timed-out state was removed, not just reported.
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StatefulOps.sessionCloseouts(mem.toDS(), gapMinutes = 10)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, offMin: Long) =
      Event(id, new Timestamp(t0 + offMin * 60000L), user, "click", 1.0, "{}")
    try {
      Seq(
        Seq(ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 1), ev(4, 2, 0)), // u1 session of 3
        Seq(ev(5, 2, 30)),  // WM -> t0+30m at batch end
        Seq(ev(6, 2, 31)),  // batch starts with WM past u1's gap -> close-out (3)
        Seq(ev(7, 1, 40)),  // u1 returns: must be a FRESH session
        Seq(ev(8, 2, 100)), // WM -> t0+100m
        Seq(ev(9, 2, 101))  // fires u1's second close-out (1)
      ).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val u1 = spark.table(name).filter($"user_id" === 1L)
      .orderBy("last_ts").collect()
      .map(r => (r.getLong(1), r.getTimestamp(2).getTime))
    assert(u1.toSeq == Seq(
      (3L, t0 + 1 * 60000L),
      (1L, t0 + 40 * 60000L)),
      s"expected two close-outs (3 events then a fresh 1), got ${u1.toSeq}")
  }

  test("session split is event-time-driven: a return in the SAME batch still closes the stale session") {
    // user 1's comeback (t0+40m) lands in one batch together with the
    // events that advance the watermark past the old session's gap: no
    // timeout fires (the key has data), so the handler itself must
    // split on the event-time gap — emitting the old session (3 events)
    // and starting a fresh one. Batch boundaries must not change
    // session boundaries.
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StatefulOps.sessionCloseouts(mem.toDS(), gapMinutes = 10)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, offMin: Long) =
      Event(id, new Timestamp(t0 + offMin * 60000L), user, "click", 1.0, "{}")
    try {
      Seq(
        Seq(ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 1)),
        Seq(ev(4, 2, 30), ev(5, 1, 40)), // gap-crossing return in ONE batch
        Seq(ev(6, 2, 100)),
        Seq(ev(7, 2, 101))               // watermark fires the second close-out
      ).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val u1 = spark.table(name).filter($"user_id" === 1L)
      .orderBy("last_ts").collect()
      .map(r => (r.getLong(1), r.getTimestamp(2).getTime))
    assert(u1.toSeq == Seq(
      (3L, t0 + 1 * 60000L),
      (1L, t0 + 40 * 60000L)),
      s"stale session merged across the batch boundary: ${u1.toSeq}")
  }

  test("EventTimeTimeout drops fully-late rows at the watermark without crashing the query") {
    // user 3's rows arrive after the watermark has moved past them:
    // the stateful operator's watermark predicate filters them BEFORE
    // the state function (so no state, no session, no timeout ever
    // exists for user 3) and the query keeps running. This pins the
    // late-data contract of the timeout operator: late rows are
    // dropped, not resurrected into zombie sessions.
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StatefulOps.sessionCloseouts(mem.toDS(), gapMinutes = 10)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val t0 = 1700000000000L
    def ev(id: Long, user: Long, offMin: Long) =
      Event(id, new Timestamp(t0 + offMin * 60000L), user, "click", 1.0, "{}")
    try {
      Seq(
        Seq(ev(1, 2, 100)),            // WM -> t0+100m
        Seq(ev(2, 3, 0), ev(3, 3, 1)), // entirely late for user 3
        Seq(ev(4, 2, 130))             // keeps the query progressing
      ).foreach { c => mem.addData(c); q.processAllAvailable() }
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      val dropped = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 2, s"late rows not dropped by the watermark (dropped=$dropped)")
    } finally q.stop()
    assert(spark.table(name).filter($"user_id" === 3L).count() == 0,
      "late rows resurrected a session that must not exist")
  }

  test("chained window aggregation is invariant to micro-batch chunking") {
    // Two stateful operators in one query: the union of append-mode
    // emissions over a chunked drain must equal the batch cascade under
    // the final-watermark rule, for DIFFERENT chunkings — minute windows
    // that finalize mid-drain (and flow to the 5-minute layer in that
    // same batch) must compose to the same rollups as a one-shot drain.
    val want: Set[Seq[String]] = {
      val ev = Tables.events(spark, SparkTestSession.sf0001)
      val mx = ev.agg(max($"ts")).head().getTimestamp(0)
      canon(ev
        .groupBy(window($"ts", "1 minute").as("w1"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
        .groupBy(window(col("w1.start"), "5 minutes").as("w5"), $"event_type")
        .agg(count(lit(1)).as("n_minutes"), sum("n").as("n_events"),
          round(sum("v"), 2).as("sum_value"))
        .filter(col("w5.end") <= lit(mx))
        .select(col("w5.start").as("w_start"), $"event_type",
          $"n_minutes", $"n_events", $"sum_value"))
    }
    Seq(2, 5).foreach { n =>
      val got = canon(runStream(StreamingOps.chainedWindowAgg, "append", n))
      assert(got == want, s"chunking n=$n diverged from the batch cascade")
    }
    assert(want.nonEmpty)
  }

  test("mapGroupsWithState running balance survives micro-batch chunking") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = StatefulOps.runningBalance(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(StatefulOps.runningBalanceOutputMode).start()
    try {
      chunks(4).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    // latest emitted row per key = the one with max n_events (monotonic)
    val got = spark.table(name).groupBy("user_id")
      .agg(max(struct($"n_events", $"balance")).as("s"))
      .select($"user_id", $"s.n_events", $"s.balance")
      .collect()
      .map(r => r.getLong(0) -> UserRunning(r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toMap
    val want = StatefulOps.batchReference(allEvents)
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) =>
      val g = got(u)
      assert(g.n_events == w.n_events, s"user $u: n ${g.n_events} != ${w.n_events}")
      assert(math.abs(g.balance - w.balance) < 1e-9,
        s"user $u: balance ${g.balance} != ${w.balance}")
    }
  }

  test("transformWithState (RocksDB store) matches mapGroupsWithState final state") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      implicit val enc = org.apache.spark.sql.Encoders.product[Event]
      val mem = MemoryStream[Event]
      val name = s"sink_${System.nanoTime()}"
      val q = StatefulOps.runningBalanceTws(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        chunks(3).foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).groupBy("user_id")
        .agg(max(struct($"n_events", $"balance")).as("s"))
        .select($"user_id", $"s.n_events", $"s.balance")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val want = StatefulOps.batchReference(allEvents)
      assert(got.keySet == want.keySet)
      want.foreach { case (u, w) =>
        assert(got(u)._1 == w.n_events && math.abs(got(u)._2 - w.balance) < 1e-9,
          s"user $u: got ${got(u)}, want (${w.n_events}, ${w.balance})")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timers close sessions in parity with EventTimeTimeout") {
    // The timer surface of the Spark 4 API (registerTimer /
    // handleExpiredTimer) is the new-API idle watchdog; this pins it
    // row-for-row against the old EventTimeTimeout operator under the
    // SAME chunking, on a scenario that exercises every path: timeout
    // fire + state clear (u1's first close-out), a return AFTER the fire
    // (fresh session), and a same-batch gap-crossing return (handler
    // split, no timer involved).
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val t0 = 1700000000000L
      def ev(id: Long, user: Long, offMin: Long) =
        Event(id, new Timestamp(t0 + offMin * 60000L), user, "click", 1.0, "{}")
      val scenario = Seq(
        Seq(ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 1), ev(4, 2, 0)),
        Seq(ev(5, 2, 30)),                // WM -> t0+30m at batch end
        Seq(ev(6, 2, 31)),                // timer fires u1's close-out (3)
        Seq(ev(7, 1, 40), ev(8, 1, 55)),  // fresh session + same-batch gap split
        Seq(ev(9, 2, 100)),
        Seq(ev(10, 2, 101))               // fires u1's last close-out
      )
      def run(f: Dataset[Event] => Dataset[StatefulOps.SessionClose]): Seq[(Long, Long, Long)] = {
        implicit val sqlCtx = spark.sqlContext
        implicit val enc = org.apache.spark.sql.Encoders.product[Event]
        val mem = MemoryStream[Event]
        val name = s"sink_${System.nanoTime()}"
        val q = f(mem.toDS()).toDF()
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          scenario.foreach { c => mem.addData(c); q.processAllAvailable() }
        } finally q.stop()
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
          .toSeq.sorted
      }
      val old = run(StatefulOps.sessionCloseouts(_, gapMinutes = 10))
      val tws = run(StatefulOps.sessionCloseoutsTws(_, gapMinutes = 10))
      assert(old == Seq(
        (1L, 3L, t0 + 1 * 60000L),   // u1 first session, closed by timer
        (1L, 1L, t0 + 40 * 60000L),  // u1 fresh session, closed by handler split
        (1L, 1L, t0 + 55 * 60000L),  // u1 last session, closed by final timer
        (2L, 1L, t0 + 0 * 60000L),   // u2 opener, closed by handler split
        (2L, 2L, t0 + 31 * 60000L)   // u2 mid session, closed by handler split
      ).sorted, s"old-API baseline drifted: $old")
      assert(tws == old, s"timer path diverged from EventTimeTimeout: tws=$tws old=$old")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState initial state bootstraps the fold from a snapshot") {
    // The reference's snapshot-resync (README.md:45-51) on the new API:
    // state seeded from a snapshot Dataset via handleInitialState, then
    // deltas folded on top across batches. Final state per key must
    // equal the batch fold STARTED from the snapshot — including a
    // snapshot-only key that never receives stream events (its state
    // must not leak into the output: update mode emits only touched
    // keys) and a stream-only key (fold from zero).
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      implicit val enc = org.apache.spark.sql.Encoders.product[Event]
      implicit val runEnc = org.apache.spark.sql.Encoders.product[UserRunning]
      val users = allEvents.map(_.user_id).distinct.sorted
      val seeded = users.take(users.size / 2) // half the keys start from a snapshot
      val snapshot = seeded.map(u => UserRunning(u, 7L, 100.0 + u)) :+
        UserRunning(999999L, 3L, 42.0) // snapshot-only key, no stream events
      val mem = MemoryStream[Event]
      val name = s"sink_${System.nanoTime()}"
      val q = StatefulOps.runningBalanceTwsFrom(mem.toDS(), spark.createDataset(snapshot))
        .toDF().writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        chunks(3).foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).groupBy("user_id")
        .agg(max(struct($"n_events", $"balance")).as("s"))
        .select($"user_id", $"s.n_events", $"s.balance")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val init = snapshot.map(s => s.user_id -> s).toMap
      val want = allEvents.groupBy(_.user_id).map { case (u, es) =>
        val w = StatefulOps.fold(
          init.getOrElse(u, UserRunning(u, 0L, 0.0)), es.iterator)
        u -> ((w.n_events, w.balance))
      }
      assert(got.keySet == want.keySet,
        s"emitted keys diverged (snapshot-only key leaked, or a stream key missing): " +
          s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      want.foreach { case (u, w) =>
        assert(got(u)._1 == w._1 && math.abs(got(u)._2 - w._2) < 1e-9,
          s"user $u: got ${got(u)}, want $w")
      }
    }
  }

  test("transformWithState MapState census matches the batch count under chunking") {
    // q134's processor across MULTIPLE batches: per-(user,type) counts
    // are monotonic, so the latest emitted row per pair (max n) must
    // equal the batch GROUP BY — point-incremented MapState accumulates
    // correctly across batches.
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      implicit val enc = org.apache.spark.sql.Encoders.product[Event]
      val mem = MemoryStream[Event]
      val name = s"sink_${System.nanoTime()}"
      val q = StatefulOps.typeCountsTws(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        chunks(4).foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).groupBy("user_id", "event_type")
        .agg(max("n").as("n")).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = allEvents.groupBy(e => (e.user_id, e.event_type))
        .map { case (k, es) => k -> es.size.toLong }
      assert(got == want, s"MapState census diverged from batch count")
    }
  }

  test("transformWithState ListState emits the last-k prefix buffer at every batch") {
    // q133's processor across MULTIPLE batches: after each chunk, every
    // touched user must emit the last-3 values of its PREFIX stream (all
    // chunks so far) — the buffer merges new rows with retained state
    // and truncates to k, so the emitted multiset is fully determined by
    // the chunking. Verifies retention + truncation, not just the final
    // state.
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      implicit val enc = org.apache.spark.sql.Encoders.product[Event]
      val mem = MemoryStream[Event]
      val name = s"sink_${System.nanoTime()}"
      val cs = chunks(4)
      val q = StatefulOps.recentValuesTws(mem.toDS(), k = 3).toDF()
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      try {
        cs.foreach { c => mem.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toList))
        .groupBy(identity).view.mapValues(_.size).toMap
      val want = cs.indices.flatMap { i =>
        val prefix = cs.take(i + 1).flatten
        cs(i).map(_.user_id).distinct.map { u =>
          (u, prefix.filter(_.user_id == u)
            .sortBy(e => (-e.ts.getTime, -e.event_id)).take(3).map(_.value).toList)
        }
      }.groupBy(identity).view.mapValues(_.size).toMap
      assert(got == want, s"ListState prefix buffers diverged:\n got=$got\nwant=$want")
    }
  }

  test("flatMapGroupsWithState emits threshold alerts exactly at batch-observed crossings") {
    val threshold = 50.0
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val cs = chunks(4)
    val q = StatefulOps.balanceAlerts(mem.toDS(), threshold)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      cs.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: fold chunk by chunk, record the first upward crossing
    // observed at a chunk boundary — the same observability the stream has
    val states = mutable.Map.empty[Long, UserRunning]
    val want = mutable.Set.empty[(Long, Long)]
    cs.foreach { c =>
      c.groupBy(_.user_id).foreach { case (u, es) =>
        val prev = states.getOrElse(u, UserRunning(u, 0L, 0.0))
        val next = StatefulOps.fold(prev, es.iterator)
        states(u) = next
        if (prev.balance < threshold && next.balance >= threshold)
          want += ((u, next.n_events))
      }
    }
    assert(want.nonEmpty, "fixture produced no crossings — test is vacuous")
    assert(got == want.toSet,
      s"alerts mismatch: missing ${want.toSet -- got}, spurious ${got -- want.toSet}")
  }

  test("rate-micro-batch source feeds a foreachBatch sink under a processing-time trigger") {
    val seen = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", 10)
      .load()
      .writeStream
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (df: Dataset[Row], id: Long) =>
        seen.synchronized { seen += df.count() }
        ()
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (seen.synchronized(seen.sum) < 20 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    assert(seen.synchronized(seen.sum) >= 20,
      s"rate-micro-batch produced only ${seen.sum} rows")
    assert(seen.synchronized(seen.forall(_ % 10 == 0)), "rowsPerBatch contract broken")
  }

  test("console sink drains a bounded stream under Trigger.AvailableNow") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    mem.addData(chunks(1).head.take(5))
    val q = mem.toDF().select("event_id", "event_type")
      .writeStream.format("console").option("numRows", 2)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(30000)
    assert(!q.isActive, "AvailableNow query did not self-terminate")
    assert(q.exception.isEmpty, s"console sink failed: ${q.exception}")
  }

  test("checkpoint restart resumes offsets and dedup state across a stop") {
    // The reference has no recovery story (at-most-once, frames lost in
    // the reconnect window — SURVEY §1.5); checkpointed state is the
    // engine-side upgrade: a stopped-and-restarted query must neither
    // re-emit old keys nor re-process committed batches.
    val t0 = Timestamp.valueOf("2031-01-01 12:00:00")
    def ev(id: Long, user: Long, typ: String) =
      Event(id, new Timestamp(t0.getTime + id * 1000L), user, typ, 1.0, "{}")
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val chk = java.nio.file.Files.createTempDirectory("chk_restart").toString
    val emitted = mutable.ArrayBuffer.empty[(Long, (Long, String))] // (runId, key)

    def start(run: Long) = mem.toDF()
      .dropDuplicates(Seq("user_id", "event_type"))
      .select("user_id", "event_type")
      .writeStream
      .option("checkpointLocation", chk)
      .outputMode("append")
      .foreachBatch { (df: Dataset[Row], _: Long) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
        emitted.synchronized { emitted ++= rows.map(run -> _) }
        ()
      }.start()

    val q1 = start(1)
    mem.addData(Seq(ev(1, 1, "a"), ev(2, 2, "a"), ev(3, 1, "a")))
    q1.processAllAvailable()
    q1.stop()
    // data arrives while the query is down; includes a dup of (1, "a")
    mem.addData(Seq(ev(4, 1, "a"), ev(5, 3, "b")))
    val q2 = start(2)
    q2.processAllAvailable()
    q2.stop()

    val run1 = emitted.synchronized(emitted.filter(_._1 == 1).map(_._2).toSet)
    val run2 = emitted.synchronized(emitted.filter(_._1 == 2).map(_._2).toSet)
    assert(run1 == Set((1L, "a"), (2L, "a")))
    assert(run2 == Set((3L, "b")),
      s"restart re-emitted committed keys or lost state: $run2")
  }

  test("dropDuplicatesWithinWatermark catches dups inside the horizon") {
    // All events inside one hour, horizon one day: within-watermark dedup
    // must behave as exact dedup (state can't expire mid-stream). The
    // long-spanning fixture would legitimately re-emit keys whose state
    // aged out — that expiry is the operator's point, not a bug, but it
    // makes exact-count assertions meaningless there.
    val t0 = Timestamp.valueOf("2030-06-01 09:00:00")
    def ev(id: Long, min: Int, user: Long, typ: String) =
      Event(id, new Timestamp(t0.getTime + min * 60000L), user, typ, 1.0, "{}")
    val batches = Seq(
      Seq(ev(1, 0, 1, "a"), ev(2, 1, 1, "a"), ev(3, 2, 2, "a")),
      Seq(ev(4, 10, 1, "a"), ev(5, 11, 2, "b")), // id 4 = cross-batch dup
      Seq(ev(6, 20, 1, "a"), ev(7, 21, 3, "c")))
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = mem.toDF().withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
      .select("user_id", "event_type")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.size == got.distinct.size, s"duplicate keys emitted: $got")
    assert(got.toSet == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "c")),
      s"unexpected key set: $got")
  }

  test("dropDuplicatesWithinWatermark re-admits a key once its state expires") {
    // the WITHIN-watermark contract, distinguished from global distinct:
    // a key replayed AFTER the watermark passed its stored event time +
    // delay must emit again (its dedup state was evicted at the previous
    // batch boundary). Horizon 5 min; an unrelated event an hour later
    // advances the watermark past the key's expiry before the replay.
    val t0 = Timestamp.valueOf("2030-06-01 09:00:00")
    def ev(id: Long, min: Int, user: Long, typ: String) =
      Event(id, new Timestamp(t0.getTime + min * 60000L), user, typ, 1.0, "{}")
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val mem = MemoryStream[Event]
    val name = s"sink_${System.nanoTime()}"
    val q = mem.toDF().withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))
      .select("user_id", "event_type")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: key seen (in-batch dup suppressed)
      mem.addData(Seq(ev(1, 0, 1, "a"), ev(2, 1, 1, "a"))); q.processAllAvailable()
      // batch 2: unrelated key advances watermark to 09:55 ≫ 09:05 expiry
      mem.addData(Seq(ev(3, 60, 2, "b"))); q.processAllAvailable()
      // batch 3: replay of the expired key — must emit a second time
      mem.addData(Seq(ev(4, 61, 1, "a"))); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.count(_ == (1L, "a")) == 2, s"expired key not re-admitted: $got")
    assert(got.count(_ == (2L, "b")) == 1, s"unexpected emissions: $got")
  }

  test("streaming corpus ingest end-to-end: content dedup + quality floor + kafka-shaped delivery") {
    // The reference IS a streaming ingester (ws → kafka); this is that
    // pipeline with the corpus-build operators composed in-stream:
    // content-hash dedup (keyed state, survives micro-batch boundaries)
    // → quality floor → exactly-once epoch delivery through the sink.
    // The third feed REPLAYS already-seen content under new arrival —
    // nothing may re-deliver.
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, SparkTestSession.sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[(Long, String)]
    val outDir = java.nio.file.Files.createTempDirectory("ingest_out").toString
    val chk = java.nio.file.Files.createTempDirectory("ingest_chk").toString
    val stream = mem.toDF().toDF("doc_id", "text")
      .withColumn("h", sha2(col("text"), 256))
      .dropDuplicates("h")
      .filter(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id").cast("string").as("key"), col("text").as("value"))
    val q = graft.sources.kafkashape.KafkaShapedSink.start(
      stream, outDir, chk, topic = Some("corpus"), numPartitions = 4)
    try {
      val (c1, rest) = docs.splitAt(docs.size / 2)
      mem.addData(c1); q.processAllAvailable()
      mem.addData(rest); q.processAllAvailable()
      mem.addData(c1.take(20)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(outDir).select("value").collect().map(_.getString(0))
    val expected = docs.map(_._2).distinct.filter(_.split(" ").length >= 5)
    assert(got.length == got.distinct.length, "duplicate content delivered")
    assert(got.toSet == expected.toSet,
      s"delivered ${got.length} docs, expected ${expected.length}")
  }

  test("q100 streaming SQL session_window drains via AvailableNow, emitting exactly the watermark-closed sessions") {
    // the SQL streaming entry point: session_window through spark.sql
    // over a watermarked stream view, append mode. The emitted set must
    // be precisely the sessions the final watermark (max ts, 0 s delay)
    // proves closed — sessions whose close (last event + 5 min gap)
    // lies beyond the global max ts stay in state, unemitted. The same
    // rule is mirrored by the DuckDB oracle (driver gate).
    val dir = SparkTestSession.sf0001
    val got = StreamingOps.q100SqlSessionStream(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val ev = Tables.events(spark, dir)
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val expected = ev
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .filter(col("w.end") <= lit(maxTs))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(expected.nonEmpty, "fixture produced no closed sessions — gate is vacuous")
    assert(got == expected,
      s"stream emitted ${got.size} sessions, batch rule says ${expected.size}; " +
        s"only-in-stream=${(got -- expected).take(3)}, only-in-batch=${(expected -- got).take(3)}")
    // and the open tail is REAL: some session must be withheld
    val all = ev.groupBy(session_window(col("ts"), "5 minutes"), col("user_id")).count().count()
    assert(all > expected.size, "no session crossed the watermark boundary — weaken nothing, pick a later gap")
  }

  test("streaming SQL session_window across batches: each session emits exactly once, late rows drop") {
    // multi-batch emission timing for the q100 contract: a session may
    // only emit once the watermark passes its close; it must emit
    // EXACTLY once (state evicted), and a row older than the watermark
    // must not resurrect or duplicate it. Emission lands in the no-data
    // flush batch after the watermark advances, so expectations are
    // polled, not asserted at the trigger boundary.
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val t0 = 1700000000000L // fixed epoch millis
    def ev(id: Long, offsetSec: Long) =
      Event(id, new Timestamp(t0 + offsetSec * 1000), 1L, "click", 1.0, "{}")
    val mem = MemoryStream[Event]
    mem.toDF().withWatermark("ts", "0 seconds")
      .createOrReplaceTempView("events_stream_mb")
    val agg = spark.sql(
      """SELECT session_window(ts, '5 minutes') AS w, user_id, count(*) AS n
        |FROM events_stream_mb
        |GROUP BY session_window(ts, '5 minutes'), user_id""".stripMargin)
    val name = s"q100_mb_${System.nanoTime()}"
    val q = agg.select(col("w.start").as("session_start"), col("user_id"), col("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)).start()
    def emitted(): Seq[(Long, Long)] =
      spark.table(name).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(2))).toSeq.sorted
    def poll(want: Seq[(Long, Long)], what: String): Unit = {
      val deadline = System.currentTimeMillis() + 20000
      while (emitted() != want && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(emitted() == want, s"$what: got ${emitted()}, want $want")
    }
    try {
      // batch 1: one open session (two events 60 s apart) — nothing may
      // emit: the watermark (max ts) has not passed start + gap
      mem.addData(ev(1, 0), ev(2, 60)); q.processAllAvailable()
      assert(emitted().isEmpty, s"open session emitted early: ${emitted()}")
      // batch 2: an event 20 min out pushes the watermark past the
      // first session's close → it emits, exactly once, n=2
      mem.addData(ev(3, 1200)); q.processAllAvailable()
      poll(Seq((t0, 2L)), "first session did not finalize")
      // batch 3: a LATE row inside the first session's range (2 min,
      // far below the watermark) must be dropped — no duplicate, no
      // resurrection, no count change
      mem.addData(ev(4, 120)); q.processAllAvailable()
      Thread.sleep(500) // give a wrong implementation time to mis-emit
      assert(emitted() == Seq((t0, 2L)), s"late row mutated output: ${emitted()}")
      // batch 4: 40 min out closes the second session (n=1 — the late
      // row was dropped, not merged)
      mem.addData(ev(5, 2400)); q.processAllAvailable()
      poll(Seq((t0, 2L), (t0 + 1200000, 1L)), "second session did not finalize")
    } finally q.stop()
  }

  test("bounded AvailableNow drain over time-ordered files equals the one-batch result") {
    // the 100 TB restart story for the streaming SQL path: a backlog of
    // TIME-ORDERED files (the layout an event log actually has) drained
    // with maxFilesPerTrigger=1 must produce the same watermark-closed
    // session set as an unbounded one-batch drain — bounding the batch
    // size must not change answers when input files respect event-time
    // order. (A time-DISORDERED backlog would differ: rows below the
    // advanced watermark drop — which is why the layout condition is
    // part of the claim, not an implementation detail.)
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val t0 = 1700000000000L
    def ev(id: Long, offsetSec: Long, user: Long) =
      Event(id, new Timestamp(t0 + offsetSec * 1000), user, "click", 1.0, "{}")
    // three time-ordered chunks: sessions in A and B close before the
    // global max ts (C's single event); C's own session stays open
    val chunks = Seq(
      (0 to 5).map(i => ev(i.toLong, i * 30L, 1L)),          // A: 0–2.5 min
      (0 to 2).map(i => ev(10L + i, 1200 + i * 60L, 2L)),    // B: 20–22 min
      Seq(ev(20L, 2400L, 3L)))                               // C: 40 min
    val dir = Files.createTempDirectory("q100_bounded").toFile
    chunks.zipWithIndex.foreach { case (c, i) =>
      val tmp = Files.createTempDirectory(s"q100_chunk$i").toString
      spark.createDataset(c).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, f"chunk$i%02d.parquet")
      Files.move(part.toPath, dest.toPath)
      // the file source drains oldest-first: make event-time order and
      // modification-time order agree, as a log shipper would
      dest.setLastModified(t0 + i * 60000L)
    }
    val schema = spark.read.parquet(dir.toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      .withWatermark("ts", "0 seconds")
      .createOrReplaceTempView("events_stream_files")
    val agg = spark.sql(
      """SELECT session_window(ts, '5 minutes') AS w, user_id, count(*) AS n
        |FROM events_stream_files
        |GROUP BY session_window(ts, '5 minutes'), user_id""".stripMargin)
    val name = s"q100_bounded_${System.nanoTime()}"
    val q = agg.select(col("w.start").as("session_start"), col("user_id"), col("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table(name).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2))).toSet
    // the one-batch rule: sessions whose close (last ts + gap) <= max ts
    val want = Set((t0, 1L, 6L), (t0 + 1200000, 2L, 3L)) // C's session open
    assert(got == want, s"bounded drain diverged from the one-batch rule: $got vs $want")
    // and the drain was genuinely bounded: three input files → >= 3 batches
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 3, s"expected >= 3 bounded batches, saw $dataBatches")
  }
}
