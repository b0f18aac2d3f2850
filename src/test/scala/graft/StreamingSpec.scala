package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.events.EventWindows
import graft.streaming.StreamingWindows
import graft.streaming.StreamingWindows.SessionEvent

/** Streaming variants must agree with the batch event-time operators —
  * same window expressions, plus watermark-driven eviction.
  */
class StreamingSpec extends SparkSpec {
  def ts(s: String) = Timestamp.valueOf(s)

  val events = Seq(
    SessionEvent(1, ts("2024-01-01 00:01:00"), 1.0),
    SessionEvent(1, ts("2024-01-01 00:09:00"), 2.0),
    SessionEvent(1, ts("2024-01-01 00:12:00"), 4.0),
    SessionEvent(2, ts("2024-01-01 00:55:00"), 8.0),
    // watermark pusher: far-future event forces all windows/sessions closed
    SessionEvent(99, ts("2024-01-02 00:00:00"), 0.0))

  test("streaming tumbling window matches the batch operator once closed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StreamingWindows.tumbling(mem.toDF(), "ts", "10 minutes",
      "1 minute", Seq("user_id"),
      Seq(count(lit(1)).as("n"), sum(col("value")).as("total_value")))
    val q = out.writeStream.format("memory").queryName("tumb")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumb")
      .filter(col("user_id") =!= 99)
      .select("wstart", "user_id", "n", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows.tumbling(df(events), "ts", "10 minutes",
        Seq("user_id"), Seq(count(lit(1)).as("n"), sum(col("value")).as("total_value")))
      .filter(col("user_id") =!= 99)
      .select("wstart", "user_id", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join matches the batch banded range join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lRows = Seq(
      (10L, 1L, ts("2024-01-01 00:01:00")),
      (11L, 1L, ts("2024-01-01 00:10:00")),
      (12L, 2L, ts("2024-01-01 00:01:30")))
    val rRows = Seq(
      (20L, 1L, ts("2024-01-01 00:01:30")), // +30s of 10 → match
      (21L, 1L, ts("2024-01-01 00:02:01")), // +61s of 10 → out of band
      (22L, 1L, ts("2024-01-01 00:09:30")), // -30s of 11 → match
      (23L, 2L, ts("2024-01-01 00:01:00")), // -30s of 12, other key → match
      (24L, 3L, ts("2024-01-01 00:01:30"))) // key with no left side
    val memL = MemoryStream[(Long, Long, Timestamp)]
    val memR = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingWindows.intervalJoinStreams(
      memL.toDF().toDF("lid", "k", "lts"), memR.toDF().toDF("rid", "k", "rts"),
      // generous watermark: batch 2's rows sit BEHIND batch 1's max event
      // time, and rows older than the advanced watermark are (correctly)
      // dropped as late — a 30 min delay keeps them in-order enough
      Seq("k"), "lts", "rts", -60L, 60L, "30 minutes")
    val q = joined.writeStream.format("memory").queryName("ssij")
      .outputMode("append").start()
    // split across two batches so matches span micro-batch boundaries
    memL.addData(lRows.take(2): _*); memR.addData(rRows.take(2): _*)
    q.processAllAvailable()
    memL.addData(lRows.drop(2): _*); memR.addData(rRows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssij").select("lid", "rid")
      .collect().map(_.toSeq).toSet
    val batch = graft.ops.RangeJoin.timeBandJoin(
        df(lRows).toDF("lid", "k", "lts"), df(rRows).toDF("rid", "k", "rts"),
        Seq("k"), "lts", "rts", -60L, 60L)
      .select("lid", "rid").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed == Set(Seq(10L, 20L), Seq(11L, 22L), Seq(12L, 23L)))
  }

  test("stateful sessionizer closes sessions at the gap and matches session_window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StreamingWindows.sessionizeStateful(mem.toDS(),
      gapMs = 30 * 60 * 1000, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // second batch advances the watermark so event-time timeouts fire
    mem.addData(SessionEvent(99, ts("2024-01-03 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess")
      .filter(col("user_id") =!= 99)
      .select("user_id", "wstart", "wend", "n", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows.sessionize(df(events), "ts", "30 minutes",
        Seq("user_id"), Seq(count(lit(1)).as("n"), sum(col("value")).as("total_value")))
      .filter(col("user_id") =!= 99)
      .select("user_id", "wstart", "wend", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"stateful sessionizer must reproduce session_window semantics: $streamed vs $batch")
    assert(streamed.size == 2, "user 1: one merged session; user 2: one session")
  }

  test("stateful sessionizer merges at EXACTLY the gap, like session_window") {
    // events spaced exactly gapMs apart: Spark's built-in operator
    // merges on the INCLUSIVE boundary (windows are closed
    // [t, t + gap] for merging), so all three events below form ONE
    // session — this pins the stateful fold's `<=` against the
    // built-in on the boundary gap-aligned heartbeat streams hit
    // constantly (a strict `<` would split them)
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapAligned = Seq(
      SessionEvent(1, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1, ts("2024-01-01 10:30:00"), 2.0),  // = first + gap
      SessionEvent(1, ts("2024-01-01 10:59:59"), 3.0))  // < second + gap
    val mem = MemoryStream[SessionEvent]
    val out = StreamingWindows.sessionizeStateful(mem.toDS(),
      gapMs = 30 * 60 * 1000, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_gap")
      .outputMode("append").start()
    mem.addData(gapAligned: _*)
    q.processAllAvailable()
    mem.addData(SessionEvent(99, ts("2024-01-03 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_gap")
      .filter(col("user_id") =!= 99)
      .select("user_id", "wstart", "wend", "n", "total_value")
      .collect().map(_.toSeq).toSet
    val batch = EventWindows.sessionize(df(gapAligned), "ts", "30 minutes",
        Seq("user_id"),
        Seq(count(lit(1)).as("n"), sum(col("value")).as("total_value")))
      .select("user_id", "wstart", "wend", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"gap-aligned events must merge like session_window: $streamed vs $batch")
    assert(streamed.size == 1,
      "exactly-at-gap extends the session (inclusive merge boundary)")
  }

  test("streaming dedup drops repeated keys within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StreamingWindows.dedupStream(mem.toDF(), "ts", "10 minutes",
      Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    mem.addData(
      SessionEvent(1, ts("2024-01-01 00:00:00"), 1.0),
      SessionEvent(1, ts("2024-01-01 00:01:00"), 2.0), // dup key within watermark
      SessionEvent(2, ts("2024-01-01 00:02:00"), 3.0))
    q.processAllAvailable()
    q.stop()
    val users = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted
    assert(users.toSeq == Seq(1L, 2L), "second user-1 event deduplicated")
  }

  test("sessionizer survives a late event whose session is already closeable") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StreamingWindows.sessionizeStateful(mem.toDS(),
      gapMs = 30 * 60 * 1000, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    // batch 1 pushes the watermark to ~2024-06-01
    mem.addData(SessionEvent(99, ts("2024-06-01 00:00:00"), 0.0))
    q.processAllAvailable()
    // batch 2: an event months behind the watermark. Observed Spark 4
    // semantics (pinned here): the stateful operator filters
    // watermark-late rows BEFORE the user function, so the event is
    // dropped silently; the sessionizer's own already-closeable guard is
    // defense-in-depth for configurations without that filtering. Either
    // way the query must stay alive.
    mem.addData(SessionEvent(7, ts("2024-01-01 00:00:00"), 5.0))
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"query died: ${q.exception}")
    q.stop()
    val rows = spark.table("sess_late").filter(col("user_id") === 7).collect()
    assert(rows.isEmpty, "months-late event is dropped by the watermark filter")
  }

  test("sessionizer holds gap-split sessions until the watermark and merges out-of-order events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    // 10-second gap, 1-hour watermark: batch 1 creates TWO prospective
    // sessions for user 1; neither may be emitted yet (the watermark
    // has not passed their close instants — early emission was the bug)
    val out = StreamingWindows.sessionizeStateful(mem.toDS(),
      gapMs = 10 * 1000, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    mem.addData(
      SessionEvent(1, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1, ts("2024-01-01 10:01:40"), 2.0))
    q.processAllAvailable()
    assert(spark.table("sess_ooo").isEmpty,
      "gap-closed-in-batch sessions must NOT be emitted before the watermark")
    // batch 2: out-of-order but within-watermark event belonging to the
    // OLDER open session — must merge into it, not the newer one
    mem.addData(SessionEvent(1, ts("2024-01-01 10:00:05"), 4.0))
    q.processAllAvailable()
    // batch 3: watermark pusher closes everything
    mem.addData(SessionEvent(99, ts("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_ooo").filter(col("user_id") === 1)
      .select("wstart", "wend", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(got == Set(
      Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:15"), 2L, 5.0),
      Seq(ts("2024-01-01 10:01:40"), ts("2024-01-01 10:01:50"), 1L, 2.0)),
      s"out-of-order event must land in the older session, got $got")
    // and the whole output equals batch session_window over all events
    val all = Seq(
      SessionEvent(1, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1, ts("2024-01-01 10:01:40"), 2.0),
      SessionEvent(1, ts("2024-01-01 10:00:05"), 4.0),
      SessionEvent(99, ts("2024-01-02 00:00:00"), 0.0))
    val batch = EventWindows.sessionize(df(all), "ts", "10 seconds",
        Seq("user_id"), Seq(count(lit(1)).as("n"), sum(col("value")).as("total_value")))
      .filter(col("user_id") === 1)
      .select("wstart", "wend", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(got == batch, "must reproduce session_window on the union of batches")
  }

  test("sessionizer merges two open sessions bridged by a later event") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = StreamingWindows.sessionizeStateful(mem.toDS(),
      gapMs = 10 * 1000, watermark = "1 hour")
    val q = out.writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()
    mem.addData(
      SessionEvent(1, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1, ts("2024-01-01 10:00:16"), 2.0)) // 16s apart: 2 sessions
    q.processAllAvailable()
    mem.addData(SessionEvent(1, ts("2024-01-01 10:00:08"), 4.0)) // bridges them
    q.processAllAvailable()
    mem.addData(SessionEvent(99, ts("2024-01-02 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_bridge").filter(col("user_id") === 1)
      .select("wstart", "wend", "n", "total_value")
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:00:26"), 3L, 7.0)),
      s"bridge event must merge both open sessions into one, got $got")
  }
}
