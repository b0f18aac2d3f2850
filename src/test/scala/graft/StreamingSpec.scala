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
