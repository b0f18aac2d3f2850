package graft

import java.sql.Timestamp

import graft.events.EventWindows

case class RsEvent(user_id: Long, ts: Timestamp, event_id: Long,
                   value: Double)

class ResampleSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("gaps are filled with the last value; n_events counts per bucket; span is per key") {
    val rows = Seq(
      RsEvent(1L, t("2024-01-01 00:10:00"), 1L, 10.0),
      RsEvent(1L, t("2024-01-01 00:50:00"), 2L, 20.0), // same hour, later
      RsEvent(1L, t("2024-01-01 03:05:00"), 3L, 30.0), // 2-hour gap
      RsEvent(2L, t("2024-01-01 05:00:00"), 4L, 99.0)) // single event
    val out = EventWindows.resampleFfill(df(rows), "ts", 3600L,
        Seq("user_id"), "value", "event_id")
      .orderBy("user_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val base = t("2024-01-01 00:00:00").getTime / 1000 / 3600
    assert(out.toSeq === Seq(
      (1L, base, 2L, 20.0),      // latest-in-bucket wins
      (1L, base + 1, 0L, 20.0),  // gap: carried forward
      (1L, base + 2, 0L, 20.0),
      (1L, base + 3, 1L, 30.0),
      (2L, base + 5, 1L, 99.0))) // per-key span: no rows before 05:00
  }

  test("timestamp ties break on the tie column (deterministic)") {
    val rows = Seq(
      RsEvent(1L, t("2024-01-01 00:10:00"), 7L, 1.0),
      RsEvent(1L, t("2024-01-01 00:10:00"), 9L, 2.0),
      RsEvent(1L, t("2024-01-01 00:10:00"), 8L, 3.0))
    val out = EventWindows.resampleFfill(df(rows), "ts", 3600L,
      Seq("user_id"), "value", "event_id").collect()
    assert(out.length === 1)
    assert(out.head.getDouble(3) === 2.0) // event_id 9 is the latest
    assert(out.head.getLong(2) === 3L)
  }
}
