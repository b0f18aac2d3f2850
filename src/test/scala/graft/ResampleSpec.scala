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

  test("a planted long-gap key refuses loudly; the probe can be disabled") {
    // user 1: two events three years apart at a 1-second step — a
    // ~95M-row grid for ONE key's task; user 2 is narrow and innocent
    val rows = Seq(
      RsEvent(1L, t("2021-01-01 00:00:00"), 1L, 1.0),
      RsEvent(1L, t("2024-01-01 00:00:00"), 2L, 2.0),
      RsEvent(2L, t("2024-01-01 00:00:00"), 3L, 3.0))
    val e = intercept[IllegalArgumentException] {
      EventWindows.resampleFfill(df(rows), "ts", 1L,
        Seq("user_id"), "value", "event_id").collect()
    }
    assert(e.getMessage.contains("user_id=1") &&
      e.getMessage.contains("coarser"))
    // a coarse step keeps the same data under the default ceiling
    // 2021-01-01 → 2024-01-01 is 1095 days (winter-to-winter: no DST
    // skew; the leap day is later in 2024): user 1 mints 1096 daily
    // rows, user 2 one — under the cap
    val ok = EventWindows.resampleFfill(df(rows), "ts", 86400L,
      Seq("user_id"), "value", "event_id")
    assert(ok.count() === 1097L)
    // disabled probe: the caller owns the blowup decision
    val forced = EventWindows.resampleFfill(df(rows), "ts", 3600L,
      Seq("user_id"), "value", "event_id", maxGridRowsPerKey = 0L)
    assert(forced.where(org.apache.spark.sql.functions.col("user_id") === 1L)
      .count() === 1095L * 24 + 1)
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
