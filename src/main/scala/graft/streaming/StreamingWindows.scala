package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming lifts of the batch event-time operators
  * (north-star extension: the reference is batch-only, SURVEY.md §2.10,
  * but the engine's event-time operators are written on the SAME
  * `window`/`session_window` expressions Structured Streaming executes,
  * so the streaming variants differ only by a watermark).
  *
  * Scale design: state is keyed by (window, keys) and bounded by the
  * watermark — late rows beyond `watermark` are dropped and their state
  * evicted, so executor state stays O(open windows), not O(stream). The
  * custom-state sessionizer uses [[org.apache.spark.sql.KeyValueGroupedDataset
  * .flatMapGroupsWithState]] with an event-time timeout — the canonical
  * shape for state Spark's built-ins can't express.
  */
object StreamingWindows {

  /** Tumbling-window aggregation over a stream: identical semantics to
    * [[graft.events.EventWindows.tumbling]] plus late-data eviction.
    * Append-mode-compatible (results emitted once the watermark passes
    * the window end).
    */
  def tumbling(stream: DataFrame, tsCol: String, width: String,
               watermark: String, keys: Seq[String],
               aggs: Seq[Column]): DataFrame = {
    val g = stream
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    g.select((Seq(col("window.start").as("wstart"), col("window.end").as("wend"))
      ++ g.columns.filterNot(_ == "window").map(col)): _*)
  }

  /** Sliding-window variant. */
  def sliding(stream: DataFrame, tsCol: String, width: String, slide: String,
              watermark: String, keys: Seq[String],
              aggs: Seq[Column]): DataFrame = {
    val g = stream
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width, slide) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    g.select((Seq(col("window.start").as("wstart"), col("window.end").as("wend"))
      ++ g.columns.filterNot(_ == "window").map(col)): _*)
  }

  /** Streaming exact dedup: drop rows whose `keyCols` were already seen,
    * with state bounded by the watermark (`dropDuplicatesWithinWatermark`)
    * — two rows with the same key deduplicate iff they arrive within the
    * watermark delay of each other; older state is evicted. This is the
    * streaming form of the batch exact-dedup operator: at 100 TB/day the
    * unbounded-state `dropDuplicates` variant would grow forever.
    */
  def dedupStream(stream: DataFrame, tsCol: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** One input event for the custom-state sessionizer. */
  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  /** Accumulating per-key session state. */
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  /** One closed session. */
  case class ClosedSession(user_id: Long, wstart: Timestamp, wend: Timestamp,
                           n: Long, total_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState: sessions
    * close when no event arrives within `gapMs` (tracked by event-time
    * timeout against the watermark). Emits each closed session exactly
    * once — the mapGroupsWithState surface the brief calls for, doing by
    * hand what `session_window` does natively.
    */
  def sessionizeStateful(events: Dataset[SessionEvent], gapMs: Long,
                         watermark: String): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong

    def update(userId: Long, rows: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[ClosedSession] = {
      def close(s: SessionState): ClosedSession =
        ClosedSession(userId, new Timestamp(s.start),
          new Timestamp(s.lastTs + gapMs), s.n, s.total)

      if (state.hasTimedOut) {
        val out = state.getOption.map(close).iterator
        state.remove()
        out
      } else {
        var closed = List.empty[ClosedSession]
        var cur = state.getOption
        // Iterator order within a micro-batch is not time-sorted: sort.
        rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t <= s.lastTs + gapMs =>
              cur = Some(SessionState(s.start, math.max(s.lastTs, t),
                s.n + 1, s.total + e.value))
            case Some(s) =>
              closed ::= close(s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          // flatMapGroupsWithState does NOT drop late rows for us: a
          // session whose close instant is already at-or-behind the
          // watermark must be emitted NOW — setTimeoutTimestamp at or
          // below the watermark throws and kills the whole query.
          val wm = state.getCurrentWatermarkMs()
          if (s.lastTs + gapMs <= wm) {
            closed ::= close(s)
            state.remove()
          } else {
            state.update(s)
            state.setTimeoutTimestamp(s.lastTs + gapMs)
          }
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
