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
               aggs: Seq[Column]): DataFrame =
    windowed(stream, window(col(tsCol), width), tsCol, watermark, keys, aggs)

  /** Sliding-window variant (tumbling = sliding with slide == width). */
  def sliding(stream: DataFrame, tsCol: String, width: String, slide: String,
              watermark: String, keys: Seq[String],
              aggs: Seq[Column]): DataFrame =
    windowed(stream, window(col(tsCol), width, slide), tsCol, watermark,
      keys, aggs)

  private def windowed(stream: DataFrame, win: Column, tsCol: String,
                       watermark: String, keys: Seq[String],
                       aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val g = stream
      .withWatermark(tsCol, watermark)
      .groupBy((win +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    graft.events.EventWindows.flattenWindow(g)
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

  /** Watermarked stream-stream interval join: pairs with equal `keyCols`
    * and `right.ts ∈ [left.ts + loSeconds, left.ts + hiSeconds]` — the
    * streaming form of the batch `RangeJoin.timeBandJoin`. Both sides
    * carry a watermark and the join condition bounds BOTH event-time
    * columns relative to each other; together those are exactly what
    * Structured Streaming needs to evict join state — each side buffers
    * only `watermark + band` worth of rows per key, so state is bounded
    * no matter how long the streams run. An unconstrained stream-stream
    * join (no time bound) buffers both streams forever — the
    * 100 TB/day version of a leak.
    *
    * Right-side key columns are dropped from the output (they equal the
    * left's by the join condition).
    */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
                          keyCols: Seq[String],
                          leftTs: String, rightTs: String,
                          loSeconds: Long, hiSeconds: Long,
                          watermark: String): DataFrame = {
    require(hiSeconds >= loSeconds, s"empty band: $loSeconds > $hiSeconds")
    require(leftTs != rightTs,
      "leftTs and rightTs must be distinct names — both appear in the output")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val keyCond = keyCols.map(k => l(k) === r(k))
      .reduceOption(_ && _).getOrElse(lit(true))
    val cond = keyCond &&
      r(rightTs) >= l(leftTs) + expr(s"INTERVAL '$loSeconds' SECOND") &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL '$hiSeconds' SECOND")
    keyCols.foldLeft(l.join(r, cond, "inner"))((j, k) => j.drop(r(k)))
  }

  /** One input event for the custom-state sessionizer. */
  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)
  /** Accumulating per-key session interval. */
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  /** ALL open sessions of one key — the state must hold a LIST: a key
    * can have several sessions none of which the watermark has passed
    * yet, and emitting any of them early (on the in-batch gap alone)
    * would both diverge from `session_window` and mis-assign
    * out-of-order cross-batch events to a newer session.
    */
  case class OpenSessions(sessions: Seq[SessionState])
  /** One closed session. */
  case class ClosedSession(user_id: Long, wstart: Timestamp, wend: Timestamp,
                           n: Long, total_value: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState,
    * matching `session_window` semantics: each event is a unit
    * interval, sessions are the gap-coalesced interval union of state +
    * batch, and a session is emitted ONLY once the watermark passes its
    * close instant (start of the gap after its last event). Until then
    * it stays in state, so an out-of-order event arriving in a later
    * batch (but within the watermark) merges into the session it
    * belongs to — including bridging two open sessions into one. The
    * event-time timeout re-fires at the earliest open close instant.
    */
  def sessionizeStateful(events: Dataset[SessionEvent], gapMs: Long,
                         watermark: String): Dataset[ClosedSession] = {
    implicit val stateEnc = Encoders.product[OpenSessions]
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val longEnc = Encoders.scalaLong

    def update(userId: Long, rows: Iterator[SessionEvent],
               state: GroupState[OpenSessions]): Iterator[ClosedSession] = {
      def close(s: SessionState): ClosedSession =
        ClosedSession(userId, new Timestamp(s.start),
          new Timestamp(s.lastTs + gapMs), s.n, s.total)
      // the same fold serves the data and timeout paths: on timeout
      // `rows` is empty and the watermark has advanced past at least
      // one open session's close instant
      val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      val minis = rows.map(e =>
        SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)).toSeq
      // merge on INCLUSIVE overlap (`<=`): Spark's session_window
      // treats each event's window as the closed [ts, ts + gap] for
      // merging — an event arriving EXACTLY gapMs after the previous
      // one extends the session (verified empirically against the
      // built-in operator on Spark 4.1.2; StreamingSpec pins this
      // gap-aligned boundary). A strict `<` here would split
      // gap-aligned heartbeat streams the built-in keeps together.
      val coalesced = (existing ++ minis).sortBy(s => (s.start, s.lastTs))
        .foldLeft(List.empty[SessionState]) {
          case (cur :: rest, s) if s.start <= cur.lastTs + gapMs =>
            SessionState(cur.start, math.max(cur.lastTs, s.lastTs),
              cur.n + s.n, cur.total + s.total) :: rest
          case (acc, s) => s :: acc
        }.reverse
      val wm = state.getCurrentWatermarkMs()
      val (closable, open) = coalesced.partition(s => s.lastTs + gapMs <= wm)
      if (open.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(OpenSessions(open))
        // all open close instants are > wm by the partition above, so
        // this never violates the at-or-below-watermark restriction
        state.setTimeoutTimestamp(open.map(_.lastTs + gapMs).min)
      }
      closable.map(close).iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
