package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the batch `events` table
  * (north-star extension; the reference is batch-only with no event-time
  * ops, SURVEY.md §2.10).
  *
  * These use Spark's `window`/`session_window` grouping expressions,
  * which are the SAME operators Structured Streaming uses — the batch
  * queries here lift to `readStream` unchanged (plus a watermark).
  * Scale: one shuffle keyed by (window, keys); windows are computed
  * per-row (narrow) before the exchange, so data is bucketed, not
  * sorted globally.
  */
object EventWindows {

  /** Tumbling window aggregation: fixed `width` buckets, epoch-aligned. */
  def tumbling(df: DataFrame, tsCol: String, width: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val g = df.groupBy((window(col(tsCol), width) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    flattenWindow(g)
  }

  /** Sliding window aggregation: `width` windows every `slide`. Each row
    * lands in width/slide windows (Spark expands rows before the
    * shuffle).
    */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
              keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val g = df.groupBy((window(col(tsCol), width, slide) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    flattenWindow(g)
  }

  /** Session windows: rows for the same keys within `gap` of each other
    * merge into one session; session end = last event + gap.
    */
  def sessionize(df: DataFrame, tsCol: String, gap: String,
                 keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    val g = df.groupBy((session_window(col(tsCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
    flattenWindow(g, "session_window")
  }

  /** Replace the window struct with flat wstart/wend columns (stable,
    * oracle-friendly output schema). Shared with the streaming lifts —
    * one implementation of the flattening, not two drifting copies.
    */
  private[graft] def flattenWindow(df: DataFrame,
                                   structName: String = "window"): DataFrame = {
    require(!df.columns.contains("wstart") && !df.columns.contains("wend"),
      "aggregates may not alias 'wstart'/'wend' — the flattened window " +
      "output reserves those names")
    val others = df.columns.filterNot(_ == structName).map(col)
    df.select((Seq(col(s"$structName.start").as("wstart"),
      col(s"$structName.end").as("wend")) ++ others.toIndexedSeq): _*)
  }
}
