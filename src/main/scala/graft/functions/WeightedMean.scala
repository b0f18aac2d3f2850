package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation surface (`Aggregator[IN, BUF, OUT]`) — the
  * public API tier for aggregates Spark's built-ins don't cover
  * (SURVEY.md §4 anticipated exactly one such need for extensions).
  *
  * Weighted mean with DETERMINISTIC merging: weights and weighted values
  * accumulate as integer ten-thousandths (same exactness argument as
  * [[graft.ops.Aggregations.moneySum]]), so the result is bit-identical
  * across partitionings — a plain double-pair accumulator would drift
  * with merge order. Null-safe: null value or weight contributes nothing.
  *
  * Usage (typed or untyped):
  * {{{
  *   val wm = new WeightedMean().toColumn  // Dataset[(Double, Double)]
  *   df.groupBy("k").agg(WeightedMean.of("x", "w"))
  * }}}
  */
class WeightedMean extends Aggregator[(java.lang.Double, java.lang.Double),
    (Long, Long), java.lang.Double] {

  private val Scale = 10000.0

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long),
                      a: (java.lang.Double, java.lang.Double)): (Long, Long) =
    if (a._1 == null || a._2 == null) b
    else (b._1 + math.round(a._1 * a._2 * Scale), b._2 + math.round(a._2 * Scale))

  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (Long, Long)): java.lang.Double =
    if (b._2 == 0L) null else Double.box(b._1.toDouble / b._2.toDouble)

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object WeightedMean {
  /** Untyped handle via the public udaf bridge:
    * `df.groupBy(...).agg(WeightedMean.of("x", "w"))`.
    */
  def of(valueCol: String, weightCol: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, udaf}
    val f = udaf(new WeightedMean(),
      Encoders.tuple(Encoders.DOUBLE, Encoders.DOUBLE))
    f(col(valueCol), col(weightCol))
  }
}
