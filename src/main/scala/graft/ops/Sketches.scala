package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Datasketches HLL, via Spark's
  * codegen'd `hll_sketch_agg` family) — north-star extension: the
  * reference has only exact `countDistinct` (SURVEY §2.4 A4).
  *
  * Why sketches at 100 TB: exact distinct is a full shuffle of every
  * distinct value per group, and it does not COMPOSE — yesterday's
  * result cannot absorb today's increment. A sketch is a few KB per
  * group, unions losslessly (register-wise max, commutative and
  * idempotent), and so supports the shard → union → estimate shape:
  * sketch each partition/day/table independently (map-side, tiny
  * shuffle), persist the sketches (e.g. in a [[TxTable]]), and answer
  * "distinct users over any day range" by unioning a handful of
  * binaries — no rescan of the data. Error is ~1.04/sqrt(2^lgK)
  * (~1.6% at the default lgK=12) regardless of cardinality.
  */
object Sketches {

  /** Per-group HLL sketch of `value` — the partial for later union.
    * Deterministic for a given input set (hashing is seeded-fixed and
    * union is order-insensitive).
    */
  def hllSketch(df: DataFrame, groupCols: Seq[Column], value: Column,
                lgK: Int = 12): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("hll"))

  /** Union previously built sketches up to a coarser grouping (e.g.
    * per-day sketches → per-month distinct). Input needs an `hll`
    * binary column as produced by [[hllSketch]].
    */
  def hllUnion(sketches: DataFrame, groupCols: Seq[Column]): DataFrame =
    sketches.groupBy(groupCols: _*)
      // allowDifferentLgConfigK: sketch tables accumulate over time and
      // lgK tuning changes (hllSketch takes it per call) — HLL union
      // down to the smaller K is well-defined, so don't throw on mixed
      // precision, degrade to the coarsest
      .agg(hll_union_agg(col("hll"), lit(true)).as("hll"))

  /** Estimated distinct count of a sketch column. */
  def estimate(sketch: Column): Column =
    hll_sketch_estimate(sketch).as("approx_distinct")

  /** One-shot approximate distinct per group (build + estimate). */
  def approxDistinct(df: DataFrame, groupCols: Seq[Column], value: Column,
                     lgK: Int = 12): DataFrame =
    hllSketch(df, groupCols, value, lgK)
      .withColumn("approx_distinct", hll_sketch_estimate(col("hll")))
      .drop("hll")

  // ---- mergeable quantiles (Datasketches KLL) -------------------------
  // Same shard → union → query decomposition as the HLL family, for
  // order statistics: exact per-group quantiles are a full sort that
  // doesn't compose across days/shards; a KLL sketch is a few KB with
  // ~1.65% normalized rank error at the default k=200 and unions
  // losslessly w.r.t. that bound. Backed by native
  // TypedImperativeAggregates ([[graft.functions.KllDoublesAgg]]) —
  // the sketch object lives in the agg buffer, serializing only at
  // shuffle, exactly like Spark's own hll_sketch_agg.

  private def aggCol(e: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Column =
    org.apache.spark.sql.GraftShim.toColumn(e.toAggregateExpression())

  private def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftShim.toExpression(
      org.apache.spark.sql.SparkSession.active, c)

  /** Per-group KLL quantile sketch of `value` — binary column `kll`. */
  def kllSketch(df: DataFrame, groupCols: Seq[Column], value: Column,
                k: Int = 200): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(aggCol(graft.functions.KllDoublesAgg(
        exprOf(value.cast("double")), k)).as("kll"))

  /** Union previously built KLL sketches up to a coarser grouping. */
  def kllUnion(sketches: DataFrame, groupCols: Seq[Column],
               k: Int = 200): DataFrame =
    sketches.groupBy(groupCols: _*)
      .agg(aggCol(graft.functions.KllMergeAgg(
        exprOf(col("kll")), k)).as("kll"))

  /** Quantile values at `probs` from a sketch column (array<double>). */
  def kllQuantiles(sketch: Column, probs: Seq[Double]): Column =
    org.apache.spark.sql.GraftShim.toColumn(
      graft.functions.KllQuantilesExpr(exprOf(sketch), probs))

  /** One-shot approximate per-group quantiles (build + extract). */
  def approxQuantiles(df: DataFrame, groupCols: Seq[Column], value: Column,
                      probs: Seq[Double], k: Int = 200): DataFrame =
    kllSketch(df, groupCols, value, k)
      .withColumn("quantiles", kllQuantiles(col("kll"), probs))
      .drop("kll")

  // ---- mergeable heavy hitters (Datasketches frequent items) ----------

  /** Per-group frequent-items sketch of string `item` — binary column
    * `freq`. `maxMapSize` (power of 2) bounds memory and sets the
    * error floor (estimates exact within n·3.5/maxMapSize).
    */
  def freqSketch(df: DataFrame, groupCols: Seq[Column], item: Column,
                 maxMapSize: Int = 1024): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(aggCol(graft.functions.FreqItemsAgg(
        exprOf(item), maxMapSize)).as("freq"))

  /** Union previously built frequent-items sketches. */
  def freqUnion(sketches: DataFrame, groupCols: Seq[Column],
                maxMapSize: Int = 1024): DataFrame =
    sketches.groupBy(groupCols: _*)
      .agg(aggCol(graft.functions.FreqMergeAgg(
        exprOf(col("freq")), maxMapSize)).as("freq"))

  /** Top-k heavy hitters from a sketch column, estimate-descending,
    * no false positives: array<struct<item, estimate, lower, upper>>.
    */
  def freqTopItems(sketch: Column, k: Int): Column =
    org.apache.spark.sql.GraftShim.toColumn(
      graft.functions.FreqTopItemsExpr(exprOf(sketch), k))
}
