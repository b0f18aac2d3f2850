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
}
