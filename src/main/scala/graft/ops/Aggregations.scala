package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, round, sum}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Aggregations (SURVEY §2.4 A1-A7).
  *
  * A1/A3: static multi-sum + countDistinct marts
  * (`aws-job-silver-to-gold-player/aws-job-silver-to-gold-player.py:52-72`,
  * `aws-job-silver-to-gold-team/aws-job-silver-to-gold-team.py:32-48`).
  * A2: aggregate columns discovered FROM THE SCHEMA at runtime — every
  * int-typed non-key column gets a sum
  * (`aws-job-silver-to-silver/aws-job-silver-to-silver.py:42-49`).
  *
  * Scale notes: groupBy+sum is the canonical partial-aggregation shape —
  * map-side combine shrinks the shuffle to |groups|×|aggs| per partition.
  * countDistinct(k) adds an Expand + second shuffle keyed by (group, k);
  * at 100 TB prefer approx_count_distinct when tolerance allows (kept
  * exact here — reference semantics).
  */
object Aggregations {

  /** Static multi-aggregate over fixed keys (A1/A3/A4/A7). */
  def multiAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "multiAgg needs at least one aggregate expression")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A2: sum every int-typed non-key column, discovered from the runtime
    * schema, keeping original names. The reference sums only `int`-typed
    * columns (`aws-job-silver-to-silver.py:45`, `t in ('int')`) — bigints
    * are silently dropped from its output; `includeLongs = true` opts into
    * widening that behavior.
    */
  def dynamicIntSums(df: DataFrame, keys: Seq[String],
                     includeLongs: Boolean = false): DataFrame = {
    val keySet = keys.toSet
    val aggCols = df.schema.fields.collect {
      case f if !keySet(f.name) &&
        (f.dataType == IntegerType || (includeLongs && f.dataType == LongType)) =>
        sum(col(f.name)).as(f.name)
    }.toSeq
    require(aggCols.nonEmpty, "no integer-typed non-key columns to aggregate")
    df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Order-insensitive exact money sum over 2-decimal doubles.
    *
    * Accumulates exact integer CENTS in a long (codegen'd primitive sum)
    * and divides once at the end — bit-identical to a DECIMAL(18,2)
    * accumulation (both produce the nearest double to the exact rational
    * total) but ~4× faster: Spark's decimal aggregation is per-row
    * BigDecimal churn outside vectorization. Why the cents round-trip is
    * exact: a double that came from a 2-decimal value v=c/100 satisfies
    * round(v*100)=c (relative error ≪ 0.5 cents), and no double can sit
    * exactly on a .xx5 rounding midpoint ((2k+1)/200 has a factor 5 in
    * the denominator). Bit-identical across partitionings, retries, and
    * engines; under ANSI mode a >2^63-cent overflow fails loudly rather
    * than wrapping (2^53-cent totals — ~$90T — stay exact in the final
    * double).
    */
  def moneySum(c: Column): Column =
    (sum(round(c * 100).cast(LongType)) / 100.0).cast(DoubleType)

  /** Same trick at 4 decimals for derived per-row products
    * (e.g. price*(1-discount): 2-dec × 2-dec = exactly 4 decimals).
    */
  def moneySum4(c: Column): Column =
    (sum(round(c * 10000).cast(LongType)) / 10000.0).cast(DoubleType)
}
