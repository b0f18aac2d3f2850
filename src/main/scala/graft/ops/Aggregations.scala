package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

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

  /** Order-insensitive exact money sum: double → DECIMAL(18,2) per row,
    * exact decimal accumulation, result back to double. Bit-identical
    * across partitionings and engines (plain double sums are not — IEEE
    * addition is non-associative, so parallel sums drift in the last ulp).
    */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Same trick at 4 decimals for derived per-row products
    * (e.g. price*(1-discount), which carries 4 decimal digits).
    */
  def moneySum4(c: Column): Column =
    sum(c.cast(DecimalType(22, 4))).cast(DoubleType)
}
