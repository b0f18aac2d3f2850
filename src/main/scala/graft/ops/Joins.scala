package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.broadcast

/** Joins (SURVEY §2.3 J1-J4).
  *
  * All reference joins are left-outer dim enrichments over string keys
  * (`aws-job-bronze-to-silver/aws-job-bronze-to-silver.py:110-114,
  * 158-165, 201-208`; `aws-job-silver-to-gold-player/
  * aws-job-silver-to-gold-player.py:75`), with two computed-key variants
  * (J2: `year(to_date(date))`, J3: pre-derived `concat_ws` key).
  *
  * Scale notes:
  *  - Dim sides are small → broadcast-hash avoids shuffling the fact
  *    table entirely. The default is to let Catalyst/AQE decide (under
  *    `spark.sql.autoBroadcastJoinThreshold`, with runtime re-plan):
  *    an unconditional broadcast of a "dim" that grew past a few GB at
  *    100× scale OOMs every executor. Pass `broadcastDim = true` only at
  *    call sites where cardinality is known tiny.
  *  - Computed keys are still hashable equi-keys for Catalyst; prefer
  *    materializing the derived key column *before* the join so AQE can
  *    see its distribution (skew handling) and the key is reusable.
  */
object Joins {

  /** Left-outer enrichment join on an explicit condition (J1/J2/J3). */
  def enrich(fact: DataFrame, dim: DataFrame, cond: Column,
             broadcastDim: Boolean = false): DataFrame =
    fact.join(if (broadcastDim) broadcast(dim) else dim, cond, "left")

  /** USING-style left join on shared column names (J4): one coalesced key
    * column in the output, no duplicate.
    */
  def enrichUsing(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                  broadcastDim: Boolean = false): DataFrame =
    fact.join(if (broadcastDim) broadcast(dim) else dim, keys, "left")

  /** Serialized bloom filter over `dim`'s `key` values, built with
    * Spark's codegen'd `BloomFilterAggregate` (the engine behind its
    * runtime row-level filters). The binary is `numBits/8` bytes —
    * megabytes for hundreds of millions of keys — and is the only thing
    * that crosses to the driver; the build is one partial+final agg over
    * the dim, never a key collect.
    */
  def bloomFilterFor(dim: DataFrame, key: String,
                     expectedItems: Long = 1000000L,
                     numBits: Long = 8388608L): Array[Byte] = {
    val spark = dim.sparkSession
    val hashed = new XxHash64(Seq(GraftShim.toExpression(spark, dim(key))))
    val agg = new BloomFilterAggregate(hashed,
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    dim.select(GraftShim.toColumn(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Predicate `might_contain(bloom, xxhash64(col))` as a codegen'd
    * Column — false-positive-prone, false-negative-free.
    */
  def mightContain(bloom: Array[Byte], keyCol: Column,
                   spark: org.apache.spark.sql.SparkSession =
                     org.apache.spark.sql.SparkSession.active): Column = {
    val value = new XxHash64(Seq(GraftShim.toExpression(spark, keyCol)))
    GraftShim.toColumn(BloomFilterMightContain(Literal(bloom), value))
  }

  /** Semi-join reduction: shrink the FACT side with a broadcast bloom
    * filter of the dim's keys BEFORE the shuffle, then run the exact
    * join. Catalyst injects this itself only when the dim side already
    * has a selective filter under size thresholds
    * (`spark.sql.optimizer.runtime.bloomFilter.*`); this helper is the
    * explicit form for the cases the optimizer can't see — a dim too
    * big to broadcast-join but whose KEY SET fits a bloom filter, or a
    * fact reused across several joins where one pre-pass pays for all.
    *
    * At 100 TB the win is shuffle bytes: with a 1% match rate, 99% of
    * fact rows drop at the scan (the bloom predicate evaluates inside
    * WholeStageCodegen, after pushed filters, before the exchange).
    * False positives only cost wasted shuffle rows — the exact join
    * removes them, so results are bit-identical to the plain join
    * (inner/semi semantics; outer joins must NOT prune and are
    * rejected).
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      joinType: String = "inner",
                      expectedItems: Long = 1000000L,
                      numBits: Long = 8388608L): DataFrame = {
    require(Set("inner", "semi", "leftsemi").contains(
      joinType.toLowerCase.replace("_", "")),
      s"bloom pruning drops unmatched fact rows — only inner/semi " +
      s"joins keep their semantics, not '$joinType'")
    val bloom = bloomFilterFor(dim, dimKey, expectedItems, numBits)
    // resolve the key in the FACT's session, not whichever session is
    // currently active — a process with two sessions would otherwise
    // bind the predicate against the wrong conf
    val pruned = fact.where(
      mightContain(bloom, fact(factKey), fact.sparkSession))
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }
}
