package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
