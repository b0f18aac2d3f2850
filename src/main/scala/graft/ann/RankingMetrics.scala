package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics between a CANDIDATE ranking and a TRUTH
  * ranking — the measurement loop behind every ANN/retrieval tuning
  * decision in this engine ("is nprobe=4 enough?", "what did the
  * LSH bucketing cost?", "does hybrid beat lexical alone?"). The
  * recall floors the specs pin ad hoc become a first-class, oracled
  * operator (north-star extension, SURVEY.md §2.8).
  *
  * Per query: `n_truth` (truth rows at rank ≤ k), `n_hits`
  * (candidate∩truth), `recall` = n_hits / n_truth, and `mrr` =
  * 1 / (candidate rank of the FIRST truth member), 0.0 when the
  * candidate list misses the truth set entirely.
  *
  * Scale shape: both inputs are already top-k-bounded per query
  * (queries × k rows however big the corpus), so this is one
  * equi-join + two partial-aggregable groupBys. Determinism: every
  * number derives from integer counts and ranks — one IEEE division
  * each, bit-stable across engines and partitionings.
  */
object RankingMetrics {

  def compare(candidate: DataFrame, truth: DataFrame, queryCol: String,
              idCol: String, k: Int,
              rankCol: String = "rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val r = candidate.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(idCol).as("__d"),
        col(rankCol).as("__r"))
    val t = truth.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__tq"), col(idCol).as("__td"))
    val nTruth = t.groupBy(col("__tq")).agg(count(lit(1)).as("n_truth"))
    val hits = r.join(t,
        col("__q") === col("__tq") && col("__d") === col("__td"))
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("__nh"), min(col("__r")).as("__first"))
    // left from the TRUTH side: a query whose candidate list shares
    // nothing with the truth still reports recall 0.0 / mrr 0.0
    // instead of vanishing
    nTruth.join(hits, col("__tq") === col("__q"), "left")
      .select(col("__tq").as(queryCol),
        col("n_truth"),
        coalesce(col("__nh"), lit(0L)).as("n_hits"),
        (coalesce(col("__nh"), lit(0L)).cast("double") /
          col("n_truth").cast("double")).as("recall"),
        coalesce(lit(1.0) / col("__first").cast("double"), lit(0.0))
          .as("mrr"))
  }
}
