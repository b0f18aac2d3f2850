package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-search fusion by Reciprocal Rank Fusion (Cormack et al.) —
  * the standard way a retrieval pipeline combines a LEXICAL ranking
  * ([[Bm25]]) with a DENSE one ([[graft.ann.Similarity]]): each ranker
  * contributes 1/(k + rank) for every document it returned, summed per
  * (query, document). RRF needs no score calibration between rankers
  * (ranks only), which is exactly why it is the default fusion in
  * production search stacks (north-star extension; the reference has
  * no text ops, SURVEY.md §2.8).
  *
  * Scale shape: the inputs are already top-k-BOUNDED per query (each
  * ranker's output is queries × k rows, however big the corpus), so
  * fusion is one union + one partial-aggregable groupBy + a per-QUERY
  * window — the corpus-scale work lives in the upstream rankers.
  *
  * Determinism, cross-engine: contributions are 1/(k + rank) from
  * integer ranks (IEEE-exact in any engine), and the per-(query, doc)
  * sum folds contributions sorted by a per-ranker tag in one defined
  * order (the [[CorpusDivergence]] pattern), so the DuckDB oracle
  * hash-matches bit-exactly.
  */
object HybridSearch {

  /** Fuse `rankings` — each (queryCol, idCol, rankCol) with rank 1 =
    * best — into (queryCol, rankCol, idCol, outCol, n_rankers), top
    * `topK` per query, ties broken by document id. `k` is RRF's
    * dampening constant (60 in the original paper: rank differences
    * deep in the lists matter less than agreement near the top).
    *
    * `weights` turns the fusion into WEIGHTED RRF — ranker `i`
    * contributes `weights(i) / (k + rank)` — the production lever for
    * tuning lexical-vs-dense balance without score calibration (ranks
    * stay the only cross-ranker currency; weights rescale trust per
    * SOURCE, which a rank-only method cannot learn from the lists
    * themselves). Empty (the default) means all-equal — bit-identical
    * to classic RRF. [[graft.ann.RankingMetrics]] against a truth
    * ranking is how a weight choice is MEASURED rather than guessed
    * (spec'd in HybridSearchSpec). A zero weight mutes a ranker's
    * score while its rows still count in `n_rankers` (it voted, with
    * zero trust); weights must be non-negative — a negative "weight"
    * is a different method (penalty fusion), not wRRF.
    */
  def rrf(rankings: Seq[DataFrame], queryCol: String, idCol: String,
          rankCol: String = "rank", k: Int = 60, topK: Int = 10,
          outCol: String = "rrf_score",
          weights: Seq[Double] = Nil): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 0, "k must be non-negative")
    require(topK > 0, "topK must be positive")
    require(weights.isEmpty || weights.size == rankings.size,
      s"got ${weights.size} weights for ${rankings.size} rankings — " +
        "pass one per ranking, or none for classic equal-weight RRF")
    require(weights.forall(_ >= 0), "weights must be non-negative")
    // positional tags give the fold its defined order; zero-padded so
    // lexicographic order == ranker order past 10 rankers. Each
    // ranker's (query, doc) keys are forced unique — best (lowest)
    // rank wins — so a ranking carrying duplicate rows (a buggy
    // upstream, a union of shards) cannot double-contribute to
    // rrf_score or inflate n_rankers; after this, count(*) per
    // (query, doc) IS the distinct-ranker count. Each input is
    // queries × k rows, so the extra combine is noise.
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      val w = if (weights.isEmpty) 1.0 else weights(i)
      df.select(col(queryCol).as("__q"), col(idCol).as("__d"),
          col(rankCol).cast("double").as("__r"))
        .groupBy(col("__q"), col("__d")).agg(min(col("__r")).as("__r"))
        .select(col("__q"), col("__d"), lit(f"r$i%03d").as("__src"),
          // w/(k+r) as ONE literal-over-sum division (not 1/(k+r)
          // scaled after): a single IEEE op per contribution, mirrored
          // verbatim by the oracle
          (lit(w) / (lit(k.toDouble) + col("__r"))).as("__c"))
    }.reduce(_.unionByName(_))
    val fused = tagged.groupBy(col("__q"), col("__d"))
      .agg(
        aggregate(array_sort(collect_list(struct(col("__src"),
            col("__c")))), lit(0.0), (a, x) => a + x.getField("__c"))
          .as(outCol),
        count(lit(1)).cast("int").as("n_rankers"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__q").orderBy(col(outCol).desc, col("__d").asc)
    fused.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= topK)
      .select(col("__q").as(queryCol), col(rankCol), col("__d").as(idCol),
        col(outCol), col("n_rankers"))
  }
}
