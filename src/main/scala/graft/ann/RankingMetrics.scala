package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
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
    // (query, doc) keys are forced unique here rather than assumed:
    // a ranking that lists a document twice (a buggy upstream fusion,
    // a union of shards) would otherwise inflate n_hits/n_truth and
    // recall could exceed 1.0 silently. Keeping min(rank) preserves
    // mrr's "first position the truth member appears at" meaning.
    // Both frames are queries × k rows, so the extra combine is noise.
    val r = candidate.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(idCol).as("__d"),
        col(rankCol).as("__r"))
      .groupBy(col("__q"), col("__d")).agg(min(col("__r")).as("__r"))
    val t = truth.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__tq"), col(idCol).as("__td"))
      .dropDuplicates("__tq", "__td")
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

  /** nDCG@k — the graded-relevance metric that actually RANKS rankers
    * (recall@k treats position 1 and position k the same; MRR sees
    * only the first hit). Relevance is graded by TRUTH rank:
    * `rel(doc) = k + 1 − truth_rank`, so the truth's best document is
    * worth k and its k-th is worth 1 — the standard way to get graded
    * labels out of a ranking-only ground truth. Per query:
    *
    *   dcg  = Σ_{hits} rel(doc) / log2(candidate_rank + 1)
    *   idcg = Σ_{i=1..n_truth} (k + 1 − i) / log2(i + 1)
    *   ndcg = dcg / idcg   (1.0 ⟺ candidate reproduces the truth order)
    *
    * Scale shape: identical to [[compare]] — both inputs are already
    * top-k-bounded per query, one equi-join + two partial-aggregable
    * groupBys. Determinism, cross-engine: `log2` is the one
    * transcendental, rounded to 6 decimals BEFORE the division (the
    * repo's round(ln, 6) convention); each per-query sum folds the
    * rank-sorted gain array in one defined order, so an independent
    * engine reproduces the hash bit-exactly.
    *
    * Both inputs are normalized to LIST POSITIONS before any gain is
    * computed: duplicate (query, doc) rows collapse to their best rank
    * (as in [[compare]]), then each query's rows are re-ranked
    * 1..n by row_number over (rank, doc). nDCG is defined over ranked
    * lists, and raw rank LABELS that are tied or non-contiguous —
    * exactly what the duplicate-collapse can produce, or a buggy
    * upstream fusion can emit — would otherwise let dcg exceed idcg
    * and push ndcg past 1.0 (the unbounded-metric failure mode the
    * dedup exists to prevent for recall). For well-formed contiguous
    * unique ranks the re-rank is the identity, so rankers' outputs
    * score unchanged. idcg is therefore the true per-query maximum:
    * ndcg = 1.0 ⟺ the candidate reproduces the truth order, and
    * ndcg ≤ 1.0 always.
    */
  def ndcg(candidate: DataFrame, truth: DataFrame, queryCol: String,
           idCol: String, k: Int,
           rankCol: String = "rank"): DataFrame = {
    require(k > 0, "k must be positive")
    def positions(df: DataFrame, q: String, d: String, r: String,
                  qOut: String, dOut: String, pOut: String): DataFrame = {
      val deduped = df.filter(col(rankCol) <= k)
        .select(col(queryCol).as(q), col(idCol).as(d), col(rankCol).as(r))
        .groupBy(col(q), col(d)).agg(min(col(r)).as(r))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(q)).orderBy(col(r).asc, col(d).asc)
      deduped.select(col(q).as(qOut), col(d).as(dOut),
        row_number().over(w).as(pOut))
    }
    val r = positions(candidate, "__q0", "__d0", "__r0", "__q", "__d", "__r")
    val t = positions(truth, "__tq0", "__td0", "__tr0", "__tq", "__td", "__tr")
    def gain(rel: Column, atRank: Column): Column =
      rel / round(log2(atRank.cast("double") + lit(1.0)), 6)
    // graded relevance from the truth POSITION: best doc worth k,
    // k-th worth 1 (positions are 1..n_truth with n_truth <= k)
    val rel = lit(k + 1).cast("double") - col("__tr").cast("double")
    // ideal order IS truth-position order (relevance is monotone in it)
    val ideal = t
      .select(col("__tq"), col("__tr"), gain(rel, col("__tr")).as("__g"))
      .groupBy(col("__tq"))
      .agg(count(lit(1)).as("n_truth"),
        aggregate(array_sort(collect_list(struct(col("__tr"),
            col("__g")))), lit(0.0), (a, x) => a + x.getField("__g"))
          .as("idcg"))
    val hits = r.join(t,
        col("__q") === col("__tq") && col("__d") === col("__td"))
      .select(col("__q"), col("__r"), gain(rel, col("__r")).as("__g"))
      .groupBy(col("__q"))
      .agg(aggregate(array_sort(collect_list(struct(col("__r"),
          col("__g")))), lit(0.0), (a, x) => a + x.getField("__g"))
        .as("__dcg"))
    // left from the TRUTH side, as in compare: a query whose candidate
    // list misses the truth entirely reports dcg 0.0 / ndcg 0.0
    ideal.join(hits, col("__tq") === col("__q"), "left")
      .select(col("__tq").as(queryCol),
        col("n_truth"),
        coalesce(col("__dcg"), lit(0.0)).as("dcg"),
        col("idcg"),
        (coalesce(col("__dcg"), lit(0.0)) / col("idcg")).as("ndcg"))
  }

  /** Average precision @k — the metric that rewards putting EVERY
    * truth member early, not just the first ([[compare]]'s mrr) or a
    * graded order ([[ndcg]]). Per query:
    *
    *   ap = (1 / n_truth) · Σ_{hits} precision@rank(hit)
    *   precision@r = |hits with candidate rank ≤ r| / r
    *
    * 1.0 ⟺ the top n_truth candidate slots are exactly the truth set.
    * Deliberately transcendental-free: every number is an integer
    * count or rank through one IEEE division, folded in rank order —
    * bit-stable across engines with no rounding convention needed.
    * Scale shape and duplicate handling identical to [[compare]].
    */
  def averagePrecision(candidate: DataFrame, truth: DataFrame,
                       queryCol: String, idCol: String, k: Int,
                       rankCol: String = "rank"): DataFrame = {
    require(k > 0, "k must be positive")
    val r = candidate.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__q"), col(idCol).as("__d"),
        col(rankCol).as("__r"))
      .groupBy(col("__q"), col("__d")).agg(min(col("__r")).as("__r"))
    val t = truth.filter(col(rankCol) <= k)
      .select(col(queryCol).as("__tq"), col(idCol).as("__td"))
      .dropDuplicates("__tq", "__td")
    val nTruth = t.groupBy(col("__tq")).agg(count(lit(1)).as("n_truth"))
    // precision@r per hit: the hit's 1-based position among the
    // query's hits ordered by candidate rank; doc id breaks ties so
    // the window is total even when a malformed input carries the
    // same rank label twice (for well-formed unique ranks the
    // tiebreaker never fires)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q")).orderBy(col("__r").asc, col("__d").asc)
    val prec = r.join(t,
        col("__q") === col("__tq") && col("__d") === col("__td"))
      .withColumn("__hn", row_number().over(w))
      .select(col("__q"), col("__r"),
        (col("__hn").cast("double") / col("__r").cast("double"))
          .as("__p"))
    val sums = prec.groupBy(col("__q"))
      .agg(aggregate(array_sort(collect_list(struct(col("__r"),
          col("__p")))), lit(0.0), (a, x) => a + x.getField("__p"))
        .as("__sum"))
    nTruth.join(sums, col("__tq") === col("__q"), "left")
      .select(col("__tq").as(queryCol),
        col("n_truth"),
        (coalesce(col("__sum"), lit(0.0)) /
          col("n_truth").cast("double")).as("ap"))
  }
}
