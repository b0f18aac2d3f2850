package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive-training data mining: pair each (query, positive) with
  * the query's HARDEST negatives — the candidates a ranker scored
  * highest that are NOT labeled positive (the standard recipe for
  * embedding/reranker training sets: BM25- or ANN-mined hard negatives
  * beat random negatives by a wide margin). Ranker-agnostic: feed it
  * [[graft.text.Bm25.searchIndexed]], [[graft.ann.Similarity]] top-k,
  * or [[graft.text.HybridSearch]] output alike (north-star extension;
  * the reference has no retrieval surface, SURVEY.md §2.8).
  *
  * Scale shape: queries × candidates in, queries × positives × k out —
  * an anti-join and a per-query-key window over the ranker's bounded
  * output, never the corpus. All ranking is integer/derived from the
  * ranker's own scores, so the oracle is exact.
  */
object Contrastive {

  /** (queryCol, positive_id, negative_id, neg_rank, neg_score):
    * per query, every positive paired with the top-`k` candidates
    * (by scoreCol desc, id asc) that are not positives of that query.
    * Queries with no positives produce no triplets; queries with
    * fewer than k non-positive candidates pair what exists.
    */
  def mineTriplets(candidates: DataFrame, positives: DataFrame, k: Int,
                   queryCol: String = "query_id",
                   idCol: String = "doc_id",
                   scoreCol: String = "score"): DataFrame = {
    require(k > 0, "k must be positive")
    val negs = candidates
      .join(positives.select(col(queryCol), col(idCol)).distinct(),
        Seq(queryCol, idCol), "left_anti")
    val top = graft.ops.Windows.topKPerGroup(negs, Seq(col(queryCol)),
        Seq(col(scoreCol).desc, col(idCol).asc), k, rankCol = "neg_rank")
      .select(col(queryCol), col(idCol).as("negative_id"),
        col("neg_rank"), col(scoreCol).as("neg_score"))
    positives.select(col(queryCol), col(idCol).as("positive_id"))
      .distinct()
      .join(top, Seq(queryCol))
      .select(col(queryCol), col("positive_id"), col("negative_id"),
        col("neg_rank"), col("neg_score"))
  }
}
