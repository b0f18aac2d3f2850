package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval over a document corpus — the standard lexical
  * ranking a training-data pipeline uses for eval-set retrieval,
  * contamination triage, and "find me documents like this query"
  * curation passes (north-star extension; the reference has no text
  * ops, SURVEY.md §2.8). [[TfIdf]]'s keyword extraction profiles a
  * corpus; this SEARCHES one.
  *
  * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
  * with the standard non-negative idf ln((N − df + ½)/(df + ½) + 1).
  *
  * Scale shape (100 TB-safe):
  *  - the per-(doc, token) tf table (the inverted index) shuffles once,
  *    as do doc lengths and document frequencies — all
  *    map-side-combined aggregations;
  *  - the QUERY side is tiny and broadcasts: only the posting lists of
  *    query terms survive the broadcast semi-shape join, so the scored
  *    frame is Σ posting-list lengths, never corpus × queries;
  *  - corpus stats (N, total length) arrive as one broadcast row; the
  *    final top-k windows per QUERY (constant group count).
  *
  * Determinism, cross-engine: idf is the one transcendental — rounded
  * to 6 decimals BEFORE use (the repo's round(ln, 6) convention, see
  * [[Collocations.pmi]]); everything after is IEEE-exact given operand
  * order, and the per-(query, doc) sum folds over the token-sorted
  * term array in one defined sequence (the [[CorpusDivergence]]
  * sorted-fold pattern), so an independent engine reproduces the hash.
  */
object Bm25 {

  /** Top-`k` documents per query: (query_id, rank, <idCol>, score).
    * Query terms are deduplicated (standard BM25 ignores query-side
    * tf). Documents with zero tokens can never match and do not count
    * toward N (they carry no information for length normalization).
    */
  def search(docs: DataFrame, idCol: String, textCol: String,
             queries: Seq[(String, String)],
             k1: Double = 1.2, b: Double = 0.75,
             topK: Int = 10): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(topK > 0, "topK must be positive")
    val spark = docs.sparkSession
    import spark.implicits._

    // the inverted index: ONE shuffle to (doc, token) counts
    val perDoc = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol)))
        .as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("__tf"))
    val docLen = perDoc.groupBy(idCol).agg(sum("__tf").as("__len"))
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("__df"))
    // N and total length in one single-row frame (broadcast below)
    val stats = docLen.agg(count(lit(1)).as("__n"),
      sum("__len").as("__tot"))

    // distinct query terms — tiny, broadcast everywhere
    val qt = queries.toDF("query_id", "__qtext")
      .select(col("query_id"),
        explode(array_distinct(TextAnalysis.tokens(col("__qtext"))))
          .as("token"))
    // idf per (query, term): the ONLY transcendental, rounded to 6
    // decimals before any arithmetic uses it (cross-engine ln parity)
    val qidf = docFreq.join(broadcast(qt), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("token"),
        round(log((col("__n").cast("double") - col("__df").cast("double")
            + lit(0.5)) / (col("__df").cast("double") + lit(0.5))
            + lit(1.0)), 6).as("__idf"),
        (col("__tot").cast("double") / col("__n").cast("double"))
          .as("__avgdl"))

    // only query-term posting lists survive; join doc lengths back on
    // the doc key (two longs per matching doc — the one doc-keyed
    // exchange of the probe side)
    val matched = perDoc.join(broadcast(qidf), Seq("token"))
      .join(docLen, Seq(idCol))
    val tfD = col("__tf").cast("double")
    val perTerm = matched.select(col("query_id"), col(idCol), col("token"),
      (col("__idf") * (tfD * (lit(k1) + lit(1.0))) /
        (tfD + lit(k1) * (lit(1.0) - lit(b) +
          (lit(b) * col("__len").cast("double")) / col("__avgdl"))))
        .as("__s"))

    // one defined summation order per (query, doc): fold the
    // token-sorted term array (tokens are unique within the group)
    val scored = perTerm.groupBy(col("query_id"), col(idCol))
      .agg(aggregate(array_sort(collect_list(struct(col("token"),
          col("__s")))), lit(0.0), (a, x) => a + x.getField("__s"))
        .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol), col("score"))
  }
}
