package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus (north-star
  * extension — the reference has no text ops, SURVEY.md §2.8).
  *
  * Per-document top-k salient terms by tf-idf, the standard first pass
  * for corpus topic profiling, near-dup triage and search-index
  * priors in a training-data pipeline.
  *
  * Scale shape (100 TB-safe):
  *  - token counts shuffle once on (doc, token), then reduce to the
  *    per-doc length (shuffle on doc) and the document frequency table
  *    (shuffle on token) — all map-side-combined aggregations, never a
  *    collect;
  *  - the corpus size N arrives as a broadcast single-row crossJoin
  *    (same pattern as q_x_vocab's total), so no global window;
  *  - the top-k window partitions BY DOCUMENT — per-group state is
  *    k rows, no single-task global sort anywhere.
  *
  * Determinism: the score is rounded to 6 decimals and ranking happens
  * on the ROUNDED value (ties broken by token), so an independent
  * engine computing the same IEEE shape ranks identically.
  */
object TfIdf {

  /** ln((N+1)/(df+1)) + 1 — the "smooth idf" used by scikit-learn's
    * TfidfVectorizer; strictly positive even for corpus-wide terms.
    */
  private def smoothIdf(nDocs: Column, df: Column): Column =
    log((nDocs.cast("double") + lit(1.0)) / (df.cast("double") + lit(1.0))) +
      lit(1.0)

  /** Top-`k` keywords per document: (idCol, rank, token, tfidf).
    *
    * tf is the within-document relative frequency (count / doc length);
    * idf is [[smoothIdf]]; tfidf = round(tf * idf, 6).
    */
  def keywords(df: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val perDoc = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("__tf"))
    val docLen = perDoc.groupBy(idCol).agg(sum(col("__tf")).as("__len"))
    val docFreq = perDoc.groupBy("token").agg(count(lit(1)).as("__df"))
    val nDocs = df.agg(count(lit(1)).as("__n"))

    val scored = perDoc
      .join(docLen, idCol)
      .join(docFreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round((col("__tf").cast("double") / col("__len").cast("double")) *
          smoothIdf(col("__n"), col("__df")), 6))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tfidf"))
  }
}
