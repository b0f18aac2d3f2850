package graft

import org.apache.spark.sql.functions._

import graft.text.Bm25

case class BmDoc(doc_id: Long, text: String)

class Bm25Spec extends SparkSpec {

  private val docs = df(Seq(
    BmDoc(1L, "spark spark spark merge"),        // heavy on 'spark'
    BmDoc(2L, "spark merge"),                    // short, both terms
    BmDoc(3L, "merge merge merge merge table"),  // heavy on 'merge'
    BmDoc(4L, "window agg group"),               // no query terms
    BmDoc(5L, "table table spark window")))

  test("ranks by the BM25 formula: rarer terms and shorter docs win") {
    val out = Bm25.search(docs, "doc_id", "text",
      Seq(("q", "spark merge")), topK = 5)
      .orderBy("rank").collect()
    // doc 4 shares no term -> absent; the other four all match
    assert(out.map(_.getLong(2)).toSet === Set(1L, 2L, 3L, 5L))
    // doc 2 (both terms, shortest) must beat doc 5 (one term)
    val rankOf = out.map(r => r.getLong(2) -> r.getInt(1)).toMap
    assert(rankOf(2L) < rankOf(5L))
    // scores strictly ordered with the declared tiebreak
    val scores = out.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("term saturation: tf grows the score sublinearly (k1 cap)") {
    // same length, tf 1 vs tf 3 of the query term
    val d = df(Seq(BmDoc(1L, "spark x y"), BmDoc(2L, "spark spark spark")))
    val out = Bm25.search(d, "doc_id", "text", Seq(("q", "spark")),
      topK = 2).orderBy("rank").collect()
    val s = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(s(2L) > s(1L), "more occurrences still score higher")
    assert(s(2L) < 3 * s(1L), "but sublinearly (saturation)")
  }

  test("deterministic under repartitioning") {
    val qs = Seq(("a", "spark table"), ("b", "merge window"))
    val r1 = Bm25.search(docs, "doc_id", "text", qs, topK = 5)
      .collect().map(_.toSeq).toSet
    val r2 = Bm25.search(docs.repartition(7), "doc_id", "text", qs, topK = 5)
      .collect().map(_.toSeq).toSet
    assert(r1 === r2)
  }

  test("query terms absent from the corpus contribute nothing; all-absent query returns no rows") {
    val out = Bm25.search(docs, "doc_id", "text",
      Seq(("q", "zzz qqq")), topK = 5).collect()
    assert(out.isEmpty)
    val mixed = Bm25.search(docs, "doc_id", "text",
      Seq(("q", "spark zzz")), topK = 5).collect()
    val pure = Bm25.search(docs, "doc_id", "text",
      Seq(("q", "spark")), topK = 5).collect()
    assert(mixed.map(r => (r.getLong(2), r.getDouble(3))).toSet ===
      pure.map(r => (r.getLong(2), r.getDouble(3))).toSet)
  }
}
