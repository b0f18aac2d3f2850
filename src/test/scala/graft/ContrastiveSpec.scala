package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Contrastive

case class CandRow(query_id: String, doc_id: Long, score: Double)
case class PosRow(query_id: String, doc_id: Long)

/** Hard-negative mining: positives never appear as negatives, each
  * positive pairs with the SAME top-k negatives, ranking and
  * tie-breaks are deterministic, short lists and empty label sets
  * behave.
  */
class ContrastiveSpec extends SparkSpec {

  private val cands = Seq(
    CandRow("q", 1L, 0.9), CandRow("q", 2L, 0.8), CandRow("q", 3L, 0.7),
    CandRow("q", 4L, 0.6), CandRow("q", 5L, 0.5),
    CandRow("r", 1L, 0.4), CandRow("r", 2L, 0.3))
  private val pos = Seq(PosRow("q", 1L), PosRow("q", 3L), PosRow("r", 2L))

  test("positives are excluded and each positive pairs with the same top-k") {
    val out = Contrastive.mineTriplets(df(cands), df(pos), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    // q: negatives are 2 (rank 1) and 4 (rank 2); both positives 1, 3
    // pair with both. r: only negative is 1.
    assert(out === Set(
      ("q", 1L, 2L, 1), ("q", 1L, 4L, 2),
      ("q", 3L, 2L, 1), ("q", 3L, 4L, 2),
      ("r", 2L, 1L, 1)))
  }

  test("queries without positives produce no triplets") {
    val out = Contrastive.mineTriplets(df(cands),
      df(Seq(PosRow("q", 1L))), k = 2)
    assert(out.select("query_id").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("q"))
  }

  test("fewer than k non-positive candidates pairs what exists") {
    val out = Contrastive.mineTriplets(df(cands), df(pos), k = 10)
    // q has 3 negatives (2, 4, 5); 2 positives → 6 triplets
    assert(out.filter(col("query_id") === "q").count() === 6L)
  }

  test("duplicate positive labels don't duplicate triplets") {
    val out = Contrastive.mineTriplets(df(cands),
      df(pos ++ Seq(PosRow("q", 1L))), k = 2)
    val base = Contrastive.mineTriplets(df(cands), df(pos), k = 2)
    assert(out.collect().map(_.toSeq).toSet ===
      base.collect().map(_.toSeq).toSet)
  }

  test("score ties rank by ascending doc id") {
    val tied = Seq(CandRow("q", 9L, 0.5), CandRow("q", 7L, 0.5),
      CandRow("q", 8L, 0.5))
    val out = Contrastive.mineTriplets(df(tied),
        df(Seq(PosRow("q", 8L))), k = 2)
      .orderBy("neg_rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(7L, 9L))
  }
}
