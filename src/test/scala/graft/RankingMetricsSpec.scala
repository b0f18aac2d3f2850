package graft

import org.apache.spark.sql.functions._

import graft.ann.RankingMetrics

case class RmRow(query_id: Long, neighbor_id: Long, rank: Int)

class RankingMetricsSpec extends SparkSpec {

  test("recall and mrr match hand computation, including the total-miss query") {
    val truth = df(Seq(
      RmRow(1L, 10L, 1), RmRow(1L, 11L, 2), RmRow(1L, 12L, 3),
      RmRow(2L, 20L, 1), RmRow(2L, 21L, 2), RmRow(2L, 22L, 3)))
    val cand = df(Seq(
      // q1: hits 11 (rank 1) and 12 (rank 3) of 3 truths -> recall 2/3
      RmRow(1L, 11L, 1), RmRow(1L, 99L, 2), RmRow(1L, 12L, 3),
      // q2: no overlap at all -> recall 0, mrr 0, row still present
      RmRow(2L, 90L, 1), RmRow(2L, 91L, 2), RmRow(2L, 92L, 3)))
    val out = RankingMetrics.compare(cand, truth, "query_id",
      "neighbor_id", k = 3).orderBy("query_id").collect()
    assert(out.length === 2)
    val q1 = out(0)
    assert(q1.getLong(1) === 3L && q1.getLong(2) === 2L)
    assert(q1.getDouble(3) === 2.0 / 3.0)
    assert(q1.getDouble(4) === 1.0) // first truth member at rank 1
    val q2 = out(1)
    assert(q2.getLong(2) === 0L && q2.getDouble(3) === 0.0 &&
      q2.getDouble(4) === 0.0)
  }

  test("k bounds both sides: deeper ranks do not count") {
    val truth = df(Seq(RmRow(1L, 10L, 1), RmRow(1L, 11L, 2),
      RmRow(1L, 12L, 3)))
    val cand = df(Seq(RmRow(1L, 99L, 1), RmRow(1L, 10L, 2),
      RmRow(1L, 11L, 3)))
    val r2 = RankingMetrics.compare(cand, truth, "query_id",
      "neighbor_id", k = 2).collect().head
    // at k=2: truth {10,11}, candidate {99,10} -> 1 hit at rank 2
    assert(r2.getLong(1) === 2L && r2.getLong(2) === 1L)
    assert(r2.getDouble(3) === 0.5 && r2.getDouble(4) === 0.5)
  }

  test("identical rankings score perfect recall and mrr") {
    val a = df((1 to 5).map(i => RmRow(7L, i.toLong, i)))
    val out = RankingMetrics.compare(a, a, "query_id", "neighbor_id",
      k = 5).collect().head
    assert(out.getDouble(3) === 1.0 && out.getDouble(4) === 1.0)
  }

  test("duplicate (query, doc) rows collapse to best rank — recall capped at 1.0") {
    val truth = df(Seq(
      RmRow(1L, 10L, 1), RmRow(1L, 10L, 1), RmRow(1L, 11L, 2)))
    val cand = df(Seq(
      // doc 10 listed twice (ranks 2 and 3): one hit, mrr from rank 2
      RmRow(1L, 10L, 2), RmRow(1L, 10L, 3),
      RmRow(1L, 11L, 3), RmRow(1L, 11L, 3)))
    val out = RankingMetrics.compare(cand, truth, "query_id",
      "neighbor_id", k = 3).collect().head
    assert(out.getLong(1) === 2L, "n_truth deduped")
    assert(out.getLong(2) === 2L, "n_hits deduped")
    assert(out.getDouble(3) === 1.0, "recall never exceeds 1.0")
    assert(out.getDouble(4) === 0.5, "mrr sees doc 10's BEST rank (2)")
  }

  // round(log2(x), 6), the engine's cross-engine discount convention
  private def disc(rank: Int): Double =
    BigDecimal(math.log(rank + 1.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ndcg matches hand computation, including the total-miss query") {
    val truth = df(Seq(
      RmRow(1L, 10L, 1), RmRow(1L, 11L, 2), RmRow(1L, 12L, 3),
      RmRow(2L, 20L, 1), RmRow(2L, 21L, 2)))
    val cand = df(Seq(
      // q1: truth docs 11 (rel 2) at rank 1 and 10 (rel 3) at rank 3
      RmRow(1L, 11L, 1), RmRow(1L, 99L, 2), RmRow(1L, 10L, 3),
      // q2: no overlap — row still present, ndcg 0.0
      RmRow(2L, 90L, 1), RmRow(2L, 91L, 2)))
    val out = RankingMetrics.ndcg(cand, truth, "query_id",
      "neighbor_id", k = 3).orderBy("query_id").collect()
    assert(out.length === 2)
    val dcg1 = 2.0 / disc(1) + 3.0 / disc(3)
    val idcg1 = 3.0 / disc(1) + 2.0 / disc(2) + 1.0 / disc(3)
    val q1 = out(0)
    assert(q1.getLong(1) === 3L)
    assert(q1.getDouble(2) === dcg1)
    assert(q1.getDouble(3) === idcg1)
    assert(q1.getDouble(4) === dcg1 / idcg1)
    val q2 = out(1)
    assert(q2.getLong(1) === 2L && q2.getDouble(2) === 0.0 &&
      q2.getDouble(4) === 0.0)
  }

  test("average precision matches hand computation") {
    val truth = df(Seq(
      RmRow(1L, 10L, 1), RmRow(1L, 11L, 2), RmRow(1L, 12L, 3),
      RmRow(2L, 20L, 1), RmRow(2L, 21L, 2)))
    val cand = df(Seq(
      // q1 hits at candidate ranks 1 and 3: ap = (1/1 + 2/3) / 3
      RmRow(1L, 11L, 1), RmRow(1L, 99L, 2), RmRow(1L, 10L, 3),
      // q2: total miss -> ap 0.0, row present
      RmRow(2L, 90L, 1), RmRow(2L, 91L, 2)))
    val out = RankingMetrics.averagePrecision(cand, truth, "query_id",
      "neighbor_id", k = 3).orderBy("query_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getDouble(2) === (1.0 / 1.0 + 2.0 / 3.0) / 3.0)
    assert(out(1).getDouble(2) === 0.0)
    // perfect front-loading scores 1.0
    val t = df((1 to 4).map(i => RmRow(7L, i.toLong, i)))
    val perfect = RankingMetrics.averagePrecision(t, t, "query_id",
      "neighbor_id", k = 4).collect().head
    assert(perfect.getDouble(2) === 1.0)
  }

  test("ndcg stays <= 1.0 under non-contiguous and tied rank labels") {
    // duplicate truth rows collapse to best rank, leaving the label
    // set {1, 3} (non-contiguous) — plus a second doc TIED at 3. Raw
    // labels would give idcg = rel(1)/disc(1) + 2*rel(3)/disc(3) while
    // a perfect candidate at positions 1,2,3 could out-score it; the
    // position re-rank normalizes both sides to 1..n first.
    val truth = df(Seq(
      RmRow(1L, 10L, 1), RmRow(1L, 10L, 3), // doc 10 twice -> rank 1
      RmRow(1L, 11L, 3), RmRow(1L, 12L, 3))) // tied label 3
    // candidate reproduces the normalized truth order exactly
    val cand = df(Seq(
      RmRow(1L, 10L, 1), RmRow(1L, 11L, 2), RmRow(1L, 12L, 3)))
    val out = RankingMetrics.ndcg(cand, truth, "query_id",
      "neighbor_id", k = 5).collect().head
    assert(out.getLong(1) === 3L, "truth deduped to 3 docs")
    assert(out.getDouble(4) === 1.0,
      "a candidate matching the normalized truth order is the maximum")
    // and a worse candidate (best doc demoted) stays strictly below
    val demoted = df(Seq(
      RmRow(1L, 11L, 1), RmRow(1L, 12L, 2), RmRow(1L, 10L, 3)))
    val d = RankingMetrics.ndcg(demoted, truth, "query_id",
      "neighbor_id", k = 5).collect().head
    assert(d.getDouble(4) < 1.0 && d.getDouble(4) > 0.0)
    // tied CANDIDATE labels cannot push dcg past idcg either
    val tiedCand = df(Seq(
      RmRow(1L, 10L, 1), RmRow(1L, 11L, 1), RmRow(1L, 12L, 1)))
    val tc = RankingMetrics.ndcg(tiedCand, truth, "query_id",
      "neighbor_id", k = 5).collect().head
    assert(tc.getDouble(4) <= 1.0, "ndcg is bounded for malformed ties")
  }

  test("ndcg is 1.0 iff the candidate reproduces the truth order") {
    val t = df((1 to 5).map(i => RmRow(7L, i.toLong, i)))
    val perfect = RankingMetrics.ndcg(t, t, "query_id", "neighbor_id",
      k = 5).collect().head
    assert(perfect.getDouble(4) === 1.0)
    // same five docs, best one demoted to the bottom: ndcg < 1
    val shuffled = df(Seq(RmRow(7L, 2L, 1), RmRow(7L, 3L, 2),
      RmRow(7L, 4L, 3), RmRow(7L, 5L, 4), RmRow(7L, 1L, 5)))
    val worse = RankingMetrics.ndcg(shuffled, t, "query_id",
      "neighbor_id", k = 5).collect().head
    assert(worse.getDouble(4) < 1.0 && worse.getDouble(4) > 0.0)
  }
}
