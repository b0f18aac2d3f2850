package graft

import org.apache.spark.sql.functions._

import graft.text.HybridSearch

case class Ranked(query_id: String, doc_id: Long, rank: Int)

class HybridSearchSpec extends SparkSpec {

  test("rrf equals the hand-computed fusion on a known fixture") {
    val lex = df(Seq(
      Ranked("q", 1L, 1), Ranked("q", 2L, 2), Ranked("q", 3L, 3)))
    val dense = df(Seq(
      Ranked("q", 2L, 1), Ranked("q", 4L, 2), Ranked("q", 1L, 3)))
    val out = HybridSearch.rrf(Seq(lex, dense), "query_id", "doc_id",
      k = 60, topK = 10).orderBy("rank").collect()
    def c(r: Int) = 1.0 / (60.0 + r)
    val expected = Map(
      1L -> (c(1) + c(3)), 2L -> (c(2) + c(1)),
      3L -> c(3), 4L -> c(2))
    val got = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got === expected)
    // doc 2 (high in both) beats doc 1 (top in one, deep in the other)
    val rankOf = out.map(r => r.getLong(2) -> r.getInt(1)).toMap
    assert(rankOf(2L) === 1 && rankOf(1L) === 2)
    // n_rankers says how many lists each doc appeared in
    val n = out.map(r => r.getLong(2) -> r.getInt(4)).toMap
    assert(n === Map(1L -> 2, 2L -> 2, 3L -> 1, 4L -> 1))
  }

  test("agreement beats a single high rank (the RRF property)") {
    // doc 10: rank 3 in BOTH lists; doc 11: rank 1 in one list only.
    // 2/(60+3) = 0.0317 > 1/(60+1) = 0.0164 — consensus wins.
    val a = df(Seq(Ranked("q", 11L, 1), Ranked("q", 12L, 2),
      Ranked("q", 10L, 3)))
    val b = df(Seq(Ranked("q", 13L, 1), Ranked("q", 14L, 2),
      Ranked("q", 10L, 3)))
    val top = HybridSearch.rrf(Seq(a, b), "query_id", "doc_id",
      topK = 1).collect()
    assert(top.head.getLong(2) === 10L)
  }

  test("deterministic under repartitioning; per-query isolation") {
    val a = df((1 to 30).map(i => Ranked(s"q${i % 3}", i.toLong, i / 3 + 1)))
    val b = df((1 to 30).map(i => Ranked(s"q${i % 3}", (31 - i).toLong, i / 3 + 1)))
    val r1 = HybridSearch.rrf(Seq(a, b), "query_id", "doc_id", topK = 5)
      .collect().map(_.toSeq).toSet
    val r2 = HybridSearch.rrf(Seq(a.repartition(7), b.repartition(5)),
      "query_id", "doc_id", topK = 5).collect().map(_.toSeq).toSet
    assert(r1 === r2)
    assert(r1.groupBy(_.head).forall(_._2.size == 5),
      "each query gets its own top-5")
  }

  test("IVF-backed fusion: partial probe's recall vs the brute fusion, quantified") {
    // the production posture (q_x_hybrid_search_ivf serves at FULL
    // probe so the exhaustive oracle applies; production serves
    // nprobe < numLists): fuse BM25 with a 2-of-8-list IVF ranking and
    // measure, with RankingMetrics, what the cheaper probe costs
    // against the brute-dense fusion on the real sf0.001 tables
    import graft.ann.{RankingMetrics, Similarity}
    import graft.text.Bm25
    val dir = "/root/testdata/sf0.001"
    val emb = graft.ops.Sources.table(spark, dir, "embeddings")
    val docs = graft.ops.Sources.table(spark, dir, "documents")
    val lex = Bm25.search(docs, "doc_id", "text",
        Seq(("0", "merge join table"), ("1", "fast scan query"),
          ("2", "stream window agg")), topK = 20)
      .select(col("query_id"), col("doc_id"), col("rank"))
    val qs = emb.filter(col("vec_id") < 3)
    def dense(d: org.apache.spark.sql.DataFrame) =
      d.select(col("query_id").cast("string").as("query_id"),
        col("neighbor_id").as("doc_id"), col("rank"))
    val brute = dense(Similarity.bruteForceTopK(emb, qs, k = 20))
    val index = Similarity.buildIvfIndex(emb, numLists = 8)
      .localCheckpoint()
    val ivf2 = dense(Similarity.ivfTopKWithIndex(emb, qs, k = 20,
      nprobe = 2, index))
    val fBrute = HybridSearch.rrf(Seq(lex, brute), "query_id", "doc_id",
      topK = 10)
    val fIvf = HybridSearch.rrf(Seq(lex, ivf2), "query_id", "doc_id",
      topK = 10)
    val m = RankingMetrics.compare(fIvf, fBrute, "query_id", "doc_id",
      k = 10).collect()
    assert(m.length === 3, "every query reports a row")
    val recalls = m.map(r => r.getString(0) -> r.getDouble(3)).toMap
    info(s"hybrid IVF(nprobe=2/8) recall@10 vs brute fusion: $recalls")
    // the lexical half is SHARED between the fusions, so even a cheap
    // 2-of-8 probe keeps the fused list well above half-overlap
    assert(recalls.values.forall(_ >= 0.5),
      s"partial-probe fusion recall collapsed: $recalls")
    // and at full probe the fusion must reproduce the brute one exactly
    val ivf8 = dense(Similarity.ivfTopKWithIndex(emb, qs, k = 20,
      nprobe = 8, index))
    val fFull = HybridSearch.rrf(Seq(lex, ivf8), "query_id", "doc_id",
      topK = 10)
    val perfect = RankingMetrics.compare(fFull, fBrute, "query_id",
      "doc_id", k = 10).collect()
    assert(perfect.forall(r => r.getDouble(3) === 1.0 &&
      r.getDouble(4) === 1.0))
  }

  test("weighted RRF: hand-computed scores, and weight -> ranking monotonicity") {
    val lex = df(Seq(Ranked("q", 1L, 1), Ranked("q", 2L, 2)))
    val dense = df(Seq(Ranked("q", 2L, 1), Ranked("q", 1L, 2)))
    def c(r: Int) = 60.0 + r
    // exact contributions: w/(60+r), one division each
    val out = HybridSearch.rrf(Seq(lex, dense), "query_id", "doc_id",
      topK = 10, weights = Seq(0.7, 0.3)).collect()
    val got = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got(1L) === 0.7 / c(1) + 0.3 / c(2))
    assert(got(2L) === 0.7 / c(2) + 0.3 / c(1))
    // equal weights tie the two docs (symmetric ranks) — id breaks it;
    // tilting the weight decides the winner in the tilted direction
    def winner(w: Seq[Double]) = HybridSearch.rrf(Seq(lex, dense),
      "query_id", "doc_id", topK = 1, weights = w).collect().head.getLong(2)
    assert(winner(Seq(1.0, 1.0)) === 1L, "tie -> lowest doc id")
    assert(winner(Seq(0.9, 0.1)) === 1L, "lex-heavy -> lex's #1")
    assert(winner(Seq(0.1, 0.9)) === 2L, "dense-heavy -> dense's #1")
    // empty weights ≡ all-ones, bit-exactly
    val eq = HybridSearch.rrf(Seq(lex, dense), "query_id", "doc_id",
      topK = 10).collect().map(_.toSeq).toSet
    val ones = HybridSearch.rrf(Seq(lex, dense), "query_id", "doc_id",
      topK = 10, weights = Seq(1.0, 1.0)).collect().map(_.toSeq).toSet
    assert(eq === ones)
    // malformed weights refuse loudly
    val bad = intercept[IllegalArgumentException](HybridSearch.rrf(
      Seq(lex, dense), "query_id", "doc_id", weights = Seq(1.0)))
    assert(bad.getMessage.contains("one per ranking"))
    intercept[IllegalArgumentException](HybridSearch.rrf(
      Seq(lex, dense), "query_id", "doc_id", weights = Seq(1.0, -0.5)))
  }

  test("weight tuning is MEASURABLE: dense-weighted fusion scores higher vs a dense truth") {
    // truth = the dense ranking; a fusion that trusts the dense ranker
    // more must reproduce it better — quantified with the nDCG the
    // metric trio exists to provide, not eyeballed
    import graft.ann.RankingMetrics
    val lex = df(Seq(Ranked("q", 10L, 1), Ranked("q", 11L, 2),
      Ranked("q", 12L, 3), Ranked("q", 13L, 4)))
    val dense = df(Seq(Ranked("q", 13L, 1), Ranked("q", 12L, 2),
      Ranked("q", 11L, 3), Ranked("q", 10L, 4)))
    def ndcgVs(w: Seq[Double]) = RankingMetrics.ndcg(
      HybridSearch.rrf(Seq(lex, dense), "query_id", "doc_id",
        topK = 4, weights = w),
      dense, "query_id", "doc_id", k = 4).collect().head.getDouble(4)
    val equal = ndcgVs(Seq(1.0, 1.0))
    val denseHeavy = ndcgVs(Seq(0.2, 0.8))
    val denseOnly = ndcgVs(Seq(0.0, 1.0))
    assert(denseOnly === 1.0, "all trust in dense reproduces the truth")
    assert(denseHeavy > equal,
      s"shifting weight toward the truth's ranker must raise ndcg: " +
        s"equal=$equal denseHeavy=$denseHeavy")
    assert(denseHeavy <= denseOnly)
  }

  test("duplicate rows within one ranking contribute once, at their best rank") {
    // doc 1 listed TWICE by the lexical ranker (ranks 1 and 2) and
    // once by the dense one: it must contribute 1/(60+1) once per
    // ranker, and n_rankers must read 2, not 3
    val lex = df(Seq(Ranked("q", 1L, 1), Ranked("q", 1L, 2),
      Ranked("q", 2L, 3)))
    val dense = df(Seq(Ranked("q", 1L, 1)))
    val out = HybridSearch.rrf(Seq(lex, dense), "query_id", "doc_id",
      topK = 10).collect()
    val d1 = out.find(_.getLong(2) == 1L).get
    assert(d1.getDouble(3) === 2.0 / 61.0)
    assert(d1.getInt(4) === 2)
    val d2 = out.find(_.getLong(2) == 2L).get
    assert(d2.getInt(4) === 1)
  }
}
