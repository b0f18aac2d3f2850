package graft

import org.apache.spark.sql.functions._

import graft.ann.{Mmr, Similarity}

case class MmrCand(query_id: String, neighbor_id: Long, rel: Double,
                   embedding: Array[Float])

/** MMR diversity reranking: redundancy is punished, pure-relevance
  * degenerates at λ=1, ties break on id, short candidate lists and
  * zero-norm vectors behave.
  */
class MmrSpec extends SparkSpec {

  private val q = "q"
  // a and b are near-duplicates with the highest relevance; c is
  // orthogonal with zero relevance — diversity must pick c second
  private val cands = Seq(
    MmrCand(q, 1L, 0.99995, Array(1f, 0.01f)),
    MmrCand(q, 2L, 0.99994, Array(1f, 0.011f)),
    MmrCand(q, 3L, 0.3, Array(0f, 1f)))

  test("redundant candidates are demoted: the orthogonal one ranks second") {
    val out = Mmr.rerank(df(cands), k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 3L, 2L))
  }

  test("lambda = 1 degenerates to pure relevance order") {
    val out = Mmr.rerank(df(cands), k = 3, lambda = 1.0)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    // and the scores ARE the relevances
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.99995, 0.99994, 0.3))
  }

  test("score ties break on the smaller candidate id") {
    val tied = Seq(
      MmrCand(q, 7L, 0.5, Array(1f, 0f)),
      MmrCand(q, 4L, 0.5, Array(1f, 0f)))
    val out = Mmr.rerank(df(tied), k = 2, lambda = 1.0)
      .orderBy("mmr_rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(4L, 7L))
  }

  test("k beyond the candidate count returns every candidate once") {
    val out = Mmr.rerank(df(cands), k = 20, lambda = 0.7)
    assert(out.count() === 3L)
    assert(out.select("neighbor_id").distinct().count() === 3L)
  }

  test("exhausted candidate lists end the greedy loop early") {
    // 3 candidates, k = 20: rounds 5..20 would each burn a
    // join+window+checkpoint job picking nothing. Count jobs via a job
    // group — k=20 must cost the same jobs as k=4 (both stop at the
    // first empty pick), not 16 rounds more.
    val sc = spark.sparkContext
    def jobsFor(k: Int, group: String): Int = {
      sc.setJobGroup(group, group)
      try Mmr.rerank(df(cands), k = k, lambda = 0.7).collect()
      finally sc.clearJobGroup()
      // the status store is fed by the async listener bus — poll
      // until the count holds still for 3 reads instead of sleeping
      // blind
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val next = sc.statusTracker.getJobIdsForGroup(group).length
        if (next == cur) stable += 1 else { cur = next; stable = 0 }
      }
      cur
    }
    val atK4 = jobsFor(4, "mmr_k4")
    val atK20 = jobsFor(20, "mmr_k20")
    assert(atK20 === atK4,
      s"k=20 over 3 candidates ran $atK20 jobs vs $atK4 at k=4 — " +
        "the loop is not exiting on exhaustion")
  }

  test("uneven queries: exhaustion of one query must not starve the other") {
    // query q has 2 candidates, query r has 4 — the loop may only stop
    // once BOTH are exhausted, so r still gets all 4 picks
    val uneven = Seq(
      MmrCand("q", 1L, 0.9, Array(1f, 0f)),
      MmrCand("q", 2L, 0.5, Array(0f, 1f)),
      MmrCand("r", 1L, 0.9, Array(1f, 0f)),
      MmrCand("r", 2L, 0.8, Array(0.9f, 0.1f)),
      MmrCand("r", 3L, 0.7, Array(0f, 1f)),
      MmrCand("r", 4L, 0.1, Array(0.5f, 0.5f)))
    val out = Mmr.rerank(df(uneven), k = 6, lambda = 0.5).collect()
    val byQ = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byQ === Map("q" -> 2, "r" -> 4))
  }

  test("zero-norm candidate vectors are excluded") {
    val withZero = cands :+ MmrCand(q, 9L, 0.9, Array(0f, 0f))
    val out = Mmr.rerank(df(withZero), k = 4, lambda = 0.7)
    assert(!out.select("neighbor_id").collect().map(_.getLong(0))
      .contains(9L))
  }

  test("queries rerank independently") {
    val two = cands ++ cands.map(c => c.copy(query_id = "r"))
    val out = Mmr.rerank(df(two), k = 3, lambda = 0.5)
    val byQ = out.collect().groupBy(_.getString(0))
      .map { case (k, v) => k -> v.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    assert(byQ("q") === Seq(1L, 3L, 2L))
    assert(byQ("r") === Seq(1L, 3L, 2L))
  }

  test("the greedy agrees with a hand-rolled reference on random data") {
    val r = new scala.util.Random(17)
    val cs = (0 until 12).map(i => MmrCand("q", i.toLong,
      r.nextDouble(), Array.fill(4)(r.nextGaussian().toFloat)))
    val lam = 0.6
    val out = Mmr.rerank(df(cs), k = 5, lambda = lam)
      .orderBy("mmr_rank").collect().map(_.getLong(2)).toSeq
    // driver-side reference greedy (double math mirrors dotHof's
    // in-order fold closely enough for argmax equality on random data)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    var selected = Vector.empty[MmrCand]
    var remaining = cs.toVector
    (1 to 5).foreach { _ =>
      val best = remaining.map { c =>
        val maxsim = if (selected.isEmpty) 0.0
          else selected.map(s => cos(c.embedding, s.embedding)).max
        val score = if (selected.isEmpty) lam * c.rel
          else lam * c.rel - (1 - lam) * maxsim
        (c, score)
      }.minBy { case (c, s) => (-s, c.neighbor_id) }._1
      selected :+= best
      remaining = remaining.filterNot(_.neighbor_id == best.neighbor_id)
    }
    assert(out === selected.map(_.neighbor_id).toSeq)
  }
}
