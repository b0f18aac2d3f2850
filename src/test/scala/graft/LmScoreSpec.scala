package graft

import org.apache.spark.sql.functions._

import graft.text.LmScore

/** Bigram-LM quality scoring: hand-computed tiny-corpus scores, the
  * unseen-token backoff path, NULL for unscorable docs, bigram
  * pruning, and bit-determinism under repartitioning (the fold is
  * position-ordered, so partitioning must not change a single ulp).
  */
class LmScoreSpec extends SparkSpec {

  private lazy val docs =
    df(Seq((1L, "a b a c"), (2L, "a b"), (3L, "x"))).toDF("doc_id", "text")
  private lazy val model = LmScore.fit(docs, "text")

  // corpus: a:3 b:2 c:1 x:1  → N=7, V=4, N+V=11
  // bigrams: (a,b):2 (b,a):1 (a,c):1
  private def p(cBi: Long, cPrev: Long, cCur: Long): Double =
    0.75 * (cBi.toDouble / cPrev.toDouble) + 0.25 * ((cCur + 1).toDouble / 11.0)
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("model counts and normalizers") {
    assert(model.totalTokens === 7L)
    assert(model.vocabSize === 4L)
    val bi = model.bigrams.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi === Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L))
  }

  test("scores match the hand-computed interpolated bigram likelihoods") {
    val got = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .select("doc_id", "lm_score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val d1 = (math.log(p(2, 3, 2)) + math.log(p(1, 2, 3)) + math.log(p(1, 3, 1))) / 3.0
    val d2 = math.log(p(2, 3, 2)) / 1.0
    assert(got(1L) === Some(r6(d1)))
    assert(got(2L) === Some(r6(d2)))
    assert(got(3L) === None) // single token: nothing to score
  }

  test("unseen tokens take the add-one backoff, never -Infinity or null") {
    val out = LmScore.scoreDocs(
        df(Seq((9L, "z z"))).toDF("doc_id", "text"), "doc_id", "text", model)
      .select("lm_score").head()
    // prev z unseen → bigram term 0; cur z unseen → (0+1)/11 backoff
    assert(out.getDouble(0) === r6(math.log(0.25 * (1.0 / 11.0))))
  }

  test("minCount prunes rare bigrams but keeps unigram normalizers whole") {
    val pruned = LmScore.fit(docs, "text", minCount = 2L)
    assert(pruned.bigrams.collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq === Seq(("a", "b")))
    assert(pruned.totalTokens === 7L && pruned.vocabSize === 4L)
  }

  test("write/load round-trips the model; loaded scores match fit scores exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString + "/m"
    LmScore.writeModel(model, dir)
    val loaded = LmScore.loadModel(spark, dir)
    assert(loaded.totalTokens === model.totalTokens)
    assert(loaded.vocabSize === model.vocabSize)
    val a = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .select("doc_id", "lm_score").collect().sortBy(_.getLong(0)).map(_.toString)
    val b = LmScore.scoreDocs(docs, "doc_id", "text", loaded)
      .select("doc_id", "lm_score").collect().sortBy(_.getLong(0)).map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("re-writing a model to the same path replaces it — no unioned counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm2").toString + "/m"
    LmScore.writeModel(model, dir)
    LmScore.writeModel(model, dir) // a re-fit to the same path
    val loaded = LmScore.loadModel(spark, dir)
    // an append-based write would double every unigram/bigram count row
    assert(loaded.unigrams.count() === model.unigrams.count())
    assert(loaded.bigrams.count() === model.bigrams.count())
    val a = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .select("doc_id", "lm_score").collect().sortBy(_.getLong(0)).map(_.toString)
    val b = LmScore.scoreDocs(docs, "doc_id", "text", loaded)
      .select("doc_id", "lm_score").collect().sortBy(_.getLong(0)).map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("repartitioning changes nothing — the fold is position-ordered") {
    val base = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .select("doc_id", "lm_score").collect().sortBy(_.getLong(0))
    val shuffled = LmScore.scoreDocs(docs.repartition(7), "doc_id", "text", model)
      .select("doc_id", "lm_score").collect().sortBy(_.getLong(0))
    assert(base.map(_.toString).toSeq === shuffled.map(_.toString).toSeq)
  }
}
