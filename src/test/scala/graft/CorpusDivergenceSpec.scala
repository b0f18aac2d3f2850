package graft

import org.apache.spark.sql.functions._

import graft.text.CorpusDivergence

case class DivDoc(doc_id: Long, text: String)
case class GDoc(lang: String, text: String)

class CorpusDivergenceSpec extends SparkSpec {

  private def corpus(texts: String*) =
    df(texts.zipWithIndex.map { case (t, i) => DivDoc(i.toLong, t) })

  test("identical corpora diverge by exactly zero on every measure") {
    val p = corpus("a b c a", "d e f")
    val out = CorpusDivergence.divergence(p, p, "text", topK = 10)
      .collect().head
    assert(out.getDouble(3) === 0.0) // tv
    assert(out.getDouble(4) === 0.0) // hellinger
    assert(out.getDouble(5) === 0.0) // chi2
    val kl = CorpusDivergence.klDivergence(p, p, "text", topK = 10)
      .collect().head
    assert(kl.getDouble(3) === 0.0 && kl.getDouble(4) === 0.0)
  }

  test("disjoint corpora score near the measure maxima; totals and vocab are exact") {
    val p = corpus("a a a a a a a a a a")
    val q = corpus("b b b b b b b b b b")
    val out = CorpusDivergence.divergence(p, q, "text", topK = 5)
      .collect().head
    assert(out.getLong(0) === 3L) // vocab a, b + <oov>
    assert(out.getLong(1) === 10L && out.getLong(2) === 10L)
    assert(out.getDouble(3) > 0.6) // tv is high, bounded by smoothing
    assert(out.getDouble(4) > 0.5 && out.getDouble(4) < 1.0)
    assert(out.getDouble(5) > 0.5)
  }

  test("oov pooling: tokens beyond topK land in one bucket; vocab size is topK + 1") {
    val p = corpus("x x x x y y y z w v u t")
    val q = corpus("x x y y q r")
    val out = CorpusDivergence.divergence(p, q, "text", topK = 2)
      .collect().head
    assert(out.getLong(0) === 3L) // x, y + <oov>
    // token totals are preserved through pooling
    assert(out.getLong(1) === 12L && out.getLong(2) === 6L)
  }

  test("vocabOverlap emits every group pair, including disjoint vocabularies at 0.0") {
    val docs = df(Seq(
      GDoc("en", "the cat sat"), GDoc("en", "the dog ran"),
      GDoc("de", "der cat hund"),           // shares "cat" with en
      GDoc("zh", "wo men ta men")))         // disjoint from both
    val out = CorpusDivergence.vocabOverlap(docs, "lang", "text")
      .orderBy("g_a", "g_b").collect()
    // 3 groups -> exactly 3 ordered pairs, disjoint ones included
    assert(out.length === 3)
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    // en vocab: the cat sat dog ran (5); de vocab: der cat hund (3)
    assert(byPair(("de", "en")) === (1L, 1.0 / 7.0))
    // zh shares nothing with either -> present with jaccard 0.0
    assert(byPair(("de", "zh")) === (0L, 0.0))
    assert(byPair(("en", "zh")) === (0L, 0.0))
  }

  test("divergence grows with distributional shift (sanity ordering)") {
    val base = corpus("a b c d e a b c d e")
    val near = corpus("a b c d e a b c d f")
    val far = corpus("f g h i j f g h i j")
    def tv(q: org.apache.spark.sql.DataFrame) =
      CorpusDivergence.divergence(base, q, "text", topK = 20)
        .collect().head.getDouble(3)
    assert(tv(near) < tv(far))
    assert(tv(base) === 0.0)
  }
}
