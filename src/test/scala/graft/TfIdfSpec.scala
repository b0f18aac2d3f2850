package graft

import graft.text.TfIdf

/** TF-IDF keyword extraction: hand-computed scores on a tiny corpus,
  * rank determinism, and the smooth-idf floor for corpus-wide terms.
  */
class TfIdfSpec extends SparkSpec {

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date"))

  private def ranked(k: Int) =
    TfIdf.keywords(df(corpus).toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(3)))

  test("scores match the hand-computed smooth-idf formula") {
    // N=3. df: apple 1, banana 2, cherry 2, date 1.
    def idf(dfq: Int) = math.log(4.0 / (dfq + 1.0)) + 1.0
    def s(tf: Int, len: Int, dfq: Int) =
      BigDecimal(tf.toDouble / len * idf(dfq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = ranked(k = 10).toSet
    assert(rows.contains((1L, 1, "apple", s(2, 3, 1))))
    assert(rows.contains((1L, 2, "banana", s(1, 3, 2))))
    assert(rows.contains((3L, 1, "cherry", s(3, 4, 2))))
    assert(rows.contains((3L, 2, "date", s(1, 4, 1))))
  }

  test("k bounds each document's rows and ranks are dense from 1") {
    val rows = ranked(k = 1)
    assert(rows.length == 3)
    assert(rows.forall(_._2 == 1))
  }

  test("ties rank deterministically by token") {
    // doc 2: banana and cherry both tf=1/2, df=2 → identical score;
    // banana must outrank cherry alphabetically
    val doc2 = ranked(k = 2).filter(_._1 == 2L).sortBy(_._2)
    assert(doc2.map(_._3).toSeq == Seq("banana", "cherry"))
    assert(doc2(0)._4 == doc2(1)._4)
  }

  test("smooth idf keeps corpus-wide terms strictly positive") {
    val all = Seq((1L, "common"), (2L, "common"), (3L, "common"))
    val rows = TfIdf.keywords(df(all).toDF("doc_id", "text"),
      "doc_id", "text", 1).collect()
    assert(rows.length == 3 && rows.forall(_.getDouble(3) > 0.0))
  }
}
