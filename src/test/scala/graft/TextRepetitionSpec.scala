package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Gopher-style repetition signals: known-value semantics, the empty /
  * short-document guards, and the one-tokenization scale form.
  */
class TextRepetitionSpec extends SparkSpec {

  private def signals(text: String): (Double, Double, Double) = {
    val r = TextAnalysis.withRepetitionSignals(
      df(Seq(Tuple1(text))).toDF("text"), "text").head()
    (r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("duplicate-token, top-token, and duplicate-3-gram fractions on known docs") {
    // "x y x y x y": 6 tokens, 2 distinct; 4 3-grams, 2 distinct
    assert(signals("x y x y x y") == (1.0 - 2.0 / 6.0, 3.0 / 6.0, 1.0 - 2.0 / 4.0))
    // all-distinct prose repeats nothing
    assert(signals("the quick brown fox") == (0.0, 1.0 / 4.0, 0.0))
    // one token dominating: 3 of 4
    assert(signals("spam spam spam eggs") == (1.0 - 2.0 / 4.0, 3.0 / 4.0, 0.0))
  }

  test("empty and sub-n documents hit the 0.0 guards, not a divide-by-zero") {
    assert(signals("") == (0.0, 0.0, 0.0))
    assert(signals("   ") == (0.0, 0.0, 0.0))
    assert(signals("q w") == (1.0 - 2.0 / 2.0, 1.0 / 2.0, 0.0))
  }

  test("whitespace runs tokenize like single spaces (multi-line parity)") {
    assert(signals("a\n\na\tb") == signals("a a b"))
  }

  test("rawNgramsFromTokens keeps duplicates that shinglesFromTokens drops") {
    val toks = TextAnalysis.tokens(lit("x y x y"))
    val row = spark.range(1)
      .select(size(TextAnalysis.rawNgramsFromTokens(toks, 2)).as("raw"),
        size(TextAnalysis.shinglesFromTokens(toks, 2)).as("distinct"))
      .head()
    assert(row.getInt(0) == 3 && row.getInt(1) == 2) // "x y","y x","x y"
  }
}
