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

  private def lineSignals(text: String): (Double, Double, Double, Double) = {
    val r = df(Seq(Tuple1(text))).toDF("text").select(
      TextAnalysis.dupLineFraction(col("text")),
      TextAnalysis.dupLineCharFraction(col("text")),
      TextAnalysis.dupParagraphFraction(col("text")),
      TextAnalysis.dupParagraphCharFraction(col("text"))).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  test("line/paragraph duplication: count- and char-weighted fractions") {
    // 3 lines, "aa" twice: 1/3 dup lines; chars 2+2+4=8, dup chars 2
    assert(lineSignals("aa\naa\nbbbb") ==
      ((1.0 - 2.0 / 3.0, 2.0 / 8.0, 0.0, 0.0)))
    // the char-weighted rule catches the giant paragraph pasted twice:
    // 3 paragraphs (long, long, x) — count says 1/3, chars say 8/17
    assert(lineSignals("longpara\n\nlongpara\n\nx") ==
      ((1.0 - 2.0 / 3.0, 8.0 / 17.0, 1.0 - 2.0 / 3.0, 8.0 / 17.0)))
    // single-newline breaks are LINES but one paragraph
    val (dl, _, dp, _) = {
      val t4 = lineSignals("p q\np q")
      (t4._1, t4._2, t4._3, t4._4)
    }
    assert(dl == 0.5 && dp == 0.0)
  }

  test("line rules: empty docs and whitespace-only lines hit the 0.0 guards") {
    assert(lineSignals("") == ((0.0, 0.0, 0.0, 0.0)))
    assert(lineSignals("\n\n  \n") == ((0.0, 0.0, 0.0, 0.0)))
    // blank-ish lines are dropped before counting: "a", "a" remain
    assert(lineSignals("a\n   \na")._1 == 0.5)
  }
}
